"""Device-mesh parallelism.

The reference's only parallelism is single-node DDP over NCCL
(``mp.spawn`` + ``DistributedDataParallel``, ``train_depth.py:64-73,
619-622`` — SURVEY §2.6). The TPU-native equivalent is single-controller
JAX: one process, a ``jax.sharding.Mesh``, batch sharded over the ``data``
axis, params replicated (or sharded over ``model`` for the big backbones) —
XLA inserts the gradient all-reduce over ICI automatically.
"""

from midvision_probe_tpu.parallel.mesh import (  # noqa: F401
    data_sharding,
    make_mesh,
    replicate,
    shard_batch,
)

"""Multi-host scaffolding smoke tests (process_count == 1 path).

SURVEY §2.6 TPU-native mapping: ``jax.distributed.initialize`` entry +
per-host Loader shard + ``make_array_from_process_local_data`` assembly.
Real multi-process runs need a pod; these verify the single-process
degenerate case is exact and the shard arithmetic is DistributedSampler-
equivalent (``builder.py:50-52``)."""

import jax
import numpy as np

from midvision_probe_tpu.datasets.builder import Loader
from midvision_probe_tpu.parallel import multihost
from midvision_probe_tpu.parallel.mesh import make_mesh


def test_initialize_single_process_noop():
    multihost.initialize()  # must not raise or spawn anything
    assert jax.process_count() == 1
    shard = multihost.process_shard_args()
    assert shard == {"num_shards": 1, "shard_index": 0}


def test_make_global_batch_shards_over_mesh(rng):
    mesh = make_mesh()  # 8 virtual CPU devices from conftest
    batch = {
        "image": rng.rand(16, 8, 8, 3).astype(np.float32),
        "depth": rng.rand(16, 8, 8, 1).astype(np.float32),
    }
    out = multihost.make_global_batch(batch, mesh)
    assert out["image"].shape == (16, 8, 8, 3)
    # sharded over 'data': per-device shard is 16/len(data axis)
    n_data = mesh.shape["data"]
    shard_shapes = {s.data.shape for s in out["image"].addressable_shards}
    assert shard_shapes == {(16 // n_data, 8, 8, 3)}
    np.testing.assert_allclose(np.asarray(out["depth"]), batch["depth"])


def test_loader_shards_partition_dataset():
    """Union of per-host shards == dataset; shards pad to EQUAL length by
    wrapped repeats (DistributedSampler semantics: 23 -> 24 slots), so all
    hosts agree on batches-per-epoch and collectives stay in lockstep."""

    class DS:
        def __len__(self):
            return 23

        def __getitem__(self, i):
            return {"x": np.asarray([i])}

    world = 4
    seen = []
    lens = set()
    for rank in range(world):
        loader = Loader(DS(), batch_size=3, shuffle=False,
                        num_shards=world, shard_index=rank)
        lens.add(len(loader))
        for b in loader:
            seen.extend(b["x"].reshape(-1).tolist())
    assert set(seen) == set(range(23))
    assert len(seen) == 24 and lens == {2}

"""Multi-host (multi-process) scaffolding — SURVEY §2.6 TPU-native mapping.

The reference's only distribution is single-node DDP (``mp.spawn`` +
``DistributedSampler``, ``train_depth.py:64-73``). The TPU-native analog:

* ``initialize()`` — ``jax.distributed.initialize`` when launched as a
  multi-process job (TPU pod slice / coordinator env), a no-op for the
  single-process case every test and single-chip run uses.
* ``process_shard_args()`` — per-host (num_shards, shard_index) for
  ``datasets.builder.Loader``, the DistributedSampler equivalent.
* ``make_global_batch()`` — assemble each host's local batch slice into one
  globally-sharded ``jax.Array`` via ``jax.make_array_from_process_local_data``
  (single-process: a plain ``device_put`` with batch sharding).
"""

from __future__ import annotations

import logging
import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

log = logging.getLogger(__name__)

_initialized = False


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Bring up the JAX distributed runtime exactly once.

    Resolution order: explicit args > the standard env vars
    (``JAX_COORDINATOR_ADDRESS``/``JAX_NUM_PROCESSES``/``JAX_PROCESS_ID``,
    or TPU-pod auto-detection inside ``jax.distributed.initialize``) >
    single-process no-op."""
    global _initialized
    if _initialized:
        return
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is None and num_processes in (None, 1):
        # single-process run: nothing to initialize. IMPORTANT: decide this
        # WITHOUT touching the backend — even jax.process_count() initializes
        # XLA, after which jax.distributed.initialize() hard-errors (found by
        # the real 2-process test, tests/test_multihost_2proc.py; invisible
        # to any single-process test).
        _initialized = True
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:
        # auto-initialized runtimes (TPU pod) raise 'already initialized'
        if "already initialized" not in str(e).lower():
            raise
    _initialized = True
    log.info("jax.distributed initialized: process %d/%d, %d local / %d "
             "global devices", jax.process_index(), jax.process_count(),
             jax.local_device_count(), jax.device_count())


def process_shard_args() -> dict:
    """Loader kwargs for this host's data shard
    (``DistributedSampler(rank, world)`` equivalent, ``builder.py:50-52``)."""
    return {
        "num_shards": jax.process_count(),
        "shard_index": jax.process_index(),
    }


def make_global_batch(batch, mesh: Mesh):
    """Per-host local batch pytree → globally batch-sharded jax.Arrays.

    Each host feeds only its shard (``process_shard_args``); the returned
    arrays have global shape ``local_batch * process_count`` along axis 0,
    sharded over the mesh's 'data' axis."""

    def put(x):
        sharding = NamedSharding(mesh, P("data", *([None] * (x.ndim - 1))))
        if jax.process_count() == 1:
            return jax.device_put(x, sharding)
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))

    return jax.tree_util.tree_map(put, batch)


def gather_metrics(metrics: dict) -> dict:
    """Concatenate per-sample metric arrays across processes.

    Each host's ``ProbeTrainer.validate`` covers only its loader shard;
    this assembles the full-dataset arrays on EVERY host (the reference
    aggregates rank-0-only, ``train_depth.py:664-692`` — here rank gating
    applies only to the CSV write). Hosts may hold different row counts
    (``_valid`` drops a shard's wrapped repeats), so arrays are padded to
    the max length for the allgather and trimmed per process after."""
    if jax.process_count() == 1:
        return {k: np.asarray(v) for k, v in metrics.items()}
    from jax.experimental import multihost_utils

    # every key of one validate call has the same per-host row count, so
    # ONE length gather serves the whole dict (collectives are host-level
    # round-trips; ~30 keys x 2 validates would otherwise pay 4x)
    lens = {np.asarray(v).shape[0] for v in metrics.values()}
    assert len(lens) <= 1, f"per-key row counts differ: {lens}"
    n_local = lens.pop() if lens else 0
    ns = multihost_utils.process_allgather(np.asarray([n_local])).reshape(-1)
    m = int(ns.max())

    out = {}
    for k, v in metrics.items():
        v = np.asarray(v)
        padded = np.zeros((m,) + v.shape[1:], v.dtype)
        padded[: v.shape[0]] = v
        g = multihost_utils.process_allgather(padded)  # (P, m, ...)
        out[k] = np.concatenate([g[p, : ns[p]] for p in range(g.shape[0])])
    return out


def gather_rows(rows: list, keys: tuple) -> list:
    """Allgather lists of flat numeric dicts (per-segment metric rows)
    across processes. ``keys`` fixes the schema so hosts with EMPTY row
    lists still participate with a (0, len(keys)) array. Single-process:
    identity."""
    if jax.process_count() == 1:
        return rows
    from jax.experimental import multihost_utils

    arr = np.asarray([[float(r[k]) for k in keys] for r in rows],
                     np.float64).reshape(len(rows), len(keys))
    ns = multihost_utils.process_allgather(
        np.asarray([arr.shape[0]])).reshape(-1)
    m = int(ns.max())
    padded = np.zeros((m, len(keys)), np.float64)
    padded[: arr.shape[0]] = arr
    g = multihost_utils.process_allgather(padded)  # (P, m, K)
    out = []
    for p in range(g.shape[0]):
        for row in g[p, : ns[p]]:
            out.append(dict(zip(keys, row.tolist())))
    return out

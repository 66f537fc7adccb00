"""Mesh construction and sharding helpers."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: int = -1, model_axis: int = 1) -> Mesh:
    """1-D data mesh (default) or 2-D (data, model) mesh.

    ``num_devices=-1`` uses all visible devices (the reference's
    ``system.num_gpus`` counted GPUs; here devices come from the runtime).
    """
    devices = jax.devices()
    if num_devices and num_devices > 0:
        if jax.process_count() > 1 and num_devices != len(devices):
            # jax.devices() is GLOBAL and process-0-first: a prefix slice
            # here would build a mesh containing only the first hosts'
            # devices while every host still runs the trainer against it
            # (make_array_from_process_local_data then fails on hosts with
            # zero addressable mesh devices, or worse, the per-host shard
            # math silently miscounts)
            raise ValueError(
                f"num_devices={num_devices} with jax.process_count()="
                f"{jax.process_count()}: per-count device selection is "
                "single-process only; use num_devices=-1 (all devices) in "
                "multi-process runs")
        devices = devices[:num_devices]
    n = len(devices)
    assert model_axis >= 1 and n % model_axis == 0, (n, model_axis)
    arr = np.asarray(devices).reshape(n // model_axis, model_axis)
    return Mesh(arr, ("data", "model"))


def data_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Batch-dim sharding over the data axis (rest replicated)."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def shard_batch(batch, mesh: Mesh):
    """Place a pytree of host arrays batch-sharded on the mesh.

    Multi-process (pod) runs: each host holds only ITS loader shard
    (``multihost.process_shard_args``), so the local arrays are assembled
    into one global jax.Array via ``make_array_from_process_local_data`` —
    ``device_put`` would require the same full batch on every host. One
    implementation lives in ``multihost.make_global_batch``."""
    from midvision_probe_tpu.parallel import multihost

    return multihost.make_global_batch(batch, mesh)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (params/opt state) across the mesh."""
    s = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)

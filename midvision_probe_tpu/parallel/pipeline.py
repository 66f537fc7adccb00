"""GPipe-style pipeline parallelism over a mesh axis (shard_map + ppermute).

The reference has no pipeline parallelism (SURVEY §2.6 — DP only), and the
probing workload doesn't need it (frozen backbones, tiny probes). This
module exists as the framework's generic pipeline runner for models that
outgrow one chip: stages are laid out along a mesh axis, activations move
stage-to-stage over ICI with ``lax.ppermute``, and microbatches fill the
pipeline GPipe-style (no interleaving).

Design notes (TPU-first):
* single jitted program — the schedule is a ``lax.scan`` over
  ``n_micro + n_stages - 1`` ticks, not host-side orchestration;
* each device holds ONE stage's params (sharded along the pipeline axis by
  the caller via ``stage_params_sharding``); at every tick a device runs
  its stage on whatever microbatch it holds, then shifts the result one
  step down the ring;
* bubbles are the usual (S-1)/(M+S-1) GPipe overhead — callers pick
  ``n_micro >> n_stages``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def stage_params_sharding(mesh: Mesh, axis: str = "model") -> NamedSharding:
    """Sharding for a params pytree whose leaves are stacked along a leading
    stage dimension (leaf shape (n_stages, ...))."""
    return NamedSharding(mesh, P(axis))


def pipeline_apply(stage_fn, stacked_params, x, mesh: Mesh,
                   axis: str = "model", n_micro: int | None = None):
    """Run ``x`` through ``n_stages`` sequential stages laid out on ``axis``.

    Args:
        stage_fn: ``(params_slice, activations) -> activations`` — one
            pipeline stage; must preserve the activation shape (pad/project
            outside if stages change width).
        stacked_params: pytree with leading stage dim on every leaf,
            sharded with ``stage_params_sharding`` (or replicated — it is
            resharded here).
        x: (B, ...) global batch (replicated or data-sharded on other axes).
        n_micro: microbatch count; defaults to ``n_stages``.

    Returns the final stage's output for the whole batch, (B, ...).
    """
    n_stages = mesh.shape[axis]
    n_micro = n_micro or n_stages
    B = x.shape[0]
    assert B % n_micro == 0, (B, n_micro)
    micro = B // n_micro
    # (n_micro, micro, ...) microbatch queue
    xs = x.reshape(n_micro, micro, *x.shape[1:])

    fwd_perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=P(),
        check_vma=False,
    )
    def run(params_local, xs_local):
        # params_local: this device's stage slice, leading dim 1
        params_local = jax.tree_util.tree_map(lambda p: p[0], params_local)
        sid = jax.lax.axis_index(axis)
        T = n_micro + n_stages - 1
        hold = jnp.zeros_like(xs_local[0])
        outs = jnp.zeros_like(xs_local)

        def tick(carry, t):
            hold, outs = carry
            # stage 0 ingests microbatch t (garbage past the last one)
            inject = xs_local[jnp.minimum(t, n_micro - 1)]
            cur = jnp.where(sid == 0, inject, hold)
            y = stage_fn(params_local, cur)
            # last stage writes its finished microbatch t - (S-1)
            out_idx = t - (n_stages - 1)
            write = (sid == n_stages - 1) & (out_idx >= 0)
            outs = jax.lax.cond(
                write,
                lambda o: jax.lax.dynamic_update_index_in_dim(
                    o, y, jnp.maximum(out_idx, 0), 0),
                lambda o: o,
                outs,
            )
            hold = jax.lax.ppermute(y, axis, fwd_perm)
            return (hold, outs), None

        (hold, outs), _ = jax.lax.scan(
            tick, (hold, outs), jnp.arange(T))
        # only the last stage holds real outputs; share them with everyone
        outs = jax.lax.psum(
            jnp.where(sid == n_stages - 1, outs, jnp.zeros_like(outs)),
            axis,
        )
        return outs

    out = run(stacked_params, xs)
    return out.reshape(B, *x.shape[1:])

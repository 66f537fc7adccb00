"""Fused 2D rotary position embedding — the cuRoPE2D replacement.

The reference ships a CUDA extension (``evals/models/croco_models/curope/``:
``kernels.cu`` rotates (u, v) pairs in-place, one block per token) used by
CroCo-v2 attention, with a pure-torch fallback at
``croco_models/pos_embed.py:110-157`` that defines the semantics replicated
here:

* tokens ``(B, nheads, N, dim)`` are split into a *y* half ``[..., :dim/2]``
  and an *x* half ``[..., dim/2:]``;
* each half gets 1-D RoPE with angle ``pos / base**(2i/D)`` where
  ``D = dim/2`` and ``pos`` is the token's y (resp. x) grid coordinate;
* rotation uses the rotate-half convention
  ``t * cos + rotate_half(t) * sin`` with ``rotate_half(u, v) = (-v, u)``.

On TPU this is a single Pallas VPU kernel (angles computed in-register from
the integer positions — no host-side cos/sin table, matching the CUDA
kernel's shared-memory inv-freq design); elsewhere a jnp composition with
identical math.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _rope_half(t: jnp.ndarray, pos: jnp.ndarray, base: float) -> jnp.ndarray:
    """1-D RoPE on the last dim of ``t`` (..., N, D) with positions (..., N)."""
    D = t.shape[-1]
    half = D // 2
    i = jnp.arange(half, dtype=jnp.float32)
    inv_freq = jnp.exp(-math.log(base) * (2.0 * i / D))
    angle = pos[..., None].astype(jnp.float32) * inv_freq  # (..., N, D/2)
    cos = jnp.cos(angle)
    sin = jnp.sin(angle)
    u, v = t[..., :half], t[..., half:]
    out_u = u * cos - v * sin
    out_v = v * cos + u * sin
    return jnp.concatenate([out_u, out_v], axis=-1)


def _rope_2d_jnp(tokens: jnp.ndarray, positions: jnp.ndarray, base: float):
    D = tokens.shape[-1] // 2
    y, x = tokens[..., :D], tokens[..., D:]
    pos_y = positions[:, None, :, 0]  # (B, 1, N) broadcast over heads
    pos_x = positions[:, None, :, 1]
    dtype = tokens.dtype
    y = _rope_half(y.astype(jnp.float32), pos_y, base)
    x = _rope_half(x.astype(jnp.float32), pos_x, base)
    return jnp.concatenate([y, x], axis=-1).astype(dtype)


def _rope2d_kernel(py_ref, px_ref, t_ref, o_ref, *, base: float, dim: int):
    D = dim // 2  # per-axis rotary dim
    half = D // 2
    t = t_ref[0, 0].astype(jnp.float32)  # (TN, dim)
    tn = t.shape[0]

    i = jax.lax.broadcasted_iota(jnp.float32, (tn, half), 1)
    inv_freq = jnp.exp(-math.log(base) * (2.0 * i / D))

    def rot(block, pos):
        angle = pos.reshape(tn, 1) * inv_freq
        cos, sin = jnp.cos(angle), jnp.sin(angle)
        u, v = block[:, :half], block[:, half:]
        return jnp.concatenate([u * cos - v * sin, v * cos + u * sin], axis=1)

    y = rot(t[:, :D], py_ref[0])
    x = rot(t[:, D:], px_ref[0])
    o_ref[0, 0] = jnp.concatenate([y, x], axis=1).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("base", "tile_n", "interpret"))
def _rope_2d_pallas(
    tokens, positions, base: float, tile_n: int = 512, interpret: bool = False
):
    B, H, N, dim = tokens.shape
    n_pad = (-N) % tile_n
    t = jnp.pad(tokens, ((0, 0), (0, 0), (0, n_pad), (0, 0)))
    pos = jnp.pad(positions, ((0, 0), (0, n_pad), (0, 0)))
    pos_y = pos[..., 0].astype(jnp.float32)
    pos_x = pos[..., 1].astype(jnp.float32)
    np_ = N + n_pad

    out = pl.pallas_call(
        functools.partial(_rope2d_kernel, base=base, dim=dim),
        grid=(B, H, np_ // tile_n),
        in_specs=[
            pl.BlockSpec((1, tile_n), lambda b, h, n: (b, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda b, h, n: (b, n), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 1, tile_n, dim),
                lambda b, h, n: (b, h, n, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, tile_n, dim), lambda b, h, n: (b, h, n, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, np_, dim), tokens.dtype),
        interpret=interpret,
    )(pos_y, pos_x, t)
    return out[:, :, :N]


def rope_2d(
    tokens: jnp.ndarray,
    positions: jnp.ndarray,
    base: float = 100.0,
    use_pallas: bool | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Apply 2D RoPE.

    Args:
        tokens: ``(B, nheads, N, dim)`` attention q or k.
        positions: ``(B, N, 2)`` integer (y, x) grid positions per token.
        base: frequency base (CroCo-v2 uses 100.0).
    """
    assert tokens.shape[-1] % 4 == 0, "dim must be divisible by 4 for 2D RoPE"
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        return _rope_2d_pallas(tokens, positions, base, interpret=interpret)
    return _rope_2d_jnp(tokens, positions, base)

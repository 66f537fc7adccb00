"""Fused transformer MLP (fc1 → GELU → fc2) as one Pallas kernel.

XLA runs the ViT MLP as two matmuls with the (M, 4C) hidden state written
to and re-read from HBM around the GELU pass — ~472 MB of traffic per
ViT-B layer at the probing batch. Here the hidden tile never leaves VMEM:
each grid step loads an (bm, C) row block, computes h = gelu(x@W1 + b1) in
registers/VMEM and immediately contracts with W2. W1/W2 stay resident
across row blocks (index maps constant in the grid).

Forward-only; backward falls back to the plain formulation via custom_vjp
(frozen backbones — the backward path is cold).

Measurement note (v5e, ViT-B/16 @ 480x640 bf16 batch 64): end-to-end this
kernel is SLOWER than XLA's native two-matmul pipeline — measured twice:
384 plain vs 358-370 fused with the rational-erf activation (r2), and
514.6 plain vs 468.0 fused with the cheap tanh activation (late r2, after
the ViT switched to tanh GELU under bf16). The erf cost was NOT the
reason: XLA genuinely hides the hidden-state HBM round trip behind the
matmul pipeline, and a monolithic kernel forfeits that overlap. Kept as a
library kernel (it wins when the MLP is truly bandwidth-bound, e.g. tiny
batches); the ViT does not dispatch to it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_LIMIT = 100 * 1024 * 1024


def _erf(x):
    """Abramowitz-Stegun 7.1.26 rational erf (max abs err 1.5e-7 — below
    bf16 resolution); Mosaic implements exp but not erf/erfc."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _act(h, act: str, exact: bool = True):
    if act == "quickgelu":  # openai CLIP
        return h * jax.nn.sigmoid(1.702 * h)
    if act == "gelu_tanh":
        # tanh GELU — the bf16 compute path's activation
        # (ops/activations.py: error below bf16 rounding); much cheaper on
        # the VPU than the erf chain that made the r2 fused kernel lose
        c = np.float32(np.sqrt(2.0 / np.pi))
        return 0.5 * h * (1.0 + jnp.tanh(c * (h + 0.044715 * h * h * h)))
    erf = jax.lax.erf if exact else _erf
    return 0.5 * h * (1.0 + erf(h * np.float32(np.sqrt(0.5))))


def _mlp_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *, act: str):
    x = x_ref[...]
    h = jax.lax.dot(x, w1_ref[...], preferred_element_type=jnp.float32)
    h = _act(h + b1_ref[...].astype(jnp.float32), act,
             exact=False)
    o = jax.lax.dot(h.astype(x.dtype), w2_ref[...],
                    preferred_element_type=jnp.float32)
    o_ref[...] = (o + b2_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def _pick_bm(m: int, hidden: int) -> int:
    # h tile (bm, hidden) f32 + x/o tiles; keep well under the VMEM limit.
    # rows are padded up to bm, so divisibility is not required.
    budget = 24 * 1024 * 1024
    for cand in (2048, 1024, 512, 256):
        if cand * hidden * 4 <= budget:
            return cand
    return 256


@functools.partial(jax.jit, static_argnames=("act", "interpret"))
def _forward(x, w1, b1, w2, b2, act: str = "gelu", interpret: bool = False):
    orig_shape = x.shape
    C = orig_shape[-1]
    hidden = w1.shape[-1]
    x2 = x.reshape(-1, C)
    M = x2.shape[0]
    bm = _pick_bm(M, hidden)
    pad = (-M) % bm
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_mlp_kernel, act=act),
        grid=((M + pad) // bm,),
        in_specs=[
            pl.BlockSpec((bm, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, hidden), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hidden), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M + pad, C), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(x2, w1, b1.reshape(1, -1), w2, b2.reshape(1, -1))
    return out[:M].reshape(orig_shape)


def _plain(x, w1, b1, w2, b2, act):
    h = _act((x @ w1 + b1).astype(jnp.float32), act).astype(x.dtype)
    return (h @ w2 + b2).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_mlp(x, w1, b1, w2, b2, act: str = "gelu",
              interpret: bool = False):
    """x (..., C) @ w1 (C, H) + b1 → act → @ w2 (H, C) + b2, hidden in VMEM.

    Requires C and H to be 128-multiples (every zoo ViT qualifies)."""
    return _forward(x, w1, b1, w2, b2, act=act, interpret=interpret)


def _fwd(x, w1, b1, w2, b2, act, interpret):
    return _forward(x, w1, b1, w2, b2, act=act,
                    interpret=interpret), (x, w1, b1, w2, b2)


def _bwd(act, interpret, res, g):
    x, w1, b1, w2, b2 = res
    _, vjp = jax.vjp(lambda *a: _plain(*a, act), x, w1, b1, w2, b2)
    return vjp(g)


fused_mlp.defvjp(_fwd, _bwd)

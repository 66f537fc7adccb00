"""Single-pass Pallas attention for ViT-scale sequences.

At probing resolutions the whole K/V of one (batch, head) fits in VMEM
(N <= ~3k, head_dim 64 → K+V < 1 MB bf16), so the online-softmax machinery
of generic flash attention is unnecessary: one q-tile kernel computes the
full row softmax in a single pass — no running-max corrections, no inner KV
loop. head_dim stays unpadded (Mosaic handles lane=64; padding to 128 was
measured to double the matmul cost).

Two entry points:

* ``fused_qkv_attention`` — the hot path. Takes the qkv projection output
  in its natural ``(B, N, 3, H, d)`` layout and returns ``(B, N, H*d)``;
  the kernel's BlockSpec index maps read q/k/v straight out of that tensor
  and write the output in token-major order, so the (B,H,N,d) transposes
  the einsum formulation needs never materialize in HBM (measured ~13% of
  the ViT-B/16 step before this change).
* ``vit_attention`` — (B, H, N, d) API for callers that already hold
  transposed tensors.

Softmax economics (v5e VPU-bound at head_dim 64): scores are scaled by
``scale * log2(e)`` inside the MXU epilogue so the exponential is a raw
``exp2``. The fused kernel drops the per-row max subtraction entirely
(measured 57.2 vs 53.3 TF/s — the max-reduce plus broadcast-subtract are
two full VPU passes over the N² score matrix). Safety: scores are clamped
at +110 before exp2 (f32 exp2 overflows at 128), which only alters
results when a raw attention logit exceeds 110/log2(e) ≈ 76 — far outside
the range LayerNorm'd frozen backbones produce. Underflow (a whole row of
scores below ≈ -126, i.e. logits < -87 uniformly) is guarded by clamping
the normalizer at 1e-30: the pathological row degrades to zeros instead
of 0/0 → NaN. The generic ``vit_attention`` path keeps the max-subtracted
form, so it is exact for arbitrary inputs.

In BOTH kernels, padded key columns are masked to -inf with a single
broadcast select over the score tile before exp2, so they contribute
exactly zero to the row sum. (An earlier revision instead let zero-padded
columns contribute ``exp2(0) = 1`` each and subtracted the count from the
normalizer — that correction catastrophically cancels when every valid
score in a row is small: at npad = 79 the f32 ulp of the normalizer is
~5e-6, so rows whose valid mass sums below that went to Inf. Round 2
fixed this in the fused kernel only; the generic path's ``_softmax_rows``
kept the subtraction until round 3. The select costs one VPU pass but is
exact for any input, including NaN/garbage in padded K rows.)

Forward-only Pallas; gradients fall back to the einsum formulation via
custom_vjp (backbones are frozen in every reference pipeline —
``train_depth.py:104-110`` — so the backward path is cold and its O(N²)
memory is acceptable when it does run).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# keep the q-tile's f32 scores + bf16 probs within a VMEM budget (v5e has
# 128 MB VMEM; whole-row q tiles measured fastest — 39.1 vs 36.8 TF/s at
# bq 1280 vs 256 for the ViT-B/16@480x640 shape)
_VMEM_BYTES = 48 * 1024 * 1024
_VMEM_LIMIT = 100 * 1024 * 1024
_LOG2E = math.log2(math.e)


def _softmax_rows(s2, n_valid: int):
    """Row softmax of base-2 scores ``s2`` (bq, n_total) f32, already scaled
    by log2(e). Columns >= ``n_valid`` are structural padding and are masked
    to -inf BEFORE the max/exp2 so they contribute exactly zero to the row
    sum — never via a normalizer-count correction, which catastrophically
    cancels when every valid score in a row is small (see module docstring;
    the fused kernel had exactly that bug in round 2)."""
    if n_valid != s2.shape[1]:
        cols = jax.lax.broadcasted_iota(jnp.int32, s2.shape, 1)
        s2 = jnp.where(cols < n_valid, s2, -jnp.inf)
    m = jnp.max(s2, axis=1, keepdims=True)
    p = jnp.exp2(s2 - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    return p, l


def _fused_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, n_valid: int,
                  head_dim: int, mask_kv: bool = False):
    """One instance handles a 128-lane column block = ``128 // head_dim``
    heads (Mosaic's minimum lane granularity; head_dim 64 → head pairs).
    Refs are (1, bq|Nk, 128) blocks of the (B, Npad, 3*H*d) qkv tensor.

    ``mask_kv`` marks caller-level padding whose rows hold garbage (they
    flowed through LN/matmuls, possibly NaN): padded V rows are zeroed so
    ``0 * NaN`` never reaches the PV dot; padded score COLUMNS are always
    masked to -inf before exp2 (exact, also discards garbage/NaN K scores)."""
    # scale*log2(e) is folded into the q tile — (bq, 128) elements instead
    # of a post-multiply over the (bq, Nk) score matrix
    q = q_ref[0].astype(jnp.float32) * (scale * _LOG2E)  # (bq, 128)
    q = q.astype(q_ref.dtype)
    k = k_ref[0]  # (Nk, 128) — rows beyond n_valid are padding
    v = v_ref[0]
    npad = k.shape[0] - n_valid
    if mask_kv and npad:
        rows = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
        v = jnp.where(rows < n_valid, v, jnp.zeros_like(v))
    outs = []
    for j in range(q.shape[-1] // head_dim):
        sl = slice(j * head_dim, (j + 1) * head_dim)
        s2 = jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # max-free softmax (see module docstring): clamp guards f32 exp2
        # overflow; padded columns are excluded exactly via -inf
        s2 = jnp.minimum(s2, 110.0)
        if npad:
            cols = jax.lax.broadcasted_iota(jnp.int32, s2.shape, 1)
            s2 = jnp.where(cols < n_valid, s2, -jnp.inf)
        p = jnp.exp2(s2)
        # guard the max-free form's 0/0 window (every valid score below f32
        # exp2 underflow, i.e. logits < ~-87 uniformly): the pathological row
        # degrades to zeros instead of NaN, at one VPU op
        l = jnp.maximum(jnp.sum(p, axis=1, keepdims=True), 1e-30)
        o = jax.lax.dot(p.astype(v.dtype), v[:, sl],
                        preferred_element_type=jnp.float32)
        outs.append(o / l)
    o_ref[0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, n_valid: int):
    q = q_ref[0, 0]  # (bq, d)
    k = k_ref[0, 0]  # (Nk, d) — 128-aligned, zero-padded beyond n_valid
    v = v_ref[0, 0]
    s2 = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * (scale * _LOG2E)
    p, l = _softmax_rows(s2, n_valid)
    o = jax.lax.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0, 0] = (o / l).astype(o_ref.dtype)


def _pick_block_q(nq: int, n: int) -> int:
    limit = max(_VMEM_BYTES // (6 * n), 128)  # 4B scores + 2B probs per elt
    best = 128
    for cand in range(128, min(nq, 1280) + 1, 128):
        if nq % cand == 0 and cand <= limit:
            best = cand
    return best


@functools.partial(jax.jit, static_argnames=("scale", "interpret", "n_valid"))
def _fused_forward(qkv, scale: float, interpret: bool = False,
                   n_valid: int | None = None):
    """qkv (B, N, 3, H, d) → (B, N, H*d), no HBM transposes.

    The qkv tensor is viewed flat as (B, N, 3*H*d) — the Dense projection's
    natural output, column order (role, head, j) — so a 128-wide column
    block at block-index ``role*(H*d//128) + h2`` holds heads
    [h2*g, (h2+1)*g) of that role, g = 128//d. Requires d | 128 and
    128 | H*d (every ViT in the zoo satisfies both).

    ``n_valid``: if the caller runs the whole network at a 128-padded token
    count (see ``models/vit.py`` — kills the per-layer pad/slice HBM round
    trips), rows ≥ n_valid are garbage that flowed through LN/matmuls; the
    kernel masks them out of K/V and the output keeps the padded length
    (padded output rows are garbage, sliced off at tap capture). With
    ``n_valid=None`` the input is padded internally with zeros and the
    output is sliced back to N."""
    B, N, _, H, d = qkv.shape
    assert 128 % d == 0 and (H * d) % 128 == 0, (H, d)
    nblk = H * d // 128  # column blocks per role
    flat = qkv.reshape(B, N, 3 * H * d)
    if n_valid is None:
        pad = (-N) % 128
        flat = jnp.pad(flat, ((0, 0), (0, pad), (0, 0)))
        Nq = N + pad
        nv, mask_kv = N, False
    else:
        assert N % 128 == 0 and 0 < n_valid <= N, (N, n_valid)
        Nq, nv, mask_kv = N, n_valid, n_valid < N
    bq = _pick_block_q(Nq, Nq)

    def spec(role, bn):
        return pl.BlockSpec(
            (1, bn, 128),
            lambda b, h2, i, r=role, full=(bn == Nq): (
                b, 0 if full else i, r * nblk + h2
            ),
            memory_space=pltpu.VMEM,
        )

    out = pl.pallas_call(
        functools.partial(_fused_kernel, scale=scale, n_valid=nv,
                          head_dim=d, mask_kv=mask_kv),
        grid=(B, nblk, Nq // bq),
        in_specs=[spec(0, bq), spec(1, Nq), spec(2, Nq)],
        out_specs=pl.BlockSpec((1, bq, 128), lambda b, h2, i: (b, i, h2),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Nq, H * d), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(flat, flat, flat)
    return out if n_valid is not None else out[:, :N]


def _fused_einsum_ref(qkv, scale, n_valid: int | None = None):
    """Einsum formulation matching the kernel's semantics: every query row
    (including caller-padding rows) attends over the first ``n_valid``
    keys/values only."""
    B, N, _, H, d = qkv.shape
    q, k, v = jnp.moveaxis(qkv, 2, 0)  # each (B, N, H, d)
    if n_valid is not None:
        k, v = k[:, :n_valid], v[:, :n_valid]
    s = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k,
                   preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s, axis=-1).astype(qkv.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(B, N, H * d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def fused_qkv_attention(qkv, scale: float, interpret: bool = False,
                        n_valid: int | None = None):
    """Non-causal attention on the fused projection output.

    qkv: (B, N, 3, H, d) → (B, N, H*d). TPU single-pass kernel forward;
    einsum-math backward (cold path: frozen backbones). ``n_valid``: see
    ``_fused_forward`` — rows ≥ n_valid are network-level padding, masked
    out of K/V and kept (as garbage) in the padded output."""
    return _fused_forward(qkv, scale, interpret=interpret, n_valid=n_valid)


def _fused_fwd(qkv, scale, interpret, n_valid):
    return _fused_forward(qkv, scale, interpret=interpret,
                          n_valid=n_valid), (qkv,)


def _fused_bwd(scale, interpret, n_valid, res, g):
    # the masked einsum ref reproduces the kernel exactly (padded query
    # rows attend over valid keys; padded key/value rows are excluded), so
    # its vjp is correct for ANY cotangent — including callers whose loss
    # reads padded output rows
    (qkv,) = res
    _, vjp = jax.vjp(lambda x: _fused_einsum_ref(x, scale, n_valid), qkv)
    return vjp(g)


fused_qkv_attention.defvjp(_fused_fwd, _fused_bwd)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def _forward(q, k, v, scale: float, interpret: bool = False):
    B, H, N, d = q.shape
    pad = (-N) % 128
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
    Nq = N + pad
    bq = _pick_block_q(Nq, Nq)

    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, n_valid=N),
        grid=(B, H, Nq // bq),
        in_specs=[
            pl.BlockSpec((1, 1, bq, d), lambda b, h, i: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Nq, d), lambda b, h, i: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Nq, d), lambda b, h, i: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, d), lambda b, h, i: (b, h, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, Nq, d), q.dtype),
        interpret=interpret,
    )(qp, kp, vp)
    return out[:, :, :N]


def _einsum_ref(q, k, v, scale):
    s = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k,
                   preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def vit_attention(q, k, v, scale: float, interpret: bool = False):
    """Non-causal, unmasked attention (B, H, N, d). TPU single-pass kernel
    forward; einsum-math backward (cold path: frozen backbones)."""
    return _forward(q, k, v, scale, interpret=interpret)


def _fwd(q, k, v, scale, interpret):
    return _forward(q, k, v, scale, interpret=interpret), (q, k, v)


def _bwd(scale, interpret, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda a, b, c: _einsum_ref(a, b, c, scale), q, k, v)
    return vjp(g)


vit_attention.defvjp(_fwd, _bwd)

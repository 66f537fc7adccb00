"""Fused multi-head attention dispatch.

The reference's wrapped backbones all run plain full attention with the
(N x N) score matrix materialized (e.g. ``ibot_transformers.py:109-147``) —
at NYU resolution that is (B, 12, 1201, 1201) per layer, which makes the
ViT forward HBM-bandwidth-bound on TPU. On TPU this module routes to the
Pallas flash-attention kernel (online softmax, scores never leave VMEM);
sequences are padded to the kernel's 128-multiple block granularity with
segment-id masking so padded keys contribute nothing.

Falls back to a plain XLA einsum path on CPU, for attention biases
(BEiT relative position bias), and for short sequences where kernel launch
overhead dominates.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_BLOCK = 128
_MIN_FLASH_SEQ = 256  # below this the einsum path is at least as fast


def _einsum_attention(q, k, v, bias=None, scale=1.0):
    """(B, H, N, d) reference path; f32 softmax."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k,
                   preferred_element_type=jnp.float32)
    if bias is not None:
        s = s + bias.astype(s.dtype)
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


@functools.partial(jax.jit, static_argnames=("scale",))
def _flash_attention(q, k, v, scale: float):
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        flash_attention,
    )

    B, H, N, d = q.shape
    pad = (-N) % _BLOCK
    npad = N + pad
    if pad:
        qp = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
        kp = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
        vp = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
        from jax.experimental.pallas.ops.tpu.flash_attention import SegmentIds

        ids = (jnp.arange(npad) < N).astype(jnp.int32)[None]
        ids = jnp.broadcast_to(ids, (B, npad))
        # pad tokens get segment 0, real tokens segment 1
        seg = SegmentIds(q=ids, kv=ids)
    else:
        qp, kp, vp = q, k, v
        seg = None

    # Tuned on v5e for ViT-scale sequences (1-3k tokens, head_dim 64):
    # whole-sequence q blocks + the widest inner k tile that divides the
    # padded extent (fewer online-softmax correction passes — the kernel is
    # VPU-bound at head_dim 64). Measured 31 TF/s vs 14.6 for einsum.
    def _largest_divisor(limit):
        best = _BLOCK
        for cand in range(limit, _BLOCK - 1, -_BLOCK):
            if npad % cand == 0:
                best = cand
                break
        return best

    bq = _largest_divisor(1280)
    bkM = npad
    bk = _largest_divisor(640)
    sizes = BlockSizes(
        block_q=bq, block_k_major=bkM, block_k=bk, block_b=1,
        block_q_major_dkv=bq, block_k_major_dkv=bkM,
        block_k_dkv=bk, block_q_dkv=bq,
        block_k_major_dq=bkM, block_k_dq=bk, block_q_dq=bq,
    )
    out = flash_attention(qp, kp, vp, segment_ids=seg, causal=False,
                          sm_scale=scale, block_sizes=sizes)
    return out[:, :, :N]


def multi_head_attention(q, k, v, bias=None, scale: float = 1.0,
                         use_flash: bool | None = None):
    """Dispatch fused vs einsum attention. All inputs (B, H, N, d).

    TPU + no bias + long-enough sequence → the single-pass ViT kernel
    (``ops/vit_attention.py``, fastest at probing scales); ``use_flash=True``
    forces the generic jax flash kernel instead (online softmax — needed
    only when K/V no longer fit VMEM, i.e. N >> 4k)."""
    if use_flash is None:
        on_tpu = (
            jax.default_backend() == "tpu"
            and bias is None
            and q.shape[2] >= _MIN_FLASH_SEQ
            and q.shape[-1] <= 256
        )
        if on_tpu:
            kv_bytes = q.shape[2] * q.shape[-1] * q.dtype.itemsize * 2
            if kv_bytes <= 2 * 1024 * 1024:  # K+V resident in VMEM
                from midvision_probe_tpu.ops.vit_attention import vit_attention

                return vit_attention(q, k, v, float(scale))
            return _flash_attention(q, k, v, float(scale))
        return _einsum_attention(q, k, v, bias, scale)
    if use_flash:
        # the flash kernel has no bias input — silently dropping a rel-pos
        # bias would return wrong attention; force the einsum path instead
        assert bias is None, (
            "use_flash=True cannot apply an attention bias; pass "
            "use_flash=None/False for biased (BEiT-style) attention"
        )
        return _flash_attention(q, k, v, float(scale))
    return _einsum_attention(q, k, v, bias, scale)

"""Fused-attention dispatch parity (einsum path == torch SDPA reference)."""

import jax.numpy as jnp
import numpy as np
import torch

from midvision_probe_tpu.ops.attention import multi_head_attention


def test_einsum_attention_matches_torch(rng):
    B, H, N, d = 2, 3, 17, 8
    q = rng.randn(B, H, N, d).astype(np.float32)
    k = rng.randn(B, H, N, d).astype(np.float32)
    v = rng.randn(B, H, N, d).astype(np.float32)
    scale = d**-0.5

    ref = torch.nn.functional.scaled_dot_product_attention(
        torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v),
        scale=scale,
    ).numpy()
    got = multi_head_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale=scale,
        use_flash=False,
    )
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-5, rtol=1e-4)


def test_attention_with_bias(rng):
    B, H, N, d = 1, 2, 9, 4
    q = rng.randn(B, H, N, d).astype(np.float32)
    k = rng.randn(B, H, N, d).astype(np.float32)
    v = rng.randn(B, H, N, d).astype(np.float32)
    bias = rng.randn(1, H, N, N).astype(np.float32)
    ref = torch.nn.functional.scaled_dot_product_attention(
        torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v),
        attn_mask=torch.from_numpy(np.broadcast_to(bias, (B, H, N, N)).copy()),
        scale=1.0,
    ).numpy()
    got = multi_head_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        bias=jnp.asarray(bias), scale=1.0, use_flash=False,
    )
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-5, rtol=1e-4)

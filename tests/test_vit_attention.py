"""Single-pass ViT attention kernel: forward + custom-vjp parity."""

import jax
import jax.numpy as jnp
import numpy as np

from midvision_probe_tpu.ops.vit_attention import (
    _einsum_ref,
    _fused_einsum_ref,
    fused_qkv_attention,
    vit_attention,
)


def test_fused_qkv_attention_matches_einsum(rng):
    """Layout-native kernel (reads (B,N,3,H,d), writes token-major) against
    the einsum formulation, including the zero-pad normalizer correction
    (N=70 pads to 128 → 58 corrected columns)."""
    B, N, H, d = 2, 70, 8, 16
    qkv = jnp.asarray(rng.randn(B, N, 3, H, d).astype(np.float32))
    got = fused_qkv_attention(qkv, d**-0.5, True)
    ref = _fused_einsum_ref(qkv, d**-0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)


def test_fused_qkv_attention_grad_matches_einsum(rng):
    B, N, H, d = 1, 40, 16, 8
    qkv = jnp.asarray(rng.randn(B, N, 3, H, d).astype(np.float32))
    g1 = jax.grad(
        lambda x: jnp.sum(fused_qkv_attention(x, 0.3, True) ** 2))(qkv)
    g2 = jax.grad(lambda x: jnp.sum(_fused_einsum_ref(x, 0.3) ** 2))(qkv)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=2e-6)


def test_vit_attention_forward_matches_einsum(rng):
    B, H, N, d = 2, 3, 70, 16
    q = jnp.asarray(rng.randn(B, H, N, d).astype(np.float32))
    k = jnp.asarray(rng.randn(B, H, N, d).astype(np.float32))
    v = jnp.asarray(rng.randn(B, H, N, d).astype(np.float32))
    got = vit_attention(q, k, v, d**-0.5, True)
    ref = _einsum_ref(q, k, v, d**-0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)


def test_vit_attention_grad_matches_einsum(rng):
    B, H, N, d = 1, 2, 40, 8
    q = jnp.asarray(rng.randn(B, H, N, d).astype(np.float32))
    k = jnp.asarray(rng.randn(B, H, N, d).astype(np.float32))
    v = jnp.asarray(rng.randn(B, H, N, d).astype(np.float32))

    g1 = jax.grad(lambda x: jnp.sum(vit_attention(x, k, v, 0.3, True) ** 2))(q)
    g2 = jax.grad(lambda x: jnp.sum(_einsum_ref(x, k, v, 0.3) ** 2))(q)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=2e-6)

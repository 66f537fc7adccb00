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


def test_fused_qkv_attention_n_valid_masks_garbage_rows(rng):
    """Network-level padding: rows >= n_valid hold garbage; the kernel must
    mask them out of K/V so valid rows match the einsum over the real N."""
    B, N, H, d = 2, 256, 8, 16
    n_valid = 200
    qkv = jnp.asarray(rng.randn(B, N, 3, H, d).astype(np.float32))
    got = fused_qkv_attention(qkv, d**-0.5, True, n_valid)
    assert got.shape == (B, N, H * d)
    ref = _fused_einsum_ref(qkv[:, :n_valid], d**-0.5)
    np.testing.assert_allclose(
        np.asarray(got[:, :n_valid]), np.asarray(ref), atol=2e-6)


def test_fused_qkv_attention_n_valid_grad(rng):
    B, N, H, d = 1, 128, 4, 32
    n_valid = 100
    qkv = jnp.asarray(rng.randn(B, N, 3, H, d).astype(np.float32))

    def loss_kernel(x):
        o = fused_qkv_attention(x, 0.3, True, n_valid)
        return jnp.sum(o[:, :n_valid] ** 2)

    def loss_ref(x):
        return jnp.sum(_fused_einsum_ref(x[:, :n_valid], 0.3) ** 2)

    g1 = jax.grad(loss_kernel)(qkv)
    g2 = jax.grad(loss_ref)(qkv)
    # forward runs the kernel (exp2 formulation), ref runs jax softmax;
    # the cotangent o therefore differs at f32 rounding level
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)
    # padded rows carry zero cotangent
    assert float(jnp.abs(g1[:, n_valid:]).max()) == 0.0


def test_vit_whole_network_padding_matches_unpadded(rng, monkeypatch):
    """The whole-network 128-padding path (fused kernel + in-kernel K/V
    masking + tap slicing) must reproduce the plain einsum ViT bit-for-bit
    up to kernel tolerance. N = 16*16+1 = 257 → padded to 384."""
    import midvision_probe_tpu.models.vit as vitmod

    cfg = vitmod.ViTConfig(patch_size=16, width=128, depth=2, num_heads=2,
                           dtype=jnp.float32)
    model = vitmod.ViT(cfg)
    images = jnp.asarray(rng.randn(1, 256, 256, 3).astype(np.float32) * 0.1)
    params = model.init(jax.random.PRNGKey(0), images, taps=[0, 1])

    plain = model.apply(params, images, taps=[0, 1])
    monkeypatch.setattr(vitmod, "_FORCE_INTERPRET", True)
    padded = model.apply(params, images, taps=[0, 1])

    for a, b in zip(plain["tokens"], padded["tokens"]):
        assert a.shape == b.shape == (1, 257, 128)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_vit_whole_network_padding_dinov2_style(rng, monkeypatch):
    """Padding equivalence with the most intricate token layout in the zoo:
    cls + 4 register tokens + LayerScale (DINOv2-reg). N = 256+5 = 261."""
    import midvision_probe_tpu.models.vit as vitmod

    cfg = vitmod.ViTConfig(patch_size=16, width=128, depth=2, num_heads=2,
                           num_register_tokens=4, layerscale=True,
                           dtype=jnp.float32)
    model = vitmod.ViT(cfg)
    images = jnp.asarray(rng.randn(1, 256, 256, 3).astype(np.float32) * 0.1)
    params = model.init(jax.random.PRNGKey(1), images, taps=[1])

    plain = model.apply(params, images, taps=[1])
    monkeypatch.setattr(vitmod, "_FORCE_INTERPRET", True)
    padded = model.apply(params, images, taps=[1])

    a, b = plain["tokens"][0], padded["tokens"][0]
    assert a.shape == b.shape == (1, 261, 128)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_fused_qkv_attention_uniformly_negative_rows(rng):
    """Regression: rows whose valid scores are all very negative must not
    blow up against padded columns. The earlier normalizer correction
    (l - npad over exp2(0)-contributing pad columns) catastrophically
    cancelled here — valid rows went to Inf below logit ~ -20. The -inf
    column mask is exact for any score range."""
    B, N, H, d = 1, 256, 2, 64
    n_valid = 200
    qkv = rng.randn(B, N, 3, H, d).astype(np.float32) * 0.02
    # scores q·k ≈ -166 → scaled base-2 scores ≈ -30 for every valid key
    qkv[:, :, 1] = 1.0
    qkv[:, :, 0] = -2.6
    qkv = jnp.asarray(qkv)
    got = fused_qkv_attention(qkv, d**-0.5, True, n_valid)
    ref = _fused_einsum_ref(qkv, d**-0.5, n_valid)
    assert np.isfinite(np.asarray(got[:, :n_valid])).all()
    np.testing.assert_allclose(np.asarray(got[:, :n_valid]),
                               np.asarray(ref[:, :n_valid]), atol=1e-5)


def test_fused_qkv_attention_n_valid_full_output_grad(rng):
    """The custom vjp must be correct even when the caller's loss reads the
    padded output rows (they are real outputs: padded queries attending
    over valid keys)."""
    B, N, H, d = 1, 128, 4, 32
    n_valid = 100
    qkv = jnp.asarray(rng.randn(B, N, 3, H, d).astype(np.float32))
    g1 = jax.grad(lambda x: jnp.sum(
        fused_qkv_attention(x, 0.3, True, n_valid) ** 2))(qkv)
    g2 = jax.grad(lambda x: jnp.sum(
        _fused_einsum_ref(x, 0.3, n_valid) ** 2))(qkv)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)

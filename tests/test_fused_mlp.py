"""Fused MLP kernel parity (interpret mode) + ViT module integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from midvision_probe_tpu.ops.fused_mlp import _plain, fused_mlp


@pytest.mark.parametrize("act", ["gelu", "gelu_tanh", "quickgelu"])
def test_fused_mlp_matches_plain(rng, act):
    M, C, H = 300, 128, 256  # M=300 exercises row padding
    x = jnp.asarray(rng.randn(M, C).astype(np.float32) * 0.5)
    w1 = jnp.asarray(rng.randn(C, H).astype(np.float32) * 0.05)
    b1 = jnp.asarray(rng.randn(H).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.randn(H, C).astype(np.float32) * 0.05)
    b2 = jnp.asarray(rng.randn(C).astype(np.float32) * 0.1)
    got = fused_mlp(x, w1, b1, w2, b2, act, True)
    ref = _plain(x, w1, b1, w2, b2, act)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_fused_mlp_grad(rng):
    M, C, H = 8, 128, 256
    x = jnp.asarray(rng.randn(M, C).astype(np.float32) * 0.5)
    w1 = jnp.asarray(rng.randn(C, H).astype(np.float32) * 0.05)
    b1 = jnp.zeros(H)
    w2 = jnp.asarray(rng.randn(H, C).astype(np.float32) * 0.05)
    b2 = jnp.zeros(C)
    g1 = jax.grad(lambda a: jnp.sum(fused_mlp(a, w1, b1, w2, b2,
                                              "gelu", True) ** 2))(x)
    g2 = jax.grad(lambda a: jnp.sum(_plain(a, w1, b1, w2, b2,
                                           "gelu") ** 2))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               atol=2e-5, rtol=1e-4)

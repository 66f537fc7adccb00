"""Exactness of the folded nearest-up + conv3x3 (ops/subpixel.py) and the
Linear decoder's conv<->bilinear commute against the reference op order."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from midvision_probe_tpu.models.probes import Linear
from midvision_probe_tpu.ops.image import resize
from midvision_probe_tpu.ops.subpixel import (NearestUpConv,
                                              conv3x3_after_nearest_up)


def _ref_order(x, kernel, bias, up):
    """resize(nearest, up) then SAME conv3x3 — the reference formulation
    (``evals/models/probes.py:388-391``)."""
    y = resize(x, scale_factor=up, mode="nearest")
    y = jax.lax.conv_general_dilated(
        y, kernel, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + bias


@pytest.mark.parametrize("up", [2, 3, 4])
@pytest.mark.parametrize("hw", [(6, 7), (15, 15)])
def test_folded_conv_matches_reference_order(up, hw):
    rng = np.random.RandomState(0)
    cin, cout = 5, 3
    x = jnp.asarray(rng.randn(2, *hw, cin).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, cin, cout).astype(np.float32))
    b = jnp.asarray(rng.randn(cout).astype(np.float32))
    ref = _ref_order(x, k, b, up)
    got = conv3x3_after_nearest_up(x, k, b, up)
    assert got.shape == ref.shape == (2, up * hw[0], up * hw[1], cout)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_folded_conv_gradients_match():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 4, 2).astype(np.float32))
    b = jnp.asarray(rng.randn(2).astype(np.float32))

    def loss_ref(k, b):
        return jnp.sum(jnp.sin(_ref_order(x, k, b, 4)))

    def loss_fold(k, b):
        return jnp.sum(jnp.sin(conv3x3_after_nearest_up(x, k, b, 4)))

    gr = jax.grad(loss_ref, argnums=(0, 1))(k, b)
    gf = jax.grad(loss_fold, argnums=(0, 1))(k, b)
    for a, c in zip(gr, gf):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-4, atol=1e-4)


def test_nearest_up_conv_param_pytree_matches_nn_conv():
    """Checkpoint compatibility: NearestUpConv must expose the same
    kernel/bias params as the nn.Conv it replaces."""
    m = NearestUpConv(features=8, up=4)
    x = jnp.zeros((1, 5, 5, 6))
    v = m.init(jax.random.PRNGKey(0), x)
    assert set(v["params"].keys()) == {"kernel", "bias"}
    assert v["params"]["kernel"].shape == (3, 3, 6, 8)
    assert v["params"]["bias"].shape == (8,)
    # plugging nn.Conv params in reproduces nn.Conv(resize(x)) exactly
    conv = nn.Conv(8, (3, 3), padding=((1, 1), (1, 1)))
    cv = conv.init(jax.random.PRNGKey(1), x)
    rng = np.random.RandomState(2)
    xr = jnp.asarray(rng.randn(2, 5, 5, 6).astype(np.float32))
    ref = conv.apply(cv, resize(xr, scale_factor=4, mode="nearest"))
    got = m.apply({"params": cv["params"]}, xr)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_linear_decoder_commute_matches_reference_order():
    """kernel_size=1 Linear: conv-then-resize == resize-then-conv."""
    rng = np.random.RandomState(3)
    feats = [jnp.asarray(rng.randn(2, 7, 9, 6).astype(np.float32))
             for _ in range(2)]
    m = Linear(output_dim=4, kernel_size=1)
    v = m.init(jax.random.PRNGKey(0), feats)
    got = m.apply(v, feats)
    cat = jnp.concatenate(feats, axis=-1)
    up = resize(cat, scale_factor=4, mode="bilinear")
    ref = nn.Conv(4, (1, 1), padding=((0, 0), (0, 0)), name="conv").apply(
        {"params": v["params"]["conv"]}, up)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_linear_decoder_k3_unchanged():
    """kernel_size>1 must keep the reference order (no commute)."""
    rng = np.random.RandomState(4)
    feats = jnp.asarray(rng.randn(1, 6, 6, 5).astype(np.float32))
    m = Linear(output_dim=3, kernel_size=3)
    v = m.init(jax.random.PRNGKey(0), feats)
    out = m.apply(v, feats)
    assert out.shape == (1, 24, 24, 3)
    assert v["params"]["conv"]["kernel"].shape == (3, 3, 5, 3)


def _conv2d(x, p, pad=1):
    y = jax.lax.conv_general_dilated(
        x, p["kernel"], (1, 1), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + p["bias"]


def test_dpt_transformer_branch_matches_reference_order():
    """Whole-DPT equivalence: the folded decoder (input_up RCUs +
    NearestUpConv out_conv_0) must equal the literal reference op order
    (resize-then-conv everywhere, ``evals/models/probes.py:377-399``) for
    the SAME parameter pytree."""
    from midvision_probe_tpu.models.probes import DPT

    hd = 16
    rng = np.random.RandomState(5)
    feats = [jnp.asarray(rng.randn(2, 6, 8, 12).astype(np.float32))
             for _ in range(4)]
    m = DPT(output_dim=5, hidden_dim=hd, kernel_size=3, resnet_mode=False)
    v = m.init(jax.random.PRNGKey(0), feats)
    got = m.apply(v, feats)
    p = v["params"]

    def rcu(pp, x):
        h = jax.nn.relu(_conv2d(x, pp["conv1"]))
        h = jax.nn.relu(_conv2d(h, pp["conv2"]))
        return h + x

    def ffb(pp, x, skip):
        if skip is not None:
            x = rcu(pp["resConfUnit1"], x) + skip
        return rcu(pp["resConfUnit2"], x)

    f = [_conv2d(feats[i], p[f"conv_{i}"], pad=0) for i in range(4)]
    f = [resize(x, scale_factor=2, mode="nearest") for x in f]
    out = ffb(p["ref_3"], f[3], None)
    out = ffb(p["ref_2"], f[2], out)
    out = ffb(p["ref_1"], f[1], out)
    out = ffb(p["ref_0"], f[0], out)
    out = resize(out, scale_factor=4, mode="nearest")
    out = jax.nn.relu(_conv2d(out, p["out_conv_0"]))
    out = _conv2d(out, p["out_conv_1"])
    ref = resize(out, scale_factor=2, mode="nearest")

    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-4, atol=3e-4)

"""Parity tests for ops.image / ops.matching / ops.rope2d.

Torch (CPU) serves as the golden reference for the interpolation and
grid_sample semantics the reference repo relies on (SURVEY §2.3, §7 hard
part (c)).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from midvision_probe_tpu.ops import center_padding, grid_sample, knn2, resize, rope_2d
from midvision_probe_tpu.ops.matching import (
    calculate_ratio_test,
    get_correspondences_ratio_test,
)


def _to_nhwc(t: torch.Tensor) -> np.ndarray:
    return t.permute(0, 2, 3, 1).numpy()


@pytest.mark.parametrize(
    "mode,align,in_hw,out_hw",
    [
        ("bilinear", False, (13, 17), (29, 37)),
        ("bilinear", True, (16, 16), (32, 32)),
        ("bilinear", False, (30, 40), (480, 640)),
        ("bilinear", True, (15, 20), (30, 40)),
        ("bicubic", False, (14, 14), (30, 40)),
        ("bilinear", False, (32, 32), (15, 19)),
        ("nearest", False, (16, 16), (7, 9)),
    ],
)
def test_resize_matches_torch(rng, mode, align, in_hw, out_hw):
    x = rng.randn(2, 3, *in_hw).astype(np.float32)
    kwargs = {} if mode == "nearest" else {"align_corners": align}
    ref = F.interpolate(torch.from_numpy(x), size=out_hw, mode=mode, **kwargs)
    got = resize(jnp.asarray(_to_nhwc(torch.from_numpy(x))), out_hw, mode=mode,
                 align_corners=align)
    np.testing.assert_allclose(np.asarray(got), _to_nhwc(ref), atol=2e-5, rtol=1e-5)


def test_resize_antialias_downsample(rng):
    x = rng.randn(1, 4, 64, 48).astype(np.float32)
    ref = F.interpolate(
        torch.from_numpy(x), size=(16, 12), mode="bilinear", antialias=True,
        align_corners=False,
    )
    got = resize(
        jnp.asarray(_to_nhwc(torch.from_numpy(x))), (16, 12), mode="bilinear",
        antialias=True,
    )
    np.testing.assert_allclose(np.asarray(got), _to_nhwc(ref), atol=2e-4, rtol=1e-4)


def test_resize_bicubic_antialias_posembed(rng):
    # pos-embed resize path: (n, c) grid -> bicubic antialias (utils.py:43-45)
    x = rng.randn(1, 768, 14, 14).astype(np.float32)
    ref = F.interpolate(
        torch.from_numpy(x), (30, 40), mode="bicubic", align_corners=False,
        antialias=True,
    )
    got = resize(
        jnp.asarray(_to_nhwc(torch.from_numpy(x))), (30, 40), mode="bicubic",
        antialias=True,
    )
    np.testing.assert_allclose(np.asarray(got), _to_nhwc(ref), atol=5e-4, rtol=1e-3)


def test_center_padding_matches_torch(rng):
    x = rng.randn(2, 3, 37, 53).astype(np.float32)
    pt = torch.from_numpy(x)
    h, w = 37, 53
    ps = 16
    pad_h, pad_w = ps - h % ps, ps - w % ps
    pad_t, pad_l = pad_h // 2, pad_w // 2
    ref = F.pad(pt, (pad_l, pad_w - pad_l, pad_t, pad_h - pad_t))
    got = center_padding(jnp.asarray(_to_nhwc(pt)), ps)
    np.testing.assert_allclose(np.asarray(got), _to_nhwc(ref))


def test_grid_sample_matches_torch(rng):
    feats = rng.randn(2, 8, 11, 13).astype(np.float32)
    grid = (rng.rand(2, 5, 7, 2).astype(np.float32) * 2.4) - 1.2  # incl. OOB
    ref = F.grid_sample(
        torch.from_numpy(feats), torch.from_numpy(grid), mode="bilinear",
        padding_mode="zeros", align_corners=False,
    )
    got = grid_sample(jnp.asarray(_to_nhwc(torch.from_numpy(feats))), jnp.asarray(grid))
    np.testing.assert_allclose(
        np.asarray(got), _to_nhwc(ref), atol=1e-5, rtol=1e-5
    )


@pytest.mark.parametrize("metric", ["cosine", "euclidean"])
@pytest.mark.parametrize("use_pallas", [False, True])
def test_knn2_exact(rng, metric, use_pallas):
    q = rng.randn(37, 19).astype(np.float32)
    t = rng.randn(53, 19).astype(np.float32)
    # multi-tile grid (tile_m=16 -> 4 target tiles) exercises the running
    # top-2 merge across the sequential grid dimension
    dists, idx = knn2(jnp.asarray(q), jnp.asarray(t), metric=metric,
                      use_pallas=use_pallas, interpret=True, tile_n=16, tile_m=16)

    if metric == "cosine":
        qn = q / np.linalg.norm(q, axis=1, keepdims=True)
        tn = t / np.linalg.norm(t, axis=1, keepdims=True)
        full = 1.0 - qn @ tn.T
    else:
        full = np.sqrt(
            np.maximum(
                (q**2).sum(1)[:, None] + (t**2).sum(1)[None] - 2 * q @ t.T, 0
            )
        )
    ref_idx = np.argsort(full, axis=1)[:, :2]
    ref_d = np.take_along_axis(full, ref_idx, axis=1)
    # indices may differ on float near-ties; require the *chosen* neighbours'
    # true distances to match the optimal ones
    chosen_d = np.take_along_axis(full, np.asarray(idx), axis=1)
    np.testing.assert_allclose(chosen_d, ref_d, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dists), ref_d, atol=1e-4)


def test_ratio_test_and_topk(rng):
    d = np.abs(rng.randn(50, 2)).astype(np.float32)
    d.sort(axis=1)
    w = calculate_ratio_test(jnp.asarray(d))
    ref_w = 1.0 - np.clip(d, 1e-9, None)[:, 0] / np.clip(d[:, 1], 1e-9, None)
    np.testing.assert_allclose(np.asarray(w), ref_w, atol=1e-6)

    i1, i2, w2 = get_correspondences_ratio_test(
        jnp.asarray(rng.randn(64, 16).astype(np.float32)),
        jnp.asarray(rng.randn(80, 16).astype(np.float32)),
        num_corres=10,
        use_pallas=False,
    )
    assert i1.shape == (10,) and i2.shape == (10,)
    assert np.all(np.diff(np.asarray(w2)) <= 1e-6)  # sorted descending


def test_rope2d_matches_reference(rng):
    """Against a literal numpy transcription of croco pos_embed.py:110-157."""
    B, H, N, dim = 2, 3, 24, 32
    tokens = rng.randn(B, H, N, dim).astype(np.float32)
    pos = rng.randint(0, 30, size=(B, N, 2)).astype(np.int32)
    base = 100.0

    D = dim // 2
    inv_freq = 1.0 / (base ** (np.arange(0, D, 2, dtype=np.float32) / D))

    def rope1d(tok, pos1d):
        freqs = pos1d[..., None].astype(np.float32) * inv_freq  # (B, N, D/2)
        freqs = np.concatenate([freqs, freqs], axis=-1)  # (B, N, D)
        cos, sin = np.cos(freqs)[:, None], np.sin(freqs)[:, None]
        x1, x2 = tok[..., : D // 2], tok[..., D // 2 :]
        rot = np.concatenate([-x2, x1], axis=-1)
        return tok * cos + rot * sin

    y = rope1d(tokens[..., :D], pos[..., 0])
    x = rope1d(tokens[..., D:], pos[..., 1])
    ref = np.concatenate([y, x], axis=-1)

    got = rope_2d(jnp.asarray(tokens), jnp.asarray(pos), base=base, use_pallas=False)
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5)

    got_pl = rope_2d(
        jnp.asarray(tokens), jnp.asarray(pos), base=base, use_pallas=True,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got_pl), ref, atol=1e-5)


def test_devices_are_virtual():
    assert len(jax.devices()) == 8


def test_gelu_dtype_gating():
    """ops/activations.gelu: erf-exact in f32 (torch nn.GELU parity), tanh
    in bf16 where the approximation error (~3e-4) is below bf16 rounding."""
    import torch

    from midvision_probe_tpu.ops.activations import gelu

    x = np.linspace(-4, 4, 257, dtype=np.float32)
    got32 = np.asarray(gelu(jnp.asarray(x)))
    ref = torch.nn.functional.gelu(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(got32, ref, atol=1e-6)

    got16 = np.asarray(gelu(jnp.asarray(x, dtype=jnp.bfloat16))
                       .astype(jnp.float32))
    # tanh-form in bf16 must round-trip to the exact value within one
    # bf16 ulp of the magnitude (~8e-3 relative)
    np.testing.assert_allclose(got16, ref, atol=0.04, rtol=0.02)


def test_knn2_pallas_pad_rows_never_win():
    """Regression: padded target rows (target count not a tile multiple)
    must never appear in the top-2, even for unnormalized large-magnitude
    queries that sit near a finite coordinate sentinel (the old pad
    encoding). Pallas interpret mode vs the XLA fallback."""
    import numpy as np

    from midvision_probe_tpu.ops.matching import knn2

    rng = np.random.RandomState(0)
    q = jnp.full((4, 128), 990.0, jnp.float32)
    t = jnp.asarray(rng.randn(100, 128).astype(np.float32))
    d_ref, i_ref = knn2(q, t, metric="euclidean", use_pallas=False)
    d_pl, i_pl = knn2(q, t, metric="euclidean", use_pallas=True,
                      interpret=True, tile_m=64)
    assert (np.asarray(i_pl) < 100).all(), np.asarray(i_pl)
    np.testing.assert_array_equal(np.asarray(i_ref), np.asarray(i_pl))
    np.testing.assert_allclose(np.asarray(d_ref), np.asarray(d_pl),
                               rtol=1e-5, atol=1e-3)


def test_knn2_auto_tiles_fit_vmem_budget():
    """suite r5: resnet dense features (d=2048) overflowed the 16 MiB
    scoped-VMEM at compile time — the default (512, 1024) tiles only fit
    up to dp=768. _auto_tiles must shrink to budget, keep the tuned ViT
    config untouched, and floor at 128."""
    from midvision_probe_tpu.ops.matching import (
        _TILE_VMEM_BUDGET, _auto_tiles)

    assert _auto_tiles(768, 512, 1024) == (512, 1024)  # headline unchanged
    for dp in (1024, 2048, 4096):
        tn, tm = _auto_tiles(dp, 512, 1024)
        assert (tn + tm) * dp <= _TILE_VMEM_BUDGET
        assert tn >= 128 and tm >= 128
    # explicit smaller requests pass through untouched
    assert _auto_tiles(128, 16, 16) == (16, 16)


def test_knn2_wide_features_exact(rng):
    """d=2048 (resnet stage-4 dense) through the pallas path in interpret
    mode — exercises the auto-shrunk tiling end-to-end — and the >4096-d
    auto-dispatch to XLA."""
    import jax

    q = rng.randn(40, 2048).astype(np.float32) * 3
    t = rng.randn(72, 2048).astype(np.float32) * 3
    dists, idx = knn2(jnp.asarray(q), jnp.asarray(t), metric="euclidean",
                      use_pallas=True, interpret=True)
    full = np.sqrt(np.maximum(
        (q**2).sum(1)[:, None] + (t**2).sum(1)[None] - 2 * q @ t.T, 0))
    ref_idx = np.argsort(full, axis=1)[:, :2]
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)
    np.testing.assert_allclose(
        np.asarray(dists), np.take_along_axis(full, ref_idx, axis=1),
        atol=2e-3, rtol=1e-4)

    # dp > 4096 with use_pallas unset must pick the XLA fallback (no
    # compile failure); on CPU default_backend is cpu so just assert the
    # dispatch predicate directly
    from midvision_probe_tpu.ops import matching as M
    wide = M._round_up(6000, 128)
    assert wide > 4096  # such a query must not auto-select pallas

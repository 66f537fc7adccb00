"""Geometric correspondence evaluators on synthetic consistent scenes."""

import jax.numpy as jnp
import numpy as np

from midvision_probe_tpu.evaluators.geometric import (
    navi_batch_errors,
    scannet_batch_errors,
)


def test_navi_identity_pair_zero_error(rng):
    """Same view twice with identity relative pose: every correspondence is
    exact, so 3D and 2D errors must be ~0."""
    B, H, W, C = 2, 16, 16, 12
    feats = rng.randn(B, H, W, C).astype(np.float32)
    xyz = rng.rand(B, H, W, 3).astype(np.float32) + 0.5
    Rt = np.broadcast_to(np.eye(4, dtype=np.float32), (B, 4, 4)).copy()
    K = np.broadcast_to(np.eye(3, dtype=np.float32) * 20, (B, 3, 3)).copy()
    K[:, 2, 2] = 1

    e3, e2, ok = navi_batch_errors(
        jnp.asarray(feats), jnp.asarray(feats), jnp.asarray(xyz),
        jnp.asarray(xyz), jnp.asarray(Rt), jnp.asarray(K),
        num_corr=50, use_pallas=False,
    )
    assert np.asarray(e3).max() < 1e-4
    assert np.asarray(e2).max() < 1e-2


def test_navi_rigid_transform_consistency(rng):
    """View 1 is view 0 rigidly transformed; identical features per point →
    matched points satisfy the transform, 3D error ~0."""
    from scipy.spatial.transform import Rotation

    B, H, W, C = 1, 12, 12, 8
    feats = rng.randn(B, H, W, C).astype(np.float32)
    xyz0 = rng.rand(B, H, W, 3).astype(np.float32) + 0.5
    R = Rotation.from_euler("y", 25, degrees=True).as_matrix().astype(np.float32)
    t = np.array([0.1, -0.05, 0.2], np.float32)
    xyz1 = xyz0 @ R.T + t
    Rt = np.eye(4, dtype=np.float32)
    Rt[:3, :3] = R
    Rt[:3, 3] = t
    K = np.eye(3, dtype=np.float32) * 15
    K[2, 2] = 1

    e3, _, ok = navi_batch_errors(
        jnp.asarray(feats), jnp.asarray(feats), jnp.asarray(xyz0),
        jnp.asarray(xyz1), jnp.asarray(Rt[None]), jnp.asarray(K[None]),
        num_corr=30, use_pallas=False,
    )
    assert np.asarray(e3).max() < 1e-3


def test_scannet_identity_pair(rng):
    B, H, W, C = 1, 16, 20, 8
    feats = rng.randn(B, H, W, C).astype(np.float32)
    depth = (rng.rand(B, H, W).astype(np.float32) + 0.5) * 2
    K = np.array([[25.0, 0, 10], [0, 25.0, 8], [0, 0, 1]], np.float32)[None]
    Rt = np.eye(4, dtype=np.float32)[None]

    e3, e2, uv0, uv1, ok = scannet_batch_errors(
        jnp.asarray(feats), jnp.asarray(feats), jnp.asarray(depth),
        jnp.asarray(depth), jnp.asarray(K), jnp.asarray(Rt),
        num_corr=40, use_pallas=False,
    )
    assert np.asarray(e3).max() < 1e-4
    assert np.asarray(e2).max() < 1e-2
    # identity pair: matched uv points coincide
    np.testing.assert_allclose(np.asarray(uv0), np.asarray(uv1), atol=1e-2)


def test_scannet_driver_with_fake_dataset(tmp_path, rng):
    """Full driver path with an injected miniature dataset."""
    from midvision_probe_tpu.config import compose

    import render_scannet_correspondence as drv

    class FakeScanNet:
        name = "fake-scannet"

        def __len__(self):
            return 2

        def __getitem__(self, i):
            r = np.random.RandomState(i)
            return {
                "rgb_0": r.randn(64, 64, 3).astype(np.float32),
                "rgb_1": r.randn(64, 64, 3).astype(np.float32),
                "depth_0": (r.rand(64, 64) + 0.5).astype(np.float32),
                "depth_1": (r.rand(64, 64) + 0.5).astype(np.float32),
                "K": np.array([[40.0, 0, 32], [0, 40.0, 32], [0, 0, 1]],
                              np.float32),
                "Rt_0": np.eye(4, dtype=np.float32),
                "Rt_1": np.eye(4, dtype=np.float32),
            }

    cfg = compose(
        "scannet_correspondence",
        ["backbone=test_tiny", "num_corr=20", "batch_pairs=2",
         f"output_dir={tmp_path}"],
    )
    out = drv.run(cfg, dataset=FakeScanNet())
    assert out["err_3d"].shape == (2, 20)
    assert (tmp_path / "scannet_correspondence_final.csv").exists()


def test_navi_driver_with_synthetic_pairs(tmp_path):
    """Full `evaluate_navi_correspondence` driver through the config surface
    (`dataset=synthetic_navi`). The synthetic pairs share appearance but
    carry rotated camera-1 coordinates (xyz_1 = Rt_01 ∘ xyz_0), so a
    deterministic backbone matches pixel i↔i and 3D recall@2cm must be
    ~perfect; the rotation-binned rows must all have mass."""
    from midvision_probe_tpu.config import compose

    import evaluate_navi_correspondence as drv

    cfg = compose(
        "navi_correspondence",
        ["backbone=test_tiny", "dataset=synthetic_navi",
         "dataset.num_instances=8", "num_corr=100", "batch_pairs=4",
         "scale_factor=0.25", f"output_dir={tmp_path}"],
    )
    out = drv.run(cfg)
    assert out["err_3d"].shape == (8, 100)
    rec2cm = (out["err_3d"] < 0.02).mean()
    assert rec2cm > 0.9, f"identity-matchable pairs must recall: {rec2cm}"
    assert (tmp_path / "navi_correspondence_final.csv").exists()


def test_synthetic_scannet_plane_geometry():
    """The plane re-render must be self-consistent: unproject view 1's
    depth, map into camera 0, and the points must land on view 0's depth
    surface (same 3D plane)."""
    from midvision_probe_tpu.datasets.synthetic import SyntheticScanNetPairs

    ds = SyntheticScanNetPairs(num_instances=2, image_hw=(48, 64),
                               max_angle_deg=25.0, t_scale=0.08)
    it = ds[0]
    K, R, t = it["K"], it["Rt_1"][:3, :3], it["Rt_1"][:3, 3]
    h, w = it["depth_0"].shape
    xx, yy = np.meshgrid(np.arange(w) + 0.5, np.arange(h) + 0.5)
    rays = np.stack([xx, yy, np.ones_like(xx)], -1) @ np.linalg.inv(K).T
    X0 = (rays * it["depth_1"][..., None] - t) @ R
    p0 = X0 @ K.T
    u, v = p0[..., 0] / p0[..., 2], p0[..., 1] / p0[..., 2]
    inside = (u > 1) & (u < w - 1) & (v > 1) & (v < h - 1)
    assert inside.mean() > 0.4
    d0 = it["depth_0"][v[inside].astype(int), u[inside].astype(int)]
    assert np.abs(d0 - X0[..., 2][inside]).max() < 0.05


def test_scannet_driver_with_synthetic_pairs(tmp_path):
    """Full `render_scannet_correspondence` driver through the config
    surface (`dataset=synthetic_scannet`). Default identity pairs are
    exactly matchable pixel i↔i, so 3D recall@2cm must be ~perfect."""
    from midvision_probe_tpu.config import compose

    import render_scannet_correspondence as drv

    cfg = compose(
        "scannet_correspondence",
        ["backbone=test_tiny", "dataset=synthetic_scannet",
         "dataset.num_instances=4", "num_corr=100", "batch_pairs=2",
         "scale_factor=0.25", f"output_dir={tmp_path}"],
    )
    out = drv.run(cfg)
    assert out["err_3d"].shape == (4, 100)
    rec2cm = (out["err_3d"] < 0.02).mean()
    assert rec2cm > 0.9, f"identity pairs must recall: {rec2cm}"
    assert (tmp_path / "scannet_correspondence_final.csv").exists()


def test_render_navi_driver_with_synthetic_pairs(tmp_path):
    """render_navi_correspondence e2e: pair renders + per-pair error JSON
    on the synthetic consistent pairs (near-zero error expected)."""
    import glob
    import json

    from midvision_probe_tpu.config import compose

    import render_navi_correspondence as drv

    cfg = compose(
        "navi_correspondence",
        ["backbone=test_tiny", "dataset=synthetic_navi",
         "dataset.num_instances=2", "num_corr=50",
         "scale_factor=0.25", f"output_dir={tmp_path}"],
    )
    out_dir = drv.run(cfg, max_pairs=2)
    pngs = glob.glob(f"{out_dir}/pair_*/matches.png")
    jsons = glob.glob(f"{out_dir}/pair_*/errors.json")
    assert len(pngs) == 2 and len(jsons) == 2
    errs = [json.load(open(p))["err3d_mean"] for p in jsons]
    assert all(e < 0.05 for e in errs), errs


def test_navi_errors_mask_garbage_when_few_valid(rng):
    """Pairs with fewer valid points than num_corr: the static-shape pad
    rows must be flagged invalid (the reference returns only real
    matches), so identity-pair recall over `valid` is still perfect."""
    B, H, W, C = 1, 8, 8, 12
    feats = rng.randn(B, H, W, C).astype(np.float32)
    xyz = rng.rand(B, H, W, 3).astype(np.float32) + 0.5
    xyz[:, 4:, :, 2] = 0.0            # only 32 valid points
    Rt = np.broadcast_to(np.eye(4, dtype=np.float32), (B, 4, 4)).copy()
    K = np.broadcast_to(np.eye(3, dtype=np.float32) * 20, (B, 3, 3)).copy()
    K[:, 2, 2] = 1

    e3, e2, ok = navi_batch_errors(
        jnp.asarray(feats), jnp.asarray(feats), jnp.asarray(xyz),
        jnp.asarray(xyz), jnp.asarray(Rt), jnp.asarray(K),
        num_corr=50, use_pallas=False,
    )
    ok = np.asarray(ok)
    assert ok.sum() == 32              # exactly the real matches
    assert (np.asarray(e3)[ok] < 1e-4).all()

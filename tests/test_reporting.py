"""Artifact-emission tests (reference train_depth.py:174-354,
render_scannet_correspondence.py:51-156 — outputs the repo must reproduce)."""

import json
import os

import numpy as np

from midvision_probe_tpu.utils.reporting import (
    plot_segment_area_vs_d1,
    save_correspondence_json,
    save_images_to_png,
    visualize_and_save_correspondences,
    visualize_depth,
    visualize_depth_navi,
    visualize_snorm,
)


def test_visualize_depth_shapes(rng):
    pred = rng.rand(12, 16).astype(np.float32) * 5
    target = rng.rand(12, 16).astype(np.float32) * 5
    p, t = visualize_depth(pred, target)
    assert p.shape == (12, 16, 3) and t.shape == (12, 16, 3)
    assert p.min() >= 0 and p.max() <= 1

    target[:4] = 0.0  # navi invalid region renders white
    p, t = visualize_depth_navi(pred, target)
    assert (t[:4] == 1.0).all()


def test_visualize_snorm(rng):
    s = rng.randn(8, 8, 3).astype(np.float32)
    s /= np.linalg.norm(s, axis=-1, keepdims=True)
    rgb = visualize_snorm(s)
    assert rgb.shape == (8, 8, 3)
    assert rgb.min() >= 0 and rgb.max() <= 1


def test_save_images_to_png_artifacts(tmp_path, rng):
    B, H, W = 2, 12, 16
    pred = rng.rand(B, H, W, 1).astype(np.float32) * 5 + 0.1
    target = rng.rand(B, H, W, 1).astype(np.float32) * 5 + 0.1
    seg = rng.randint(0, 3, (B, H, W)).astype(np.int32)
    save_images_to_png(pred, target, seg, batch_idx=0, task="depth",
                       save_dir=str(tmp_path))
    for i in range(B):
        assert os.path.exists(tmp_path / f"pred_depth_0_{i}.png")
        assert os.path.exists(tmp_path / f"target_depth_0_{i}.png")
        assert os.path.exists(tmp_path / f"metrics_depth_0_{i}.txt")
        data = json.load(open(tmp_path / f"metrics_depth_0_{i}.json"))
        assert "global_metrics" in data and "d1" in data["global_metrics"]
        assert "Level 5" in data["level_metrics"]


def test_segment_scatter(tmp_path):
    rows = [{"area": float(a), "d1_ratio": 0.5} for a in (10, 100, 1000)]
    path = plot_segment_area_vs_d1(rows, output_dir=str(tmp_path))
    assert path and os.path.exists(path)
    assert plot_segment_area_vs_d1([], output_dir=str(tmp_path)) is None


def test_correspondence_render(tmp_path, rng):
    H, W, N = 24, 32, 20
    img = rng.rand(H, W, 3).astype(np.float32) * 2 - 1  # mean-0.5 scaling
    uv = rng.rand(N, 2).astype(np.float32) * [W, H]
    err = rng.rand(N).astype(np.float32) * 10
    visualize_and_save_correspondences(img, img, uv, uv, err, str(tmp_path),
                                       sparse_n=5)
    assert os.path.exists(tmp_path / "original_views.png")
    assert os.path.exists(tmp_path / "correspondences.png")
    assert os.path.exists(tmp_path / "correspondences_sparse5.png")

    save_correspondence_json(err, err / 100, np.array([42.0]), str(tmp_path))
    data = json.load(open(tmp_path / "correspondence_metrics.json"))
    assert data["relative_angle_deg"] == 42.0
    assert data["2d_error_counts"]["50"] == N

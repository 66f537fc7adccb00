"""Validation artifacts: PNG dumps, per-image metric JSON, wandb image
panels, the segment-area-vs-d1 scatter, and correspondence renders.

Reference analogs (cited per function):
  visualize_depth / visualize_depth_navi  train_depth.py:486-525
  save_images_to_png                      train_depth.py:211-326
  log_first_batch_images                  train_depth.py:174-208
  plot_segment_area_vs_d1                 train_depth.py:329-354
  visualize_and_save_correspondences      render_scannet_correspondence.py:51-129
  save_results_to_json                    render_scannet_correspondence.py:131-156

All functions are host-side numpy/matplotlib (cold path — they run once per
validation); the metric math reuses the jitted pytree metrics.
"""

from __future__ import annotations

import json
import os
import time
from typing import Mapping, Sequence

import numpy as np


def _cmap(name: str):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt.get_cmap(name)


def visualize_depth(pred: np.ndarray, target: np.ndarray,
                    colormap: str = "inferno"):
    """max-normalized colormapped pair (reference ``train_depth.py:486-497``).

    pred/target: (H, W) or (H, W, 1) arrays. Returns two (H, W, 3) floats."""
    cm = _cmap(colormap)
    pred = np.squeeze(np.asarray(pred, np.float32))
    target = np.squeeze(np.asarray(target, np.float32))
    pred_c = cm(pred / max(float(pred.max()), 1e-9))[:, :, :3]
    target_c = cm(target / max(float(target.max()), 1e-9))[:, :, :3]
    return pred_c, target_c


def visualize_depth_navi(pred: np.ndarray, target: np.ndarray,
                         colormap: str = "inferno"):
    """valid-masked min/max normalization, invalid pixels white
    (reference ``train_depth.py:500-525``)."""
    cm = _cmap(colormap)
    pred = np.squeeze(np.asarray(pred, np.float32))
    target = np.squeeze(np.asarray(target, np.float32))
    mask = target != 0.0
    if not mask.any():
        mask = np.ones_like(mask)

    def norm(x):
        lo, hi = float(x[mask].min()), float(x[mask].max())
        c = cm((x - lo) / max(hi - lo, 1e-9))[:, :, :3]
        c[~mask] = 1.0
        return c

    return norm(pred), norm(target)


def _save_png(path: str, rgb01: np.ndarray) -> None:
    from PIL import Image

    Image.fromarray((np.clip(rgb01, 0, 1) * 255).astype(np.uint8)).save(path)


def save_images_to_png(
    pred,
    target,
    segmentation_map,
    batch_idx: int,
    task: str,
    save_dir: str,
    colormap: str = "inferno",
    is_navi: bool = False,
    scale_invariant: bool = False,
    num_levels: int = 5,
) -> None:
    """Per-image colormapped PNGs + instance-level global/centroid-level
    metrics as .txt and .json (reference ``train_depth.py:211-326``)."""
    from midvision_probe_tpu.utils.metrics import evaluate_depth

    os.makedirs(save_dir, exist_ok=True)
    pred = np.asarray(pred)
    target = np.asarray(target)
    seg = None if segmentation_map is None else np.asarray(segmentation_map)

    for i in range(pred.shape[0]):
        g, lv = evaluate_depth(
            pred[i:i + 1], target[i:i + 1],
            None if seg is None else seg[i:i + 1],
            image_average=True, scale_invariant=scale_invariant,
            num_levels=num_levels, is_navi=is_navi,
        )
        data = {
            "global_metrics": {k: float(v) for k, v in g.items()},
            "level_metrics": {
                f"Level {n + 1}": {
                    k: float(v) for k, v in lv[f"level_{n + 1}"].items()
                } for n in range(num_levels)
            },
        }
        stem = f"{task}_{batch_idx}_{i}"
        with open(os.path.join(save_dir, f"metrics_{stem}.json"), "w") as f:
            json.dump(data, f, indent=4)
        with open(os.path.join(save_dir, f"metrics_{stem}.txt"), "w") as f:
            f.write(f"Metrics for image {i} in batch {batch_idx}:\n")
            f.write("Global Metrics:\n")
            for k, v in data["global_metrics"].items():
                f.write(f"{k}: {v:.4f}\n")
            f.write("\nCentroid-Level Metrics:\n")
            for lvl, kv in data["level_metrics"].items():
                f.write(f"{lvl}:\n")
                for k, v in kv.items():
                    f.write(f"  {k}: {v:.4f}\n")

        viz = visualize_depth_navi if is_navi else visualize_depth
        pred_c, target_c = viz(pred[i], target[i], colormap=colormap)
        _save_png(os.path.join(save_dir, f"pred_{stem}.png"), pred_c)
        _save_png(os.path.join(save_dir, f"target_{stem}.png"), target_c)


def visualize_snorm(snorm: np.ndarray) -> np.ndarray:
    """Surface normals as RGB ((n+1)/2, the standard visualization used by
    the reference's snorm wandb panels, ``train_snorm.py``)."""
    s = np.asarray(snorm, np.float32)
    if s.shape[-1] not in (3, 4):  # channel-first input
        s = np.moveaxis(s, 0, -1)
    return (s[..., :3] + 1.0) / 2.0


def log_first_batch_images(
    predict_fn,
    loader,
    wandb,
    save_dir: str | None = None,
    task: str = "depth",
    is_navi: bool = False,
    max_images: int = 8,
) -> None:
    """Colormapped pred/target panels for the first batch, sent to wandb and
    optionally saved (reference ``train_depth.py:174-208``).

    ``predict_fn(batch) -> (B, H, W, C) prediction at target resolution``."""
    batch = next(iter(loader))
    key = "depth" if task == "depth" else "snorm"
    target = np.asarray(batch[key])
    pred = np.asarray(predict_fn(batch))

    pred_imgs, target_imgs = [], []
    for i in range(min(max_images, pred.shape[0])):
        if task == "snorm":
            p, t = visualize_snorm(pred[i]), visualize_snorm(target[i])
        elif is_navi:
            p, t = visualize_depth_navi(pred[i], target[i])
        else:
            p, t = visualize_depth(pred[i], target[i])
        pred_imgs.append(p)
        target_imgs.append(t)
        if save_dir:
            os.makedirs(save_dir, exist_ok=True)
            _save_png(os.path.join(save_dir, f"firstbatch_pred_{i}.png"), p)
            _save_png(os.path.join(save_dir, f"firstbatch_target_{i}.png"), t)

    if getattr(wandb, "run", None) is not None and hasattr(wandb, "Image"):
        wandb.log({
            "predictions": [wandb.Image(p) for p in pred_imgs],
            "targets": [wandb.Image(t) for t in target_imgs],
        })


def plot_segment_area_vs_d1(segment_metrics: Sequence[Mapping],
                            output_dir: str = "plots") -> str | None:
    """Scatter of per-segment area vs d1 over the validation set
    (reference ``train_depth.py:329-354``)."""
    if not segment_metrics:
        return None
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    areas = [e["area"] for e in segment_metrics]
    d1 = [e["d1_ratio"] for e in segment_metrics]
    plt.figure(figsize=(10, 6))
    plt.scatter(areas, d1, alpha=0.6)
    plt.title("Segment Area vs. D1 Accuracy")
    plt.xlabel("Segment Area (pixels)")
    plt.ylabel("D1 Accuracy")
    plt.grid(True)
    os.makedirs(output_dir, exist_ok=True)
    path = os.path.join(
        output_dir,
        f"segment_area_vs_d1_{time.strftime('%Y%m%d-%H%M%S')}.png",
    )
    plt.savefig(path)
    plt.close()
    return path


# --------------------------------------------------------------------------
# correspondence rendering (ScanNet / NAVI qualitative outputs)
# --------------------------------------------------------------------------
def visualize_and_save_correspondences(
    img0: np.ndarray,
    img1: np.ndarray,
    uv0: np.ndarray,
    uv1: np.ndarray,
    err2d: np.ndarray,
    output_dir: str,
    threshold: float = 5.0,
    sparse_n: int = 200,
) -> None:
    """Side-by-side pair renders: original views, all correspondences, and a
    sparse-200 subset; green = inlier (< threshold px), red = outlier
    (reference ``render_scannet_correspondence.py:51-129``).

    ``img0/img1``: (H, W, 3) in [-1, 1] (ScanNet mean-0.5 normalization)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib import patches

    os.makedirs(output_dir, exist_ok=True)
    uv0, uv1 = np.asarray(uv0), np.asarray(uv1)
    err2d = np.asarray(err2d)

    def _pair_fig():
        fig, axs = plt.subplots(1, 2, figsize=(15, 8))
        axs[0].imshow(np.clip((img0 + 1) / 2, 0, 1))
        axs[1].imshow(np.clip((img1 + 1) / 2, 0, 1))
        for ax in axs:
            ax.axis("off")
        plt.subplots_adjust(left=0, right=1, top=1, bottom=0, wspace=0.02)
        return fig, axs

    fig, _ = _pair_fig()
    fig.savefig(os.path.join(output_dir, "original_views.png"),
                bbox_inches="tight", pad_inches=0)
    plt.close(fig)

    for fname, count in (("correspondences.png", uv0.shape[0]),
                         (f"correspondences_sparse{sparse_n}.png",
                          min(sparse_n, uv0.shape[0]))):
        fig, axs = _pair_fig()
        for i in range(count):
            color = "green" if err2d[i] < threshold else "red"
            axs[0].plot(uv0[i, 0], uv0[i, 1], "o", color=color, markersize=5)
            axs[1].plot(uv1[i, 0], uv1[i, 1], "o", color=color, markersize=5)
            con = patches.ConnectionPatch(
                xyA=(uv1[i, 0], uv1[i, 1]), xyB=(uv0[i, 0], uv0[i, 1]),
                coordsA="data", coordsB="data",
                axesA=axs[1], axesB=axs[0], color=color, linewidth=1,
            )
            axs[1].add_artist(con)
        fig.savefig(os.path.join(output_dir, fname),
                    bbox_inches="tight", pad_inches=0)
        plt.close(fig)


def save_correspondence_json(err2d, err3d, rel_ang_deg,
                             output_dir: str) -> None:
    """Per-instance error-count JSON
    (reference ``render_scannet_correspondence.py:131-156``)."""
    os.makedirs(output_dir, exist_ok=True)
    err2d, err3d = np.asarray(err2d), np.asarray(err3d)
    results = {
        "relative_angle_deg": float(np.asarray(rel_ang_deg).reshape(-1)[0]),
        "2d_error_counts": {
            str(t): int((err2d < t).sum()) for t in (1, 2, 5, 15, 25, 35, 50)
        },
        "3d_error_counts": {
            str(t): int((err3d < t).sum())
            for t in (0.01, 0.02, 0.05, 0.1, 0.25, 0.5)
        },
    }
    with open(os.path.join(output_dir, "correspondence_metrics.json"),
              "w") as f:
        json.dump(results, f, indent=4)

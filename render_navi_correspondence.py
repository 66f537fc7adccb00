#!/usr/bin/env python
"""Qualitative NAVI correspondence rendering (reference
``render_navi_correspondence.py``): side-by-side pair images with
error-colored match lines + per-pair JSON error dumps."""

from __future__ import annotations

import json
import os
from datetime import datetime

import numpy as np

from midvision_probe_tpu.config import instantiate, main
from midvision_probe_tpu.datasets import build_loader
from midvision_probe_tpu.evaluators.geometric import navi_batch_errors
from midvision_probe_tpu.evaluators.spair import make_feature_fn
from midvision_probe_tpu.utils.correspondence import estimate_correspondence_xyz
from midvision_probe_tpu.utils.logging import setup_logger


def render_pair(img0, img1, uv0, uv1, err, out_path, max_lines=50):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    H, W = img0.shape[:2]
    canvas = np.concatenate([img0, img1], axis=1)
    canvas = (canvas - canvas.min()) / max(np.ptp(canvas), 1e-6)
    fig, ax = plt.subplots(figsize=(10, 5))
    ax.imshow(canvas)
    order = np.argsort(err)[:max_lines]
    cmap = plt.get_cmap("RdYlGn_r")
    emax = max(float(err.max()), 1e-6)
    for i in order:
        ax.plot([uv0[i, 0], uv1[i, 0] + W], [uv0[i, 1], uv1[i, 1]],
                color=cmap(min(err[i] / emax, 1.0)), linewidth=0.8)
    ax.axis("off")
    fig.savefig(out_path, bbox_inches="tight", dpi=120)
    plt.close(fig)


def run(cfg, max_pairs: int = 8):
    import jax.numpy as jnp

    from midvision_probe_tpu.datasets.transforms import resize_nearest
    from midvision_probe_tpu.utils.transformations import transform_points_Rt

    logger = setup_logger(None, "navi_render")
    model = instantiate(cfg.backbone, output="dense",
                        return_multilayer=cfg.multilayer)
    feature_fn = make_feature_fn(model)
    loader = build_loader(cfg.dataset, "test", 1, 1, pair_dataset=True)

    out_dir = os.path.join(
        cfg.output_dir,
        f"navi_render_{datetime.now().strftime('%Y%m%d_%H%M%S')}",
        model.checkpoint_name,
    )
    os.makedirs(out_dir, exist_ok=True)

    sf = cfg.scale_factor
    for i, batch in enumerate(loader):
        if i >= max_pairs:
            break
        f0 = feature_fn(jnp.asarray(batch["image_0"]))
        f1 = feature_fn(jnp.asarray(batch["image_1"]))
        H = batch["xyz_grid_0"].shape[1]
        hw = (int(H * sf), int(batch["xyz_grid_0"].shape[2] * sf))
        xyz0 = resize_nearest(batch["xyz_grid_0"][0], hw)
        xyz1 = resize_nearest(batch["xyz_grid_1"][0], hw)

        c_xyz0, c_xyz1, w, uv0, uv1 = estimate_correspondence_xyz(
            f0[0], f1[0], jnp.asarray(xyz0), jnp.asarray(xyz1),
            num_corr=cfg.num_corr,
        )
        sel = np.isfinite(np.asarray(w))  # drop static-shape pad rows
        Rt = jnp.asarray(batch["Rt_01"][0, :3, :4])
        err3d = np.asarray(jnp.linalg.norm(
            transform_points_Rt(c_xyz0, Rt) - c_xyz1, axis=-1
        ))[sel]
        uv0 = np.asarray(uv0)[sel] / sf
        uv1 = np.asarray(uv1)[sel] / sf

        pair_dir = os.path.join(out_dir, f"pair_{i}")
        os.makedirs(pair_dir, exist_ok=True)
        if err3d.size:  # err.max() on an empty match set would raise
            render_pair(np.asarray(batch["image_0"][0]),
                        np.asarray(batch["image_1"][0]), uv0, uv1, err3d,
                        os.path.join(pair_dir, "matches.png"))
        # a pair can yield zero finite-weight matches (e.g. fully invalid
        # xyz rows): record 0 matches instead of NaN-ing the mean
        mean_err = float(err3d.mean()) if err3d.size else None
        with open(os.path.join(pair_dir, "errors.json"), "w") as f:
            json.dump({
                "pair_id": str(batch.get("pair_id", [i])[0]),
                "num_matches": int(err3d.size),
                "err3d_mean": mean_err,
                "err3d": err3d.tolist(),
            }, f)
        logger.info("pair %d: %d matches, mean 3D err %s m -> %s", i,
                    err3d.size,
                    "n/a" if mean_err is None else f"{mean_err:.4f}",
                    pair_dir)
    return out_dir


entry = main("navi_correspondence")(run)

if __name__ == "__main__":
    entry()

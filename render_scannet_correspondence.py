#!/usr/bin/env python
"""ScanNet-1500 geometric correspondence evaluation + rendering (reference
``render_scannet_correspondence.py`` — the implementation behind the
README's ``evaluate_scannet_correspondence.py`` name, which does not exist
upstream; SURVEY §3.3).

Metrics: 3D recall @ {0.01..0.5} m, 2D recall @ {1..50} px, rotation-binned
2cm recall; appended to ``scannet_correspondence_final.csv``. Pairs are
batched through a vmapped Pallas-kNN kernel.
"""

from __future__ import annotations

import os
from datetime import datetime

import numpy as np

from midvision_probe_tpu.config import instantiate, main
from midvision_probe_tpu.datasets.builder import Loader
from midvision_probe_tpu.datasets.scannet_pairs import ScanNetPairsDataset
from midvision_probe_tpu.evaluators.geometric import scannet_batch_errors
from midvision_probe_tpu.evaluators.spair import make_feature_fn
from midvision_probe_tpu.parallel import multihost
from midvision_probe_tpu.utils.logging import CSVWriter, setup_logger
from midvision_probe_tpu.utils.metrics import compute_binned_performance
from midvision_probe_tpu.utils.transformations import so3_rotation_angle


def run(cfg, dataset=None):
    import jax
    import jax.numpy as jnp

    from midvision_probe_tpu.datasets.transforms import resize_nearest

    logger = setup_logger(None, "scannet")
    model = instantiate(cfg.backbone, output="dense",
                        return_multilayer=cfg.multilayer)
    feature_fn = make_feature_fn(model)
    if dataset is None:
        if cfg.get("dataset") is not None:
            # config-surface dataset group (dataset=scannet |
            # synthetic_scannet); scannet_root kept for reference-CLI compat
            dataset = instantiate(cfg.dataset)
        else:
            dataset = ScanNetPairsDataset(root=cfg.get("scannet_root",
                                                       "data/scannet_test_1500"))
    # multi-process: each host evaluates its pair shard (wrapped padding
    # rows dropped below); error rows allgather before the recall math and
    # the CSV is rank-0-only, like the NAVI driver. Pair renders stay
    # per-host over the host's own shard (shard-local render_every cadence).
    loader = Loader(dataset, cfg.get("batch_pairs", 4),
                    **multihost.process_shard_args())

    sf = cfg.scale_factor
    render_every = int(cfg.get("render_every", 10))  # ref: i % 10 == 0
    render_dir = os.path.join(
        cfg.output_dir,
        f"scannet_correspondence_{datetime.now().strftime('%Y%m%d_%H%M%S')}",
        str(model.checkpoint_name),
    ) if render_every > 0 else None
    err_3d, err_2d, valid, rel_ang = [], [], [], []
    seen = 0
    for batch in loader:
        keep = np.asarray(batch.pop("_valid",
                                    np.ones(len(batch["rgb_0"]), bool)))
        f0 = feature_fn(jnp.asarray(batch["rgb_0"]))
        f1 = feature_fn(jnp.asarray(batch["rgb_1"]))
        hw = (int(batch["depth_0"].shape[1] * sf),
              int(batch["depth_0"].shape[2] * sf))
        d0 = np.stack([resize_nearest(d[..., None], hw)[..., 0]
                       for d in batch["depth_0"]])
        d1 = np.stack([resize_nearest(d[..., None], hw)[..., 0]
                       for d in batch["depth_1"]])
        K = np.array(batch["K"], np.float32).copy()
        K[:, :2, :] *= sf

        Rt_01 = np.asarray(batch["Rt_1"], np.float32)
        e3, e2, uv0, uv1, ok = scannet_batch_errors(
            f0, f1, jnp.asarray(d0), jnp.asarray(d1), jnp.asarray(K),
            jnp.asarray(Rt_01), num_corr=cfg.num_corr, use_pallas=None,
        )
        e3, e2, ok = np.asarray(e3), np.asarray(e2), np.asarray(ok)
        ang = np.degrees(np.asarray(
            so3_rotation_angle(jnp.asarray(Rt_01[:, :3, :3]))
        ))
        err_3d.append(e3[keep])
        # reference reports 2D error in downscaled-pixel units for recall
        err_2d.append(e2[keep])
        valid.append(ok[keep])
        rel_ang.append(ang[keep])

        # qualitative pair renders, every `render_every`-th instance
        # (reference render_scannet_correspondence.py:224-245)
        if render_dir is not None:
            from midvision_probe_tpu.utils.reporting import (
                save_correspondence_json,
                visualize_and_save_correspondences,
            )

            for j, b in enumerate(np.flatnonzero(keep)):
                idx = seen + j
                if idx % render_every:
                    continue
                inst_dir = os.path.join(render_dir, f"instance_{idx}")
                sel = ok[b]  # render only REAL matches
                visualize_and_save_correspondences(
                    np.asarray(batch["rgb_0"][b]),
                    np.asarray(batch["rgb_1"][b]),
                    np.asarray(uv0[b])[sel] / sf,
                    np.asarray(uv1[b])[sel] / sf,
                    e2[b][sel], inst_dir,
                )
                save_correspondence_json(e2[b][sel], e3[b][sel], ang[b],
                                         inst_dir)
        seen += int(keep.sum())

    gathered = multihost.gather_metrics({
        "err_3d": np.concatenate(err_3d),
        "err_2d": np.concatenate(err_2d),
        "valid": np.concatenate(valid),
        "rel_ang": np.concatenate(rel_ang),
    })
    err_3d, err_2d = gathered["err_3d"], gathered["err_2d"]
    valid = gathered["valid"].astype(bool)
    rel_ang = gathered["rel_ang"]
    # recalls over REAL matches only (see navi_batch_errors docstring)
    n_valid = max(int(valid.sum()), 1)
    nv_pair = np.maximum(valid.sum(axis=1), 1)

    row = {}
    for th in [0.01, 0.02, 0.05, 0.1, 0.2, 0.3, 0.4, 0.5]:
        rec = 100 * float(((err_3d < th) & valid).sum() / n_valid)
        logger.info("Recall at %.2f m: %.2f", th, rec)
        row[f"3D Recall ({th:.2f}m)"] = f"{rec:5.02f}"
    for th in [1, 2, 5, 15, 25, 35, 50]:
        rec = 100 * float(((err_2d < th) & valid).sum() / n_valid)
        logger.info("Recall at %2d px: %.2f", th, rec)
        row[f"2D Recall ({th}px)"] = f"{rec:5.02f}"

    # pairs with NO real matches contribute nothing (see the NAVI driver)
    has_m = valid.any(axis=1)
    rec_2cm = ((err_3d < 0.02) & valid).sum(axis=1) / nv_pair
    bins = compute_binned_performance(rec_2cm[has_m], rel_ang[has_m],
                                      [0, 30, 60, 90, 120])
    for i, acc in enumerate(bins):
        row[f"Bin Rec {i * 30}-{(i + 1) * 30}°"] = f"{acc * 100:5.02f}"

    if jax.process_index() != 0:  # CSV is a rank-0 sink (one row per sweep)
        return {"err_3d": err_3d, "err_2d": err_2d, "row": row}
    os.makedirs(cfg.output_dir, exist_ok=True)
    CSVWriter(os.path.join(cfg.output_dir,
                           "scannet_correspondence_final.csv")).append({
        "Time": datetime.now().strftime("%d%m%Y-%H%M"),
        "Model Checkpoint": model.checkpoint_name,
        "Patch Size": model.patch_size,
        "Layer": str(model.layer),
        "Output": model.output,
        "Num Correspondences": cfg.num_corr,
        "Scale Factor": cfg.scale_factor,
        "Dataset": getattr(dataset, "name", "ScanNet-pairs"),
        **row,
    })
    return {"err_3d": err_3d, "err_2d": err_2d, "row": row}


entry = main("scannet_correspondence")(run)

if __name__ == "__main__":
    entry()

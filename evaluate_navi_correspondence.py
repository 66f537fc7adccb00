#!/usr/bin/env python
"""NAVI geometric correspondence evaluation (reference
``evaluate_navi_correspondence.py``): 3D recall @ {1,2,5} cm, 2D recall @
{5,25,50} px, rotation-binned 2cm-recall over [0,120]°, appended to
``navi_correspondence_final.csv``.

TPU redesign (SURVEY §3.3): feature extraction AND matching are batched —
a vmapped Pallas-kNN kernel per pair batch replaces the per-instance
faiss loop; the 0.25x xyz downscale is kept for protocol parity but is no
longer a memory necessity.
"""

from __future__ import annotations

import os
from datetime import datetime

import numpy as np

from midvision_probe_tpu.config import instantiate, main
from midvision_probe_tpu.datasets import build_loader
from midvision_probe_tpu.evaluators.geometric import navi_batch_errors
from midvision_probe_tpu.evaluators.spair import make_feature_fn
from midvision_probe_tpu.parallel import multihost
from midvision_probe_tpu.utils.logging import CSVWriter, setup_logger
from midvision_probe_tpu.utils.metrics import compute_binned_performance
from midvision_probe_tpu.utils.transformations import so3_rotation_angle


def run(cfg):
    import jax
    import jax.numpy as jnp

    from midvision_probe_tpu.datasets.transforms import resize_nearest

    logger = setup_logger(None, "navi")
    model = instantiate(cfg.backbone, output="dense",
                        return_multilayer=cfg.multilayer)
    feature_fn = make_feature_fn(model)
    # multi-process: each host evaluates its pair shard; the reference runs
    # eval single-GPU unsharded (train_depth.py:559 num_gpus=1), so the
    # cross-host gather below is this rebuild's own semantics — padded
    # wrap rows are dropped per host, error rows allgathered before any
    # recall/binning math, and rows arrive process-major (order-invariant
    # for every emitted statistic)
    loader = build_loader(cfg.dataset, "test", cfg.get("batch_pairs", 4),
                          pair_dataset=True,
                          **multihost.process_shard_args())

    err_3d, err_2d, valid, rel_ang = [], [], [], []
    use_pallas = None  # auto: pallas on TPU
    for batch in loader:
        keep = np.asarray(batch.pop("_valid",
                                    np.ones(len(batch["image_0"]), bool)))
        f0 = feature_fn(jnp.asarray(batch["image_0"]))
        f1 = feature_fn(jnp.asarray(batch["image_1"]))
        sf = cfg.scale_factor
        H = batch["xyz_grid_0"].shape[1]
        hw = (int(H * sf), int(batch["xyz_grid_0"].shape[2] * sf))
        xyz0 = np.stack([resize_nearest(x, hw) for x in batch["xyz_grid_0"]])
        xyz1 = np.stack([resize_nearest(x, hw) for x in batch["xyz_grid_1"]])

        e3, e2, ok = navi_batch_errors(
            f0, f1, jnp.asarray(xyz0), jnp.asarray(xyz1),
            jnp.asarray(batch["Rt_01"]), jnp.asarray(batch["intrinsics_1"]),
            num_corr=cfg.num_corr, use_pallas=use_pallas,
        )
        err_3d.append(np.asarray(e3)[keep])
        err_2d.append(np.asarray(e2)[keep])
        valid.append(np.asarray(ok)[keep])
        rel_ang.append(np.degrees(np.asarray(
            so3_rotation_angle(jnp.asarray(batch["Rt_01"][:, :3, :3]))
        ))[keep])

    gathered = multihost.gather_metrics({
        "err_3d": np.concatenate(err_3d),
        "err_2d": np.concatenate(err_2d),
        "valid": np.concatenate(valid),
        "rel_ang": np.concatenate(rel_ang),
    })
    err_3d, err_2d = gathered["err_3d"], gathered["err_2d"]
    valid = gathered["valid"].astype(bool)
    rel_ang = gathered["rel_ang"]
    # recalls over REAL matches only: pairs with < num_corr valid points
    # pad with garbage rows that the reference never emits (see
    # navi_batch_errors docstring)
    n_valid = max(int(valid.sum()), 1)
    nv_pair = np.maximum(valid.sum(axis=1), 1)

    results = []
    row = {}
    for th in [0.01, 0.02, 0.05]:
        rec = 100 * float(((err_3d < th) & valid).sum() / n_valid)
        logger.info("Recall at %.2f m: %.2f", th, rec)
        results.append(f"{rec:5.02f}")
        row[f"3D Recall ({th:.2f}m)"] = f"{rec:5.02f}"
    for th in [5, 25, 50]:
        rec = 100 * float(((err_2d < th) & valid).sum() / n_valid)
        logger.info("Recall at %3dpx: %.2f", th, rec)
        results.append(f"{rec:5.02f}")
        row[f"2D Recall ({th}px)"] = f"{rec:5.02f}"

    # pairs with NO real matches contribute nothing (consistent with the
    # valid-only global recalls above) instead of deflating their bin as 0%
    has_m = valid.any(axis=1)
    rec_2cm = ((err_3d < 0.02) & valid).sum(axis=1) / nv_pair
    bins = compute_binned_performance(rec_2cm[has_m], rel_ang[has_m],
                                      [0, 30, 60, 90, 120])
    for i, acc in enumerate(bins):
        row[f"Bin Rec {i * 30}-{(i + 1) * 30}°"] = f"{acc * 100:5.02f}"

    if jax.process_index() != 0:  # CSV is a rank-0 sink (one row per sweep)
        return {"err_3d": err_3d, "err_2d": err_2d, "row": row}
    os.makedirs(cfg.output_dir, exist_ok=True)
    CSVWriter(os.path.join(cfg.output_dir, "navi_correspondence_final.csv")
              ).append({
                  "Time": datetime.now().strftime("%d%m%Y-%H%M"),
                  "Model Checkpoint": model.checkpoint_name,
                  "Patch Size": model.patch_size,
                  "Layer": str(model.layer),
                  "Output": model.output,
                  "Num Correspondences": cfg.num_corr,
                  "Scale Factor": cfg.scale_factor,
                  "Dataset": getattr(loader.dataset, "name", "navi"),
                  **row,
              })
    return {"err_3d": err_3d, "err_2d": err_2d, "row": row}


entry = main("navi_correspondence")(run)

if __name__ == "__main__":
    entry()

#!/usr/bin/env python
"""Depth-probe trainer (reference ``train_depth.py``, call stack SURVEY §3.1).

Usage (reference-compatible):
    python train_depth.py backbone=dino_b16 dataset=nyu \
        +backbone.return_multilayer=True

TPU redesign: single-controller JAX over a device mesh replaces
``mp.spawn`` + DDP; the whole hot loop (frozen backbone forward + DPT probe
fwd/bwd + AdamW update) is one jitted SPMD program; validation computes the
full reference metric protocol (scale-aware + scale-invariant, stuff/things,
5 centroid levels, per-segment d1) and appends the same CSV row layout.
"""

from __future__ import annotations

import os

import numpy as np

from midvision_probe_tpu.config import instantiate, main
from midvision_probe_tpu.engine.driver_common import (
    probe_dtype_kwargs,
    build_backbone,
    build_loader,
    cache_shuffle_kwargs,
    emit_csv,
    fit,
    make_trainer,
    setup_experiment,
)
from midvision_probe_tpu.ops.image import resize
from midvision_probe_tpu.utils.losses import depth_loss
from midvision_probe_tpu.utils.metrics import evaluate_depth, segment_metrics_depth


def run(cfg):
    head_type = cfg.probe.get("head_type", "dpt")
    backbone = build_backbone(cfg, needs_multilayer=head_type != "linear")

    # caching fixes batch composition but keeps per-epoch batch-order
    # shuffling (cache_shuffle_kwargs; reference sampler.set_epoch)
    train_loader = build_loader(
        cfg.dataset, "trainval", cfg.batch_size,
        seed=cfg.system.get("random_seed", 8),
        **cache_shuffle_kwargs(cfg),
    )
    test_loader = build_loader(cfg.dataset, "test", cfg.batch_size)
    max_depth = getattr(train_loader.dataset, "max_depth", 10.0)

    probe = instantiate(cfg.probe, feat_dim=backbone.feat_dim,
                        max_depth=max_depth, **probe_dtype_kwargs(cfg))
    exp_name, exp_dir, logger, wandb = setup_experiment(
        cfg, "depth", backbone, probe.name_tag
    )
    logger.info("experiment: %s", exp_name)

    def loss_fn(pred, batch):
        target = batch["depth"]
        pred = resize(pred, target.shape[1:3], mode="bilinear")
        return depth_loss(pred, target, max_depth=max_depth)

    trainer = make_trainer(cfg, backbone, probe, loss_fn, len(train_loader))

    if not cfg.get("is_eval", False):
        fit(cfg, trainer, train_loader, logger, wandb, exp_dir)
    else:
        trainer.init(next(iter(test_loader)))
        from midvision_probe_tpu.engine.checkpoint import restore_checkpoint

        ckpt = cfg.get("ckpt_path", "") or os.path.join(exp_dir, "ckpt")
        restored = restore_checkpoint(ckpt, trainer.state)
        if restored is None:
            raise FileNotFoundError(f"no checkpoint under {ckpt}")
        trainer.set_state(restored[0])

    # ------------------------------------------------------------ validate
    # ONE prediction sweep serves both protocols: evaluate_depth is a pure
    # function of (pred, target), so the scale-aware and scale-invariant
    # metric sets (reference runs validate twice, train_depth.py:664-692)
    # come from the same frozen forward — halves eval wall-clock
    def metric_fn_both(pred, batch):
        target = batch["depth"]
        pred_r = resize(pred, target.shape[1:3], mode="bilinear")
        flat = {}
        for tag, si_flag in (("sa", False), ("si", True)):
            g, lv = evaluate_depth(
                pred_r, target, batch.get("segmentation"),
                scale_invariant=si_flag,
                is_navi="segmentation" not in batch,
            )
            for k, v in g.items():
                flat[f"{tag}__{k}"] = v
            for lk, lvv in lv.items():
                for k, v in lvv.items():
                    flat[f"{tag}__{lk}_{k}"] = v
        return flat

    both = trainer.validate(test_loader, metric_fn_both)
    sa = {k[4:]: v for k, v in both.items() if k.startswith("sa__")}
    si = {k[4:]: v for k, v in both.items() if k.startswith("si__")}
    logger.info(
        "scale-aware  d1 %.4f rmse %.4f | scale-invariant d1 %.4f rmse %.4f",
        sa["d1"].mean(), sa["rmse"].mean(), si["d1"].mean(), si["rmse"].mean(),
    )

    # ---------------------------------------------------------- artifacts
    from midvision_probe_tpu.utils.reporting import (
        log_first_batch_images,
        plot_segment_area_vs_d1,
        save_images_to_png,
    )

    render_images = bool(cfg.get("render_images", True))
    is_navi = getattr(train_loader.dataset, "name", "") .startswith("navi")

    def predict_resized(batch):
        pred = trainer.predict(batch)
        return resize(pred, batch["depth"].shape[1:3], mode="bilinear")

    if render_images:
        # first-batch wandb image panels (reference train_depth.py:174-208)
        log_first_batch_images(
            predict_resized, test_loader, wandb,
            save_dir=os.path.join(exp_dir, "val_images"),
            task="depth", is_navi=is_navi,
        )

    # per-segment d1 over the FULL validation set + first-6-batch PNG/JSON
    # dumps (reference train_depth.py:323-355, 443-459)
    seg_rows = []
    for i, batch in enumerate(test_loader):
        # drop multi-host shard-padding repeats (wrapped duplicates) so
        # per-segment stats count each sample once, like validate()
        valid = np.asarray(batch.pop("_valid", [])).astype(bool)
        has_seg = "segmentation" in batch
        if not has_seg and not (render_images and i < 6):
            break
        pred_r = np.asarray(predict_resized(batch))
        if valid.size:
            batch = {k: (np.asarray(v)[valid] if hasattr(v, "shape") else v)
                     for k, v in batch.items()}
            pred_r = pred_r[valid]
        if has_seg:
            seg_rows += segment_metrics_depth(
                pred_r, batch["depth"], batch["segmentation"]
            )
        if render_images and i < 6:
            save_images_to_png(
                pred_r, batch["depth"], batch.get("segmentation"),
                batch_idx=i, task="depth",
                save_dir=os.path.join(exp_dir, "val_images"),
                is_navi=is_navi,
            )
    # multi-host: assemble the full-dataset rows on every host, write the
    # scatter once (rank 0) — qualitative PNG dumps above stay per-host
    # (each host renders its own shard into the shared exp_dir)
    import jax

    from midvision_probe_tpu.parallel import multihost

    seg_rows = multihost.gather_rows(
        seg_rows, ("segment_id", "image_idx", "area", "d1_ratio"))
    if seg_rows and jax.process_index() == 0:
        plot = plot_segment_area_vs_d1(
            seg_rows, output_dir=os.path.join(exp_dir, "plots"))
        logger.info("segment-area scatter: %s (%d segments)",
                    plot, len(seg_rows))

    row = {}
    row.update({f"sa_{k}": float(np.mean(v)) for k, v in sa.items()})
    row.update({f"si_{k}": float(np.mean(v)) for k, v in si.items()})
    csv_path = os.path.join(
        cfg.get("output_dir", "result"),
        f"depth_results_{getattr(train_loader.dataset, 'name', 'dataset')}_final.csv",
    )
    emit_csv(cfg, csv_path, exp_name, backbone, row)
    wandb.log(row)
    wandb.finish()
    logger.info("results appended to %s", csv_path)
    return row


entry = main("depth_training")(run)

if __name__ == "__main__":
    entry()

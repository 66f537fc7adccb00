#!/usr/bin/env python
"""Surface-normal probe trainer (reference ``train_snorm.py``, structurally
identical to the depth trainer — SURVEY §3.1 note).

Differences from depth, preserved from the reference: bicubic prediction
resize (``train_snorm.py:110``), Bae-et-al. angular loss with optional kappa
uncertainty (``:113``), angular-recall metrics (11.25/22.5/30 degrees).
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
from midvision_probe_tpu.utils.losses import angular_loss
from midvision_probe_tpu.utils.metrics import (
    evaluate_surface_norm,
    segment_metrics_snorm,
)


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

    uncertainty_aware = bool(cfg.probe.get("uncertainty_aware", False))
    probe = instantiate(cfg.probe, feat_dim=backbone.feat_dim,
                        **probe_dtype_kwargs(cfg))
    exp_name, exp_dir, logger, wandb = setup_experiment(
        cfg, "snorm", backbone, probe.name_tag
    )
    logger.info("experiment: %s", exp_name)

    def loss_fn(pred, batch):
        import jax.numpy as jnp

        target = batch["snorm"]
        pred = resize(pred, target.shape[1:3], mode="bicubic")
        mask = jnp.abs(target).sum(axis=-1) > 0
        return angular_loss(pred, target, mask[..., None],
                            uncertainty_aware=uncertainty_aware)

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

    def metric_fn(pred, batch):
        target = batch["snorm"]
        pred_r = resize(pred, target.shape[1:3], mode="bicubic")
        g, lv = evaluate_surface_norm(
            pred_r, target, batch.get("segmentation"),
            is_navi="segmentation" not in batch,
        )
        flat = dict(g)
        for lk, lvv in lv.items():
            for k, v in lvv.items():
                flat[f"{lk}_{k}"] = v
        return flat

    res = trainer.validate(test_loader, metric_fn)
    logger.info(
        "snorm d1 %.4f d2 %.4f d3 %.4f rmse %.2fdeg",
        res["d1"].mean(), res["d2"].mean(), res["d3"].mean(), res["rmse"].mean(),
    )

    # ---------------------------------------------------------- artifacts
    from midvision_probe_tpu.utils.reporting import log_first_batch_images

    def predict_resized(batch):
        pred = trainer.predict(batch)
        return resize(pred, batch["snorm"].shape[1:3], mode="bicubic")

    if bool(cfg.get("render_images", True)):
        # first-batch wandb/normal-map panels (train_depth.py:174-208 analog)
        log_first_batch_images(
            predict_resized, test_loader, wandb,
            save_dir=os.path.join(exp_dir, "val_images"), task="snorm",
        )

    # per-segment stats over the FULL validation set (metrics.py:539-562)
    seg_rows = []
    for batch in test_loader:
        # drop multi-host shard-padding repeats, like validate()
        valid = np.asarray(batch.pop("_valid", [])).astype(bool)
        if "segmentation" not in batch:
            break
        pred_r = np.asarray(predict_resized(batch))
        snorm, seg = batch["snorm"], batch["segmentation"]
        if valid.size:
            pred_r, snorm, seg = (pred_r[valid], np.asarray(snorm)[valid],
                                  np.asarray(seg)[valid])
        seg_rows += segment_metrics_snorm(pred_r, snorm, seg)

    import jax

    from midvision_probe_tpu.parallel import multihost

    seg_rows = multihost.gather_rows(
        seg_rows, ("segment_id", "image_idx", "area", "d1_ratio"))
    if seg_rows and jax.process_index() == 0:
        from midvision_probe_tpu.utils.reporting import plot_segment_area_vs_d1

        plot = plot_segment_area_vs_d1(
            seg_rows, output_dir=os.path.join(exp_dir, "plots"))
        logger.info("segment-area scatter: %s (%d segments)",
                    plot, len(seg_rows))

    row = {k: float(np.mean(v)) for k, v in res.items()}
    csv_path = os.path.join(
        cfg.get("output_dir", "result"),
        f"snorm_results_{getattr(train_loader.dataset, 'name', 'dataset')}_final.csv",
    )
    emit_csv(cfg, csv_path, exp_name, backbone, row)
    wandb.log(row)
    wandb.finish()
    return row


entry = main("snorm_training")(run)

if __name__ == "__main__":
    entry()

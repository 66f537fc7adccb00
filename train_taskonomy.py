#!/usr/bin/env python
"""Taskonomy probe trainer (reference pipeline: taskonomy_training.yaml +
``TaskonomyHead`` + ``MaskedL1Loss`` over HF taskonomy shards; metrics per
task — curvature AbsRel/δ (``metrics.py:580-678``), reshading AbsRel/δ
(``:681-739``), masked L1 otherwise)."""

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
from midvision_probe_tpu.utils.losses import masked_l1_loss
from midvision_probe_tpu.utils.metrics import (
    evaluate_curvature_absrel,
    evaluate_reshading_absrel_and_delta,
)


def run(cfg):
    task = cfg.dataset.get("task", "principal_curvature")
    head_type = cfg.probe.get("head_type", "dpt")
    backbone = build_backbone(cfg, needs_multilayer=head_type != "linear")

    train_loader = build_loader(cfg.dataset, "train", cfg.batch_size,
                                seed=cfg.system.get("random_seed", 8),
                                **cache_shuffle_kwargs(cfg))
    test_loader = build_loader(cfg.dataset, "test", cfg.batch_size)

    example = train_loader.dataset[0]
    out_ch = example["target"].shape[-1]
    probe_kwargs = {"feat_dim": backbone.feat_dim}
    if "output_dim" in cfg.probe:
        probe_kwargs["output_dim"] = out_ch
    probe_kwargs.update(probe_dtype_kwargs(cfg))
    probe = instantiate(cfg.probe, **probe_kwargs)
    tag = getattr(probe, "name_tag", f"taskonomy_{head_type}")
    exp_name, exp_dir, logger, wandb = setup_experiment(
        cfg, f"taskonomy_{task}", backbone, tag
    )
    logger.info("experiment: %s (task %s, %d channels)", exp_name, task, out_ch)

    def loss_fn(pred, batch):
        target = batch["target"]
        pred = resize(pred, target.shape[1:3], mode="bilinear")
        return masked_l1_loss(pred, target, batch["mask_valid"] > 0.5)

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
        target = batch["target"]
        pred_r = resize(pred, target.shape[1:3], mode="bilinear")
        mask = batch["mask_valid"]
        if task in ("principal_curvature", "curvature"):
            return evaluate_curvature_absrel(pred_r, target, mask)
        if task == "reshading":
            return evaluate_reshading_absrel_and_delta(
                pred_r[..., :1], target[..., :1], mask[..., :1]
            )
        import jax.numpy as jnp

        l1 = jnp.abs(pred_r - target).mean(axis=-1)
        m = mask[..., 0]
        return {"masked_l1": (l1 * m).sum(axis=(1, 2))
                / jnp.clip(m.sum(axis=(1, 2)), 1, None)}

    res = trainer.validate(test_loader, metric_fn)
    row = {k: float(np.mean(v)) for k, v in res.items()}
    logger.info("taskonomy %s: %s", task,
                {k: round(v, 4) for k, v in row.items()})
    csv_path = os.path.join(cfg.get("output_dir", "result"),
                            f"taskonomy_results_{task}_final.csv")
    emit_csv(cfg, csv_path, exp_name, backbone, row)
    wandb.log(row)
    wandb.finish()
    return row


entry = main("taskonomy_training")(run)

if __name__ == "__main__":
    entry()

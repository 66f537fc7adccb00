#!/usr/bin/env python
"""Generic-objectness probe trainer (reference
``train_generic_objectness.py``): BinaryHead + BCE on VOC binary masks,
F-measure(beta²=0.3)/IoU/Accuracy/CorLoc validation.

Reference behaviors preserved: bilinear prediction resize to mask size
(``:407``), 80/20 random split of trainval when no test split exists
(``:503-512``), 0.5 binarization.
"""

from __future__ import annotations

import os

import numpy as np

from midvision_probe_tpu.config import instantiate, main
from midvision_probe_tpu.datasets.builder import Loader
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
from midvision_probe_tpu.utils.losses import binary_cross_entropy
from midvision_probe_tpu.utils.objectness import evaluate_binary_masks


class _Subset:
    def __init__(self, dataset, indices):
        self.dataset = dataset
        self.indices = indices
        self.name = getattr(dataset, "name", "dataset")

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, i):
        return self.dataset[int(self.indices[i])]


def run(cfg):
    head_type = cfg.probe.get("head_type", "dpt")
    backbone = build_backbone(cfg, needs_multilayer=head_type != "linear")

    # 80/20 random split of trainval (reference :503-512, generator seed 42)
    full = build_loader(cfg.dataset, "trainval", cfg.batch_size)
    n = len(full.dataset)
    rng = np.random.RandomState(42)
    perm = rng.permutation(n)
    n_train = int(0.8 * n)
    train_ds = _Subset(full.dataset, perm[:n_train])
    val_ds = _Subset(full.dataset, perm[n_train:])
    # caching fixes batch composition but keeps per-epoch batch-order
    # shuffling, like the other trainers (cache_shuffle_kwargs); the
    # random-split Subsets can't route through driver_common.build_loader,
    # so apply this host's shard args directly (multi-host lockstep)
    from midvision_probe_tpu.parallel import multihost

    shard = multihost.process_shard_args()
    train_loader = Loader(train_ds, cfg.batch_size, drop_last=True,
                          seed=cfg.system.get("random_seed", 8),
                          **shard,
                          **(cache_shuffle_kwargs(cfg) or {"shuffle": True}))
    val_loader = Loader(val_ds, cfg.batch_size, **shard)

    probe = instantiate(cfg.probe, feat_dim=backbone.feat_dim,
                        **probe_dtype_kwargs(cfg))
    exp_name, exp_dir, logger, wandb = setup_experiment(
        cfg, "objectness", backbone, f"binary_{head_type}"
    )
    logger.info("experiment: %s (train %d / val %d)", exp_name, n_train,
                n - n_train)

    def loss_fn(pred, batch):
        target = batch["mask"]
        pred = resize(pred, target.shape[1:3], mode="bilinear")
        return binary_cross_entropy(pred, target)

    trainer = make_trainer(cfg, backbone, probe, loss_fn, len(train_loader))
    if not cfg.get("is_eval", False):
        fit(cfg, trainer, train_loader, logger, wandb, exp_dir)
    else:
        trainer.init(next(iter(val_loader)))
        from midvision_probe_tpu.engine.checkpoint import restore_checkpoint

        ckpt = cfg.get("ckpt_path", "") or os.path.join(exp_dir, "ckpt")
        restored = restore_checkpoint(ckpt, trainer.state)
        if restored is None:
            raise FileNotFoundError(f"no checkpoint under {ckpt}")
        trainer.set_state(restored[0])

    # ------------------------------------------------------------ validate
    # per-SAMPLE rows, allgathered across hosts before the mean: every
    # process sees only its val_loader shard, so batch-mean aggregation
    # here would report partial-dataset metrics multi-process (and weight
    # a short final batch equally). gather_rows is the identity when
    # single-process.
    metric_keys = ("F-measure", "IoU", "Accuracy", "CorLoc")
    rows = []
    for batch in val_loader:
        valid = np.asarray(batch.pop("_valid", [])).astype(bool)
        pred = trainer.predict(batch)
        pred_r = np.asarray(
            resize(pred, batch["mask"].shape[1:3], mode="bilinear"))
        mask = np.asarray(batch["mask"])
        if valid.size:  # drop multi-host shard-padding repeats
            pred_r, mask = pred_r[valid], mask[valid]
            if not len(mask):
                continue
        m = evaluate_binary_masks(pred_r, mask, reduce=False)
        rows.extend(
            {k: m[k][j] for k in metric_keys}
            for j in range(len(m["F-measure"]))
        )
    rows = multihost.gather_rows(rows, metric_keys)
    row = {k: float(np.mean([r[k] for r in rows])) for k in metric_keys}
    logger.info("objectness F %.4f IoU %.4f Acc %.4f CorLoc %.4f",
                row["F-measure"], row["IoU"], row["Accuracy"], row["CorLoc"])

    csv_path = os.path.join(
        cfg.get("output_dir", "result"),
        f"final_results_summary_{getattr(full.dataset, 'name', 'voc')}.csv",
    )
    emit_csv(cfg, csv_path, exp_name, backbone, row)
    wandb.log(row)
    wandb.finish()
    return row


entry = main("objectness_train")(run)

if __name__ == "__main__":
    entry()

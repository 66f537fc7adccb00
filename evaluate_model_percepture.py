#!/usr/bin/env python
"""2AFC perceptual-similarity evaluation (reference
``evaluate_model_percepture.py``): choose whichever of (left, right) is
closer to the reference image in cosine feature similarity (ViT: cls token;
CNN: global-average-pooled last stage, ``:105-120``), score against the
human vote with accuracy/F1/precision/recall.

The triplet forward is one jitted call over stacked (3B) images.
"""

from __future__ import annotations

import os
from datetime import datetime

import numpy as np

from midvision_probe_tpu.config import instantiate, main
from midvision_probe_tpu.datasets import build_loader
from midvision_probe_tpu.utils.logging import CSVWriter, setup_logger


def compute_metrics(gt, pred):
    """sklearn-equivalent binary metrics (``:51-64``)."""
    gt = np.asarray(gt).astype(int)
    pred = np.asarray(pred).astype(int)
    tp = int(((pred == 1) & (gt == 1)).sum())
    fp = int(((pred == 1) & (gt == 0)).sum())
    fn = int(((pred == 0) & (gt == 1)).sum())
    accuracy = float((pred == gt).mean()) if len(gt) else 0.0
    precision = tp / (tp + fp) if (tp + fp) else 0.0
    recall = tp / (tp + fn) if (tp + fn) else 0.0
    f1 = (2 * precision * recall / (precision + recall)
          if (precision + recall) else 0.0)
    return {"accuracy": accuracy, "f1_score": f1, "precision": precision,
            "recall": recall}


def choose_2afc(ref, left, right):
    """2AFC cosine choice rule (``:121-131``): 0 if ref is closer to left.

    torch's ``cosine_similarity`` eps=1e-8 denominator clamp is mirrored.
    Module-level so the oracle test exercises the production rule directly.
    """
    import jax.numpy as jnp

    def cos(a, c):
        num = jnp.sum(a * c, axis=-1)
        den = jnp.linalg.norm(a, axis=-1) * jnp.linalg.norm(c, axis=-1)
        return num / jnp.clip(den, 1e-8, None)

    sim_l = cos(ref, left)
    sim_r = cos(ref, right)
    return np.where(np.asarray(sim_l) > np.asarray(sim_r), 0, 1)


def run(cfg, dataset=None):
    import jax
    import jax.numpy as jnp

    logger = setup_logger(None, "percepture")
    model = instantiate(cfg.backbone, return_cls=True)
    is_vit = model.arch == "vit"

    @jax.jit
    def _embed(variables, images):
        maps, cls_tokens = model._apply_fn(variables, images)
        if is_vit and cls_tokens is not None and cls_tokens[-1] is not None:
            return cls_tokens[-1].astype(jnp.float32)
        # CNN: GAP over the last dense map (:112-114)
        return maps[-1].mean(axis=(1, 2)).astype(jnp.float32)

    # weights as jit arguments (closures inline them into the compile RPC)
    embed = lambda images: _embed(model.device_variables, images)  # noqa: E731

    # multi-process: each host scores its triplet shard; (gt, pred) rows
    # allgather before compute_metrics so every rank reports full-dataset
    # numbers, with wrapped shard-padding rows dropped (same contract as
    # the NAVI/ScanNet drivers)
    from midvision_probe_tpu.parallel import multihost

    shard = multihost.process_shard_args()
    if dataset is not None:
        from midvision_probe_tpu.datasets.builder import Loader

        loader = Loader(dataset, cfg.batch_size, **shard)
    else:
        loader = build_loader(cfg.dataset, cfg.get("split", "test"),
                              cfg.batch_size, **shard)

    gts, preds = [], []
    for batch in loader:
        keep = np.asarray(batch.pop("_valid",
                                    np.ones(len(batch["p"]), bool)))
        imgs = np.concatenate(
            [batch["img_ref"], batch["img_left"], batch["img_right"]], axis=0
        )
        feats = embed(jnp.asarray(imgs))
        b = batch["img_ref"].shape[0]
        ref, left, right = feats[:b], feats[b:2 * b], feats[2 * b:]
        pred = choose_2afc(ref, left, right)
        gts.extend(np.asarray(batch["p"])[keep].tolist())
        preds.extend(np.asarray(pred)[keep].tolist())

    gathered = multihost.gather_metrics({
        "gt": np.asarray(gts, np.float64),
        "pred": np.asarray(preds, np.float64),
    })
    metrics = compute_metrics(gathered["gt"].tolist(),
                              gathered["pred"].tolist())
    logger.info("2AFC acc %.4f f1 %.4f p %.4f r %.4f", metrics["accuracy"],
                metrics["f1_score"], metrics["precision"], metrics["recall"])

    if jax.process_index() != 0:  # CSV is a rank-0 sink (one row per sweep)
        return metrics
    os.makedirs(cfg.output_dir, exist_ok=True)
    CSVWriter(os.path.join(cfg.output_dir, "final_results_summary.csv")
              ).append({
                  "Time": datetime.now().strftime("%d%m%Y-%H%M"),
                  "Model Checkpoint": model.checkpoint_name,
                  "Layer": str(model.layer),
                  "Output": model.output,
                  "Dataset": getattr(loader.dataset, "name", "nights_2afc"),
                  **{k: f"{v:.4f}" for k, v in metrics.items()},
              })
    return metrics


entry = main("model_percepture")(run)

if __name__ == "__main__":
    entry()

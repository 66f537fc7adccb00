"""Shared driver plumbing for the probe trainers.

The reference's three trainers duplicate ~800 LoC of setup/validate/CSV each
(``train_depth.py``, ``train_snorm.py``, ``train_generic_objectness.py``);
everything shareable lives here.
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np

from midvision_probe_tpu.config import Config, instantiate
from midvision_probe_tpu.datasets import build_loader as _build_loader
from midvision_probe_tpu.engine.probe_fit import ProbeTrainer
from midvision_probe_tpu.parallel import multihost
from midvision_probe_tpu.utils.logging import CSVWriter, maybe_wandb, setup_logger


def build_loader(dataset_cfg, split, batch_size, num_shards=None,
                 shard_index=None, **kwargs):
    """Dataset loader with this host's data shard applied (multi-host:
    SURVEY §2.6 — DistributedSampler → per-process shard slice).

    Mirrors ``datasets.build_loader``'s leading parameters explicitly so
    positional ``num_shards``/``shard_index`` (the underlying 4th/5th
    params) don't collide with the injected keywords (a ``*args``-only
    wrapper raised TypeError 'multiple values for argument' on such
    calls)."""
    multihost.initialize()
    if num_shards is None:
        shard = multihost.process_shard_args()
        num_shards = shard["num_shards"]
        shard_index = shard["shard_index"]
    # an explicit num_shards without a shard_index would reach the Loader
    # as shard_index=None (the Loader raises; fail here with the clearer
    # caller-facing message)
    if num_shards is not None and num_shards > 1 and shard_index is None:
        raise ValueError("pass shard_index together with num_shards")
    if shard_index is None:
        shard_index = 0
    return _build_loader(dataset_cfg, split, batch_size,
                         num_shards=num_shards, shard_index=shard_index,
                         **kwargs)


def cache_shuffle_kwargs(cfg: Config) -> dict:
    """Loader kwargs reconciling feature caching with the reference's
    per-epoch reshuffling (``sampler.set_epoch``, ``train_depth.py:94-95``).

    Caching keys features by batch, so batch COMPOSITION must stay fixed
    across epochs — but batch ORDER need not: an epoch-seeded permutation of
    the batch sequence restores most of the protocol's stochasticity at zero
    recompute cost. Without caching, full sample-level shuffling applies."""
    if cfg.get_path("system.cache_features", False):
        return {"shuffle": False, "shuffle_batch_order": True}
    return {}


def build_backbone(cfg: Config, needs_multilayer: bool):
    """Instantiate the backbone; DPT/multiscale heads need 4 taps — mirror
    the reference README's ``+backbone.return_multilayer=True`` convention
    but default it on when the probe requires it. ``system.backbone_dtype``
    selects the frozen forward's compute dtype (bfloat16 = MXU-native)."""
    kwargs = {}
    if needs_multilayer and not cfg.backbone.get("return_multilayer", False):
        kwargs["return_multilayer"] = True
    dtype_name = cfg.get_path("system.backbone_dtype", None)
    if dtype_name:
        import jax.numpy as jnp

        kwargs["dtype"] = getattr(jnp, dtype_name)
    return instantiate(cfg.backbone, **kwargs)


def probe_dtype_kwargs(cfg: Config) -> dict:
    """``system.probe_dtype`` selects the probe's compute dtype (params stay
    f32 — flax mixed precision). bfloat16 roughly halves the DPT train step,
    which dominates suite wall-clock (launch_script/time_suite.py)."""
    name = cfg.get_path("system.probe_dtype", None)
    if not name:
        return {}
    import jax.numpy as jnp

    return {"dtype": getattr(jnp, name)}


def experiment_name(cfg: Config, task: str, backbone, probe_tag: str) -> str:
    """Reference-style experiment naming (``train_depth.py:575-600``)."""
    train_info = (
        f"{cfg.optimizer.n_epochs}ep_bs{cfg.batch_size}_lr{cfg.probe_lr}"
    )
    note = cfg.get("note", "")
    parts = [task, backbone.checkpoint_name, f"layer-{backbone.layer}",
             backbone.output, probe_tag, train_info]
    if note:
        parts.append(note)
    return "_".join(str(p) for p in parts)


def setup_experiment(cfg: Config, task: str, backbone, probe_tag: str):
    import jax

    exp_name = experiment_name(cfg, task, backbone, probe_tag)
    exp_dir = os.path.join(cfg.get("output_dir", "result"), exp_name)
    os.makedirs(exp_dir, exist_ok=True)
    logger = setup_logger(exp_dir)
    # wandb on rank 0 only (reference: train_depth.py:547-554); other
    # hosts get the no-op stub
    wandb = maybe_wandb(cfg) if jax.process_index() == 0 else maybe_wandb(
        None)
    return exp_name, exp_dir, logger, wandb


def make_trainer(cfg: Config, backbone, probe, loss_fn, steps_per_epoch: int):
    n_epochs = cfg.optimizer.n_epochs
    warmup = cfg.optimizer.warmup_epochs
    return ProbeTrainer(
        backbone=backbone,
        probe=probe,
        loss_fn=loss_fn,
        probe_lr=cfg.probe_lr,
        n_steps=max(int(n_epochs * steps_per_epoch), 1),
        warmup_steps=max(warmup * steps_per_epoch, 1e-6),
        add_norm=bool(cfg.backbone.get("add_norm", False)),
        num_devices=cfg.system.get("num_devices", -1),
        seed=cfg.system.get("random_seed", 8),
        cache_features=bool(cfg.get_path("system.cache_features", False)),
    )


def fit(cfg: Config, trainer: ProbeTrainer, train_loader, logger, wandb,
        exp_dir: str, resume: bool = True):
    """Epoch loop with per-epoch orbax checkpointing and exact resume."""
    from midvision_probe_tpu.engine.checkpoint import (
        restore_checkpoint,
        save_checkpoint,
    )

    first = next(iter(train_loader))
    trainer.init(first)

    ckpt_dir = os.path.join(exp_dir, "ckpt")
    start_ep = 0
    if resume:
        restored = restore_checkpoint(ckpt_dir, trainer.state)
        if restored is not None:
            state, start_ep = restored
            trainer.set_state(state)
            logger.info("resumed from epoch %d", start_ep)

    n_epochs = int(cfg.optimizer.n_epochs)
    for ep in range(start_ep, n_epochs):
        train_loader.set_epoch(ep)
        loss = trainer.train_epoch(train_loader, logger=logger, wandb=wandb)
        logger.info("epoch %d/%d | train loss %.4f", ep + 1, n_epochs, loss)
        save_checkpoint(ckpt_dir, trainer.state, ep + 1)
    return trainer


def flatten_metrics(global_metrics: dict, by_level: dict, prefix: str = ""
                    ) -> dict:
    row: dict[str, Any] = {}
    for k, v in global_metrics.items():
        row[f"{prefix}{k}"] = float(np.mean(v))
    for lk, lv in by_level.items():
        for k, v in lv.items():
            row[f"{prefix}{lk}_{k}"] = float(np.mean(v))
    return row


def emit_csv(cfg: Config, path: str, exp_name: str, backbone, row: dict):
    import jax

    meta = {
        "exp_name": exp_name,
        "checkpoint": backbone.checkpoint_name,
        "layer": backbone.layer,
        "output": backbone.output,
        "n_epochs": cfg.optimizer.n_epochs,
        "batch_size": cfg.batch_size,
        "probe_lr": cfg.probe_lr,
        "note": cfg.get("note", ""),
    }
    meta.update(row)
    # one CSV row per experiment: rank 0 writes (every host computes the
    # same global metrics via gather_metrics; reference: rank-0-only CSV,
    # train_depth.py:806-829)
    if jax.process_index() == 0:
        CSVWriter(path).append(meta)
    return meta


__all__ = [
    "build_backbone", "build_loader", "cache_shuffle_kwargs",
    "experiment_name", "setup_experiment",
    "make_trainer", "fit", "flatten_metrics", "emit_csv",
]

"""The shared probe-training engine — one jitted SPMD step for every task.

TPU-first redesign of the reference hot loop (``train_depth.py:93-153``):

* frozen backbone forward, tap-norms, probe forward, loss, backward and
  optimizer update compile into ONE XLA program — no Python between the
  feature extraction and the probe step, no host round-trips;
* the batch is sharded over the mesh's ``data`` axis, params are replicated;
  XLA inserts the gradient all-reduce over ICI (the reference needed DDP +
  NCCL + ``find_unused_parameters=True`` for this, ``train_depth.py:619-622``);
* backbone compute can run in bfloat16 (MXU-native) while probe params and
  the optimizer stay float32.

The reference's ``detach_model`` / ``torch.no_grad`` around the backbone
(``train_depth.py:104-110``) becomes ``jax.lax.stop_gradient`` on the tapped
features; ``model_lr`` is frozen at 0 in every reference config, so backbone
finetuning is intentionally out of scope (matching actual reference usage).
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from midvision_probe_tpu.models.feature_extractor import FeatureExtractor
from midvision_probe_tpu.models.probes import TapNorms
from midvision_probe_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from midvision_probe_tpu.utils.optim import (
    cosine_decay_linear_warmup,
    make_adamw,
)


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


@dataclasses.dataclass
class ProbeTrainer:
    """Train a probe (plus optional tap-norms) on frozen features.

    Args:
        backbone: frozen FeatureExtractor.
        probe: flax module taking the list of feature maps.
        loss_fn: ``(pred, batch) -> scalar`` (NHWC pred at probe resolution;
            resize-to-target happens inside the task's loss adapter).
        probe_lr / n_steps / warmup_steps: reference optimizer recipe
            (AdamW + cosine-with-warmup, ``train_depth.py:624-641``).
        add_norm: train per-tap BatchNorms (reference ``add_norm`` flag).
        (BatchNorm probes — BinaryHead/TaskonomyHead — are auto-detected
        from the presence of ``batch_stats`` at init.)
    """

    backbone: FeatureExtractor
    probe: Any
    loss_fn: Callable[[jnp.ndarray, dict], jnp.ndarray]
    probe_lr: float = 5e-4
    n_steps: int = 1000
    warmup_steps: float = 150.0
    add_norm: bool = False
    num_devices: int = -1
    seed: int = 8
    # Cache frozen features across epochs (requires a deterministic loader:
    # shuffle off, augment off): extraction runs once, later epochs train the
    # probe alone (the reference hot loop re-extracts every epoch,
    # train_depth.py:104-110). Two tiers, both bfloat16: features stay
    # ON-DEVICE under an HBM budget ($MVP_FEATURE_CACHE_DEVICE_GB, default
    # 4 GiB) — a cache hit then feeds the jitted step resident arrays with
    # zero host traffic (through the axon tunnel a host-tier hit costs
    # ~170 MB/step of re-upload, slower than recomputing) — and spill
    # host-side under a RAM budget ($MVP_FEATURE_CACHE_GB, default 8 GiB).
    # Batches past both budgets simply recompute, so memory stays bounded
    # at any dataset scale (full NYU would need ~350 GB raw).
    cache_features: bool = False

    def __post_init__(self):
        self.mesh = make_mesh(self.num_devices)
        self._feature_cache: dict[int, list] = {}
        self._cache_bytes = 0
        self._cache_budget = int(float(os.environ.get(
            "MVP_FEATURE_CACHE_GB", "8")) * 1024**3)
        self._dev_cache_bytes = 0
        self._dev_cache_budget = int(float(os.environ.get(
            "MVP_FEATURE_CACHE_DEVICE_GB", "4")) * 1024**3)
        self._cache_full_warned = False
        self._extract_jit = None
        self.tap_norms = (
            TapNorms(num_taps=len(self.backbone.multilayers))
            if self.add_norm
            else None
        )
        schedule = cosine_decay_linear_warmup(
            self.probe_lr, self.n_steps, self.warmup_steps
        )
        # make_adamw pins torch.optim.AdamW's defaults (weight_decay 0.01
        # — raw optax.adamw would silently train with 1e-4, a 100x
        # regularization gap vs the reference trainers)
        self.tx = make_adamw(schedule)
        self._train_step = None
        self._eval_step = None
        self._bb_vars = None
        self.state: TrainState | None = None

    @property
    def bb_vars(self):
        """Backbone variables replicated on THIS trainer's mesh (cached).

        ``backbone.device_variables`` is a bare ``device_put`` (single
        default device). On a multi-device mesh, feeding that to the jitted
        step would re-broadcast the full frozen tree (ViT-L ≈ 1.2 GB) from
        device 0 on EVERY call — jit does not memoize input transfers.
        Replicating once here makes the per-step input a no-op reshard."""
        if self._bb_vars is None:
            self._bb_vars = replicate(
                self.backbone.device_variables, self.mesh)
        return self._bb_vars

    # ---------------------------------------------------------------- init
    def init(self, example_batch: dict) -> TrainState:
        rng = jax.random.PRNGKey(self.seed)
        images = jnp.asarray(example_batch["image"][:1])
        feats = self.backbone.features(images)

        params = {}
        batch_stats = {}
        if self.tap_norms is not None:
            v = self.tap_norms.init(rng, feats, train=True)
            params["tap"] = v["params"]
            batch_stats["tap"] = v.get("batch_stats", {})
            feats = self.tap_norms.apply(v, feats, train=False)

        v = self.probe.init(rng, feats)
        params["probe"] = v["params"]
        batch_stats["probe"] = v.get("batch_stats", {})

        opt_state = self.tx.init(params)
        state = TrainState(params, batch_stats, opt_state, jnp.zeros((), jnp.int32))
        self.state = replicate(state, self.mesh)
        return self.state

    def set_state(self, state: TrainState) -> TrainState:
        """Install a (restored) state, mesh-replicated. Checkpoint restore
        returns host-numpy leaves; feeding them to the jitted step raw
        makes donate_argnums a no-op and retraces the step a second time
        once the output's committed shardings come back around."""
        self.state = replicate(TrainState(*state), self.mesh)
        return self.state

    # ------------------------------------------------------------- forward
    def _forward(self, params, batch_stats, images, train: bool,
                 feats=None, bb_vars=None):
        if feats is None:
            # backbone weights must arrive as a traced jit argument (closures
            # inline them into the serialized HLO — the axon tunnel rejects
            # such compile RPCs with HTTP 413 for ViT-B-sized trees), so a
            # trace-time fallback to self.backbone.device_variables would
            # silently reintroduce the inlining; refuse instead
            if bb_vars is None:
                raise ValueError(
                    "_forward needs bb_vars (as a traced argument) when "
                    "feats is None — closure-capturing the backbone weights "
                    "inlines them into the HLO"
                )
            feats = self.backbone._apply_fn(bb_vars, images)[0]
        feats = [jax.lax.stop_gradient(f) for f in feats]
        new_stats = dict(batch_stats)
        if self.tap_norms is not None:
            vars_in = {"params": params["tap"],
                       "batch_stats": batch_stats.get("tap", {})}
            if train:
                feats, upd = self.tap_norms.apply(
                    vars_in, feats, train=True, mutable=["batch_stats"]
                )
                new_stats["tap"] = upd["batch_stats"]
            else:
                feats = self.tap_norms.apply(vars_in, feats, train=False)

        vars_in = {"params": params["probe"]}
        has_bn = bool(batch_stats.get("probe"))
        if has_bn:
            vars_in["batch_stats"] = batch_stats["probe"]
        kwargs = {}
        if has_bn:
            kwargs["train"] = train
        if train and has_bn:
            pred, upd = self.probe.apply(
                vars_in, feats, mutable=["batch_stats"], **kwargs
            )
            new_stats["probe"] = upd["batch_stats"]
        else:
            pred = self.probe.apply(vars_in, feats, **kwargs)
        return pred, new_stats

    # ---------------------------------------------------------------- step
    def _make_train_step(self, cached: bool):
        def step(state: TrainState, batch: dict, n_valid,
                 feats=None, bb_vars=None):
            def loss_wrt(params):
                pred, new_stats = self._forward(
                    params, state.batch_stats, batch.get("image"),
                    train=True, feats=feats, bb_vars=bb_vars,
                )
                if n_valid is not None:
                    # ``_pad`` repeats leading rows so shards divide evenly;
                    # slice predictions and targets back to the true batch
                    # before the loss so every real sample's gradient is
                    # weighted exactly once — the reference's partial-final-
                    # batch semantics. n_valid is static (at most one extra
                    # compile per epoch, for the final partial batch).
                    pred_v = pred[:n_valid]
                    batch_v = {
                        k: v[:n_valid] if hasattr(v, "ndim") and v.ndim else v
                        for k, v in batch.items()
                    }
                    return self.loss_fn(pred_v, batch_v), new_stats
                return self.loss_fn(pred, batch), new_stats

            (loss, new_stats), grads = jax.value_and_grad(
                loss_wrt, has_aux=True
            )(state.params)
            updates, opt_state = self.tx.update(
                grads, state.opt_state, state.params
            )
            params = optax.apply_updates(state.params, updates)
            return (
                TrainState(params, new_stats, opt_state, state.step + 1),
                loss,
            )

        if cached:
            return jax.jit(lambda s, b, n, f: step(s, b, n, feats=f),
                           static_argnums=(2,), donate_argnums=(0,))
        return jax.jit(lambda s, b, n, v: step(s, b, n, bb_vars=v),
                       static_argnums=(2,), donate_argnums=(0,))

    def _extract(self, images):
        if self._extract_jit is None:
            self._extract_jit = jax.jit(
                lambda v, im: [
                    f.astype(jnp.bfloat16)
                    for f in self.backbone._apply_fn(v, im)[0]
                ]
            )
        return self._extract_jit(self.bb_vars, images)

    def train_epoch(self, loader, log_every: int = 50, logger=None,
                    wandb=None) -> float:
        if self._train_step is None:
            self._train_step = self._make_train_step(self.cache_features)
        if self.cache_features and getattr(loader, "shuffle", False):
            raise ValueError(
                "cache_features requires fixed batch composition "
                "(shuffle=False); sample-level reshuffling would serve "
                "stale features. Use shuffle_batch_order=True for "
                "epoch-seeded batch-ORDER permutation, which is "
                "cache-compatible."
            )
        losses = []
        t0 = time.time()
        for i, batch in enumerate(loader):
            # stable batch identity for the feature cache: with
            # shuffle_batch_order the loader permutes arrival order per
            # epoch, so the enumeration index no longer identifies the
            # batch's composition
            bid = batch.pop("_batch_id", i)
            cached = (self._feature_cache.get(bid)
                      if self.cache_features else None)
            if isinstance(cached, tuple):
                # device-tier hit: features AND the sharded target batch
                # are already resident, so the step runs with ZERO host
                # traffic — decisive through the axon tunnel, where
                # re-uploading a host-cached batch every step is slower
                # than recomputing the extraction
                feats, batch, n_valid = cached
                self.state, loss = self._train_step(
                    self.state, batch, n_valid, feats)
                losses.append(loss)
                self._log_step(losses, i, t0, log_every, logger, wandb)
                continue
            # multi-host shard padding wraps a few leading samples; TRAIN
            # keeps the reference DistributedSampler's duplicate-sample
            # semantics (total_size=ceil(n/k)*k wrapped repeats), so the
            # mask is only consumed by validate()
            batch.pop("_valid", None)
            batch, n_valid = self._pad(_to_jnp(batch))
            if n_valid is not None and jax.process_count() > 1:
                raise ValueError(
                    "multi-process training needs batches divisible by the "
                    "per-host device count (drop_last train loaders + a "
                    "divisible batch size guarantee this): the exact "
                    "partial-batch slice is prefix-based and the valid "
                    "prefixes of a global batch are scattered per host"
                )
            if self.cache_features:
                # the jitted cached step never reads the image (``feats``
                # short-circuits ``_forward``), so it never moves: on a
                # miss the extraction consumes it, and hits skip the
                # largest host->device transfer in the batch
                # (64x480x640x3 f32 ≈ 225 MB/step) entirely
                image = batch.pop("image")
                batch = shard_batch(batch, self.mesh)
                if cached is None:
                    feats = self._extract(
                        shard_batch({"image": image}, self.mesh)["image"])
                    feat_size = sum(f.size * f.dtype.itemsize for f in feats)
                    # the device tier holds the sharded target batch too;
                    # the host tier stores features ONLY, so its budget is
                    # charged feature bytes alone (charging target bytes it
                    # never stores exhausted the budget ~25% early at 480²
                    # depth and silently re-extracted the tail batches)
                    size = feat_size + sum(
                        v.size * v.dtype.itemsize
                        for v in jax.tree_util.tree_leaves(batch))
                    if self._dev_cache_bytes + size <= self._dev_cache_budget:
                        # device tier: hold the extracted jax.Arrays and
                        # the sharded target batch (both already carrying
                        # the shardings the jitted step expects; the step
                        # only donates the state, never its inputs)
                        self._feature_cache[bid] = (list(feats), batch,
                                                    n_valid)
                        self._dev_cache_bytes += size
                    elif self._cache_bytes + feat_size <= self._cache_budget:
                        # host spill tier (features only). np.asarray keeps
                        # bfloat16 (ml_dtypes) — same dtype on both paths,
                        # so the step never recompiles. Multi-process: each
                        # host caches ITS shard's rows (a global array
                        # can't be fetched whole); the serve path
                        # reassembles via shard_batch ->
                        # make_array_from_process_local_data.
                        self._feature_cache[bid] = [_host_local_rows(f)
                                                    for f in feats]
                        self._cache_bytes += feat_size
                    elif logger and not self._cache_full_warned:
                        self._cache_full_warned = True
                        logger.warning(
                            "feature cache budgets reached (device %.1f "
                            "GiB $MVP_FEATURE_CACHE_DEVICE_GB + host %.1f "
                            "GiB $MVP_FEATURE_CACHE_GB) — later batches "
                            "recompute", self._dev_cache_budget / 1024**3,
                            self._cache_budget / 1024**3)
                else:
                    # host tier: commit hits with the SAME data-axis
                    # sharding the jitted extract produces — a bare
                    # device_put lands on one device and forces a second
                    # train-step executable (plus per-step resharding) on
                    # any multi-device mesh
                    feats = shard_batch(list(cached), self.mesh)
                self.state, loss = self._train_step(
                    self.state, batch, n_valid, feats)
            else:
                batch = shard_batch(batch, self.mesh)
                self.state, loss = self._train_step(
                    self.state, batch, n_valid, self.bb_vars)
            losses.append(loss)
            self._log_step(losses, i, t0, log_every, logger, wandb)
        return float(jnp.mean(jnp.stack(losses))) if losses else float("nan")

    def _log_step(self, losses, i, t0, log_every, logger, wandb) -> None:
        if logger and (i + 1) % log_every == 0:
            lv = float(jnp.mean(jnp.stack(losses[-log_every:])))
            logger.info(
                "step %d | loss %.4f | %.2f it/s",
                int(self.state.step), lv, (i + 1) / (time.time() - t0),
            )
        if wandb:  # stub is falsy: avoid a per-step host fetch
            wandb.log({"loss_batch": float(losses[-1])})

    def _pad(self, batch: dict) -> tuple[dict, int | None]:
        """Pad the batch dim to a multiple of the data-axis size by repeating
        leading rows (SPMD needs divisible shards). Returns ``(batch,
        n_valid)`` where ``n_valid`` is the true pre-pad size, or ``None``
        when nothing was padded; the train step slices predictions and
        targets back to ``n_valid`` before the loss so the cyclic repeats
        never double-weight a sample's gradient (reference partial-batch
        semantics), and ``predict`` slices its output likewise.

        Caveat: per-sample exactness holds for the loss/gradients, but
        train-mode BATCH statistics (BinaryHead/TaskonomyHead BatchNorm,
        add_norm TapNorms) are still computed over the padded rows, so a
        padded step's BN mean/var — and the running stats it saves — see
        the duplicates. In practice padding only triggers when
        ``batch_size % mesh-data-size != 0`` (train loaders drop the last
        partial batch), which no protocol configuration does.

        Multi-process: every host pads ITS equal-length loader shard to the
        per-host row count (data-axis size / process count) — global rows
        = local x processes stay divisible. The prefix-slice exactness
        only holds single-process (the valid prefixes of a global batch
        are scattered per host); train_epoch refuses partial batches in
        multi-process mode instead of silently training on duplicates."""
        n_data = self.mesh.shape["data"] // jax.process_count()
        sizes = {v.shape[0] for v in batch.values()}
        b = max(sizes)
        pad = (-b) % n_data
        if pad == 0:
            return batch, None
        idx = np.resize(np.arange(b), b + pad)  # cyclic repeat
        return {
            k: np.asarray(v)[idx] if hasattr(v, "shape") else v
            for k, v in batch.items()
        }, b

    # ----------------------------------------------------------- inference
    def predict(self, batch: dict) -> jnp.ndarray:
        if self._eval_step is None:

            def step(params, batch_stats, images, bb_vars):
                pred, _ = self._forward(params, batch_stats, images,
                                        train=False, bb_vars=bb_vars)
                return pred

            self._eval_step = jax.jit(step)
        batch = _to_jnp(batch)
        # shard-padding metadata, not a model input (callers outside
        # validate() may hand loader batches straight in)
        batch.pop("_valid", None)
        b = batch["image"].shape[0]
        batch, _ = self._pad(batch)
        batch = shard_batch(batch, self.mesh)
        pred = self._eval_step(
            self.state.params, self.state.batch_stats, batch["image"],
            self.bb_vars,
        )
        if jax.process_count() > 1:
            # the global pred is not fully addressable here: reassemble
            # THIS host's rows (its devices hold exactly its loader shard)
            pred = _host_local_rows(pred)
        return pred[:b]

    def validate(self, loader, metric_fn, max_batches: int | None = None):
        """Run ``metric_fn(pred, batch) -> dict of (B,) arrays`` over the
        loader and return concatenated numpy metrics.

        Rows the loader marks as shard-padding duplicates (``_valid`` —
        wrapped repeats that equalize multi-host shard lengths) are dropped
        so eval metrics match the reference's UNSHARDED test loader
        (``train_depth.py:559``) instead of double-counting samples.

        Multi-process: each host iterates its own loader shard (equal batch
        counts, so the jitted eval steps stay lockstep), then the per-host
        arrays are allgathered — every host returns FULL-dataset metrics,
        same contract as single-process."""
        from midvision_probe_tpu.parallel import multihost

        # metric_fn is pure jnp of (pred, batch): run it JITTED. Eagerly,
        # its several hundred ops each pay a device round trip — through
        # the axon tunnel that made the metric pass, not the forward, the
        # eval bottleneck (12 of 13 eval minutes on the r5 suite smoke) —
        # and fetch the whole metric dict in ONE device_get per batch.
        jit_metric_fn = jax.jit(metric_fn)
        acc: dict[str, list] = {}
        for i, batch in enumerate(loader):
            if max_batches is not None and i >= max_batches:
                break
            valid = batch.pop("_valid", None)
            pred = self.predict(batch)
            metrics = jax.device_get(jit_metric_fn(pred, _to_jnp(batch)))
            for k, v in metrics.items():
                v = np.asarray(v).reshape(-1)
                if valid is not None:
                    # loud contract: per-sample (B,) metrics only — a
                    # silent pass-through would keep padded duplicates in
                    # one key while dropping them from another
                    if v.shape[0] != valid.shape[0]:
                        raise ValueError(
                            f"metric {k!r} has {v.shape[0]} rows but the "
                            f"batch has {valid.shape[0]} samples; validate "
                            "expects per-sample (B,) metrics so shard-"
                            "padding duplicates can be dropped"
                        )
                    v = v[valid]
                acc.setdefault(k, []).append(v)
        return multihost.gather_metrics(
            {k: np.concatenate(v) for k, v in acc.items()})


def _host_local_rows(arr) -> np.ndarray:
    """Fetch an array to host numpy; for a multi-process GLOBAL array,
    return only THIS host's rows (its addressable shards, which are
    contiguous because make_mesh orders devices by process)."""
    if jax.process_count() == 1:
        return np.asarray(arr)
    shards = sorted(arr.addressable_shards,
                    key=lambda s: s.index[0].start or 0)
    return np.concatenate([np.asarray(s.data) for s in shards])


def _to_jnp(batch: dict) -> dict:
    return {
        k: v for k, v in batch.items() if isinstance(v, (np.ndarray, jnp.ndarray))
    }

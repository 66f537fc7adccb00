"""Round-3 regression tests: generic-attention pad cancellation (ADVICE r2
medium), fused-softmax underflow guard, cache-compatible batch-order
shuffling (VERDICT r2 #3), and exact partial-batch gradient semantics
(VERDICT r2 #9)."""

import jax
import jax.numpy as jnp
import numpy as np

from midvision_probe_tpu.datasets.builder import Loader
from midvision_probe_tpu.ops.vit_attention import (
    _einsum_ref,
    fused_qkv_attention,
    vit_attention,
)


# --------------------------------------------------------------- attention
def test_vit_attention_uniformly_negative_rows(rng):
    """Regression (ADVICE r2 medium): the generic path's _softmax_rows used
    the pad-count normalizer correction, which catastrophically cancels when
    every valid score in a row is far below the zero score of the structural
    pad columns (valid rows -> Inf below logit ~ -20). N=200 pads to 256."""
    B, H, N, d = 1, 2, 200, 64
    q = jnp.full((B, H, N, d), -2.6, jnp.float32)  # q.k = -166 -> logit -20.8
    k = jnp.ones((B, H, N, d), jnp.float32)
    v = jnp.asarray(rng.randn(B, H, N, d).astype(np.float32))
    got = vit_attention(q, k, v, d**-0.5, True)
    ref = _einsum_ref(q, k, v, d**-0.5)
    assert np.isfinite(np.asarray(got)).all()
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)


def test_fused_qkv_attention_underflow_guard(rng):
    """All valid base-2 scores below f32 range: the max-free fused softmax's
    0/0 window must degrade to zeros, not NaN (normalizer clamped 1e-30)."""
    B, N, H, d = 1, 128, 2, 64
    qkv = rng.randn(B, N, 3, H, d).astype(np.float32) * 0.01
    qkv[:, :, 0] = -14.0  # q.k*scale*log2e ~ -161 < -149 (f32 subnormal min)
    qkv[:, :, 1] = 1.0
    got = np.asarray(fused_qkv_attention(jnp.asarray(qkv), d**-0.5, True))
    assert np.isfinite(got).all()
    np.testing.assert_array_equal(got, np.zeros_like(got))


# ------------------------------------------------------ batch-order shuffle
class _DS:
    def __init__(self, n=20):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"x": np.asarray([i], np.float32)}


def test_loader_shuffle_batch_order_permutes_epochs():
    """Epoch-seeded batch-ORDER permutation: different arrival order across
    epochs, identical batch composition per _batch_id (the feature-cache
    contract), every batch seen exactly once."""
    loader = Loader(_DS(20), batch_size=4, shuffle=False,
                    shuffle_batch_order=True, seed=3)
    by_epoch = {}
    for ep in range(3):
        loader.set_epoch(ep)
        by_epoch[ep] = [(b["_batch_id"], tuple(b["x"].reshape(-1).tolist()))
                        for b in loader]
    orders = [tuple(bid for bid, _ in by_epoch[ep]) for ep in range(3)]
    assert len(set(orders)) >= 2, "epochs must see different batch orders"
    for ep in range(3):
        assert sorted(bid for bid, _ in by_epoch[ep]) == list(range(5))
    comp = {}
    for ep in range(3):
        for bid, rows in by_epoch[ep]:
            assert comp.setdefault(bid, rows) == rows, (
                "batch composition must be identical across epochs")


def test_loader_plain_mode_has_no_batch_id():
    loader = Loader(_DS(8), batch_size=4)
    for b in loader:
        assert "_batch_id" not in b


def test_cache_shuffle_kwargs():
    from midvision_probe_tpu.config import compose
    from midvision_probe_tpu.engine.driver_common import cache_shuffle_kwargs

    cfg = compose("depth_training", ["backbone=test_tiny",
                                     "dataset=synthetic",
                                     "+system.cache_features=True"])
    assert cache_shuffle_kwargs(cfg) == {"shuffle": False,
                                         "shuffle_batch_order": True}
    cfg = compose("depth_training", ["backbone=test_tiny",
                                     "dataset=synthetic"])
    assert cache_shuffle_kwargs(cfg) == {}


# -------------------------------------------------- partial-batch gradients
def _make_trainer(num_devices):
    from midvision_probe_tpu.engine.probe_fit import ProbeTrainer
    from midvision_probe_tpu.models.probes import DepthHead
    from midvision_probe_tpu.models.zoo import build_vit_extractor
    from midvision_probe_tpu.ops.image import resize
    from midvision_probe_tpu.utils.losses import depth_loss

    backbone = build_vit_extractor("test_tiny_vit", output="dense")
    probe = DepthHead(feat_dim=backbone.feat_dim, head_type="linear",
                      max_depth=10.0)

    def loss_fn(pred, batch):
        target = batch["depth"]
        pred = resize(pred, target.shape[1:3], mode="bilinear")
        return depth_loss(pred, target, max_depth=10.0)

    return ProbeTrainer(backbone=backbone, probe=probe, loss_fn=loss_fn,
                        n_steps=4, warmup_steps=1.0,
                        num_devices=num_devices, seed=0)


def test_partial_batch_gradients_match_unpadded(rng):
    """VERDICT r2 #9: a final partial batch (5 rows on an 8-device mesh,
    padded to 8 by cyclic repetition) must produce EXACTLY the optimizer
    update of the unpadded 5-row batch — padded rows are sliced off before
    the loss, so no sample's gradient is double-weighted."""
    batch = {
        "image": rng.rand(5, 32, 32, 3).astype(np.float32),
        "depth": (rng.rand(5, 32, 32, 1).astype(np.float32) * 9 + 0.5),
    }
    t8 = _make_trainer(num_devices=8)   # pads 5 -> 8
    t1 = _make_trainer(num_devices=1)   # no padding needed
    t8.init(batch)
    t1.init(batch)
    chex_equal = jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=0),
        t8.state.params, t1.state.params)
    del chex_equal

    l8 = t8.train_epoch([dict(batch)])
    l1 = t1.train_epoch([dict(batch)])
    np.testing.assert_allclose(l8, l1, rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7),
        t8.state.params, t1.state.params)


# ------------------------------------------------- engine/data review fixes
def test_loader_shards_are_equal_length():
    """Host shards pad to equal length (reference DistributedSampler
    semantics): unequal shards desync multi-host steps-per-epoch and hang
    the gradient all-reduce."""
    ds = _DS(111)
    lens = {k: len(Loader(ds, batch_size=8, drop_last=True,
                          num_shards=2, shard_index=k))
            for k in (0, 1)}
    assert lens[0] == lens[1] == 7  # ceil(111/2)=56 -> 7 full batches


def test_loader_rejects_missing_shard_index():
    import pytest

    with pytest.raises(ValueError):
        Loader(_DS(8), batch_size=4, num_shards=2, shard_index=None)


def test_loader_abandoned_iterator_releases_producer():
    """Abandoning an iterator mid-epoch must not leave the producer thread
    blocked on the bounded queue forever."""
    import gc
    import threading
    import time

    before = threading.active_count()
    loader = Loader(_DS(64), batch_size=4, prefetch=1)
    it = iter(loader)
    next(it)
    del it
    gc.collect()
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before


def test_objectness_trains_with_feature_cache(tmp_path):
    """cache_features=True must work on the objectness driver too (it
    builds its train Loader directly; reference-analog drivers route
    through cache_shuffle_kwargs)."""
    from midvision_probe_tpu.config import compose

    import train_generic_objectness

    cfg = compose(
        "objectness_train",
        ["backbone=test_tiny", "dataset=synthetic_voc", "probe=binaryhead",
         "+probe.hidden_dim=32", "optimizer=one_epoch", "batch_size=4",
         "dataset.num_instances=10", "+backbone.return_multilayer=True",
         "+system.cache_features=True", f"output_dir={tmp_path}"],
    )
    row = train_generic_objectness.run(cfg)
    assert 0.0 <= row["IoU"] <= 1.0


def test_set_state_recommits_to_mesh():
    """Restored (host-numpy) states must come back mesh-replicated —
    feeding numpy leaves to the donated jitted step forces a retrace."""
    import jax

    rng = np.random.RandomState(0)
    trainer = _make_trainer(num_devices=8)
    trainer.init({"image": rng.rand(8, 32, 32, 3).astype(np.float32),
                  "depth": rng.rand(8, 32, 32, 1).astype(np.float32) + 0.5})
    state = trainer.state
    host_state = jax.tree_util.tree_map(np.asarray, state)
    new_state = trainer.set_state(host_state)
    leaf = jax.tree_util.tree_leaves(new_state.params)[0]
    assert hasattr(leaf, "sharding")
    assert len(leaf.sharding.device_set) == len(trainer.mesh.devices.ravel())


def test_loader_marks_shard_padding_invalid():
    """Wrapped shard-padding repeats carry _valid=False so validate() can
    drop them: the reference evaluates on an UNSHARDED test loader
    (train_depth.py:559, num_gpus=1) — double-counting wrapped samples
    would bias multi-host eval means."""
    ds = _DS(5)  # 2 shards -> padded to 6, one wrapped repeat on shard 1
    flags, vals = [], []
    for rank in (0, 1):
        for b in Loader(ds, batch_size=3, num_shards=2, shard_index=rank):
            assert "_valid" in b
            flags.extend(b["_valid"].tolist())
            vals.extend(np.asarray(b["x"]).reshape(-1).tolist())
    assert sum(flags) == 5 and len(flags) == 6
    # the valid positions cover the dataset exactly once
    kept = [v for v, f in zip(vals, flags) if f]
    assert sorted(kept) == list(range(5))
    # unsharded / exactly-divisible loaders carry no mask key
    for b in Loader(_DS(6), batch_size=3, num_shards=2, shard_index=0):
        assert "_valid" not in b


def test_validate_drops_shard_padding_rows():
    """ProbeTrainer.validate excludes _valid=False rows from the
    concatenated metrics."""
    from midvision_probe_tpu.engine.probe_fit import ProbeTrainer

    class _Loader:
        def __iter__(self):
            yield {"image": np.zeros((3, 4, 4, 3), np.float32),
                   "_valid": np.array([True, True, False])}

    class _T(ProbeTrainer):
        def __init__(self):
            pass

        def predict(self, batch):
            return np.arange(batch["image"].shape[0], dtype=np.float32)

    out = _T().validate(_Loader(), lambda pred, batch: {"m": pred})
    assert out["m"].tolist() == [0.0, 1.0]


def test_validate_rejects_non_per_sample_metrics_under_padding():
    """With a _valid mask present, a metric whose flattened length isn't B
    must fail loudly — silently keeping padded duplicates in one key while
    dropping them from another would mix sample sets."""
    import pytest

    from midvision_probe_tpu.engine.probe_fit import ProbeTrainer

    class _Loader:
        def __iter__(self):
            yield {"image": np.zeros((3, 4, 4, 3), np.float32),
                   "_valid": np.array([True, True, False])}

    class _T(ProbeTrainer):
        def __init__(self):
            pass

        def predict(self, batch):
            return np.zeros((3, 2), np.float32)

    with pytest.raises(ValueError, match="per-sample"):
        _T().validate(_Loader(), lambda pred, b: {"kp": pred})


def test_gather_rows_single_process_identity():
    from midvision_probe_tpu.parallel.multihost import gather_rows

    rows = [{"a": 1.0, "b": 2.0}]
    assert gather_rows(rows, ("a", "b")) is rows


def test_depth_losses_finite_with_negative_pred_at_holes(rng):
    """A probe prediction < -eps at an UNSUPERVISED pixel (depth hole) must
    not NaN the loss: the reference boolean-indexes valid pixels before the
    log (losses.py:60-63), so it stays finite there."""
    import jax.numpy as jnp

    from midvision_probe_tpu.utils.losses import (
        depth_loss,
        gradient_loss,
        sig_loss,
    )

    gt = np.zeros((1, 4, 4), np.float32)
    gt[0, 0, 0] = 2.0
    pr = np.full((1, 4, 4), 1.0, np.float32)
    pr[0, 1, 1] = -0.5  # hole pixel, no supervision
    for fn in (sig_loss, gradient_loss, depth_loss):
        v = float(fn(jnp.asarray(pr), jnp.asarray(gt)))
        assert np.isfinite(v), fn.__name__


def test_matching_rejects_fully_invalid_target_view(rng):
    """A pair whose target view has NO valid points must yield zero real
    matches (valid all-False), not finite ratio weights against the _FAR
    pad sentinel."""
    import jax.numpy as jnp

    from midvision_probe_tpu.utils.correspondence import (
        masked_correspondences_ratio_test,
    )

    f0 = rng.randn(40, 16).astype(np.float32)
    f1 = rng.randn(40, 16).astype(np.float32)
    v0 = np.ones(40, bool)
    v1 = np.zeros(40, bool)  # no valid target points at all
    _, _, w = masked_correspondences_ratio_test(
        jnp.asarray(f0), jnp.asarray(f1), jnp.asarray(v0), jnp.asarray(v1),
        num_corres=10, use_pallas=False)
    assert not np.isfinite(np.asarray(w)).any()


def test_resize_pos_embed_nonsquare_coincident_count():
    """A KNOWN 14x14=196 table fed a 7x28=196 grid must RESIZE, not
    early-return: the reference's count-only check (utils.py:31) silently
    applied spatially scrambled embeddings (latent-bug policy: fix +
    document). With UNKNOWN provenance the count heuristic must survive —
    random-init tables are created at the (possibly non-square) input
    grid itself."""
    import jax.numpy as jnp

    from midvision_probe_tpu.models.vit import resize_pos_embed

    rng = np.random.RandomState(0)
    pos = jnp.asarray(rng.randn(1 + 14 * 14, 8).astype(np.float32))
    out = np.asarray(resize_pos_embed(pos, (7, 28), has_cls_token=True,
                                      orig_hw=(14, 14)))
    assert out.shape == (1 + 7 * 28, 8)
    # must NOT be the raw table reinterpreted row-major
    assert not np.allclose(out[1:], np.asarray(pos)[1:])
    # same-grid input still early-returns untouched
    same = resize_pos_embed(pos, (14, 14), has_cls_token=True,
                            orig_hw=(14, 14))
    np.testing.assert_array_equal(np.asarray(same), np.asarray(pos))
    # unknown provenance + count match = same grid (random-init tables):
    # a 4x3 table serving a 4x3 grid must pass through untouched
    pos43 = jnp.asarray(rng.randn(12, 8).astype(np.float32))
    same43 = resize_pos_embed(pos43, (4, 3), has_cls_token=False)
    np.testing.assert_array_equal(np.asarray(same43), np.asarray(pos43))

"""Round-3 review-sweep-7 regression tests: ratio_test=False match
polarity, torch-parity resize guard, multi-process mesh slice guard,
driver build_loader positional shard args, and the cached-epoch
image-transfer elision."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from midvision_probe_tpu.ops.matching import get_correspondences_ratio_test
from midvision_probe_tpu.ops.image import resize
from midvision_probe_tpu.parallel import mesh as mesh_mod
from midvision_probe_tpu.utils.correspondence import (
    masked_correspondences_ratio_test,
)


# ------------------------------------------------------------- ratio_test
def test_ratio_test_false_selects_nearest(rng):
    """ratio_test=False must keep the NEAREST pairs (the reference feeds
    raw distances to a descending top-k and returns the WORST matches —
    correspondence.py:74-77; fixed, README non-ports)."""
    t = rng.randn(64, 16).astype(np.float32)
    # queries 0..7 are near-duplicates of targets 0..7; the rest are far
    q = np.concatenate([t[:8] + 0.01 * rng.randn(8, 16).astype(np.float32),
                        10.0 + rng.randn(24, 16).astype(np.float32)])
    i0, i1, w = get_correspondences_ratio_test(
        jnp.asarray(q), jnp.asarray(t), num_corres=8,
        metric="euclidean", ratio_test=False, use_pallas=False)
    # the 8 selected sources must be exactly the near-duplicate queries,
    # each matched to its own target
    assert sorted(np.asarray(i0).tolist()) == list(range(8))
    np.testing.assert_array_equal(np.sort(np.asarray(i1)), np.arange(8))
    # weights are negated distances: descending weight == ascending dist
    assert np.all(np.asarray(w) <= 0)


def test_masked_ratio_test_false_selects_nearest(rng):
    t = rng.randn(32, 8).astype(np.float32)
    q = np.concatenate([t[:4] + 0.01 * rng.randn(4, 8).astype(np.float32),
                        10.0 + rng.randn(12, 8).astype(np.float32)])
    valid_q = np.ones(16, bool)
    valid_t = np.ones(32, bool)
    i0, i1, w = masked_correspondences_ratio_test(
        jnp.asarray(q), jnp.asarray(t), jnp.asarray(valid_q),
        jnp.asarray(valid_t), num_corres=4, metric="euclidean",
        ratio_test=False, use_pallas=False)
    assert sorted(np.asarray(i0).tolist()) == list(range(4))
    np.testing.assert_array_equal(np.sort(np.asarray(i1)), np.arange(4))


# ----------------------------------------------------------------- resize
def test_resize_nearest_rejects_align_corners(rng):
    """torch F.interpolate raises for nearest+align_corners; silent-ignore
    would hide porting mistakes in the torch-parity resize."""
    x = jnp.asarray(rng.randn(1, 4, 4, 3).astype(np.float32))
    with pytest.raises(ValueError, match="align_corners"):
        resize(x, size=(8, 8), mode="nearest", align_corners=True)
    # the valid combinations still work
    assert resize(x, size=(8, 8), mode="nearest").shape == (1, 8, 8, 3)


# ------------------------------------------------------------------- mesh
def test_make_mesh_rejects_device_slice_multiprocess(monkeypatch):
    """num_devices prefix-slices the GLOBAL process-0-first device list —
    meaningless (and host-crashing) in a multi-process run; must refuse."""
    monkeypatch.setattr(mesh_mod.jax, "process_count", lambda: 2)
    with pytest.raises(ValueError, match="multi-process"):
        mesh_mod.make_mesh(num_devices=4)


def test_make_mesh_allows_all_devices_multiprocess(monkeypatch):
    monkeypatch.setattr(mesh_mod.jax, "process_count", lambda: 2)
    n = len(jax.devices())
    m = mesh_mod.make_mesh(num_devices=n)  # explicit full count is fine
    assert m.devices.size == n


# ---------------------------------------------------------- driver loader
def test_driver_build_loader_positional_shard_args():
    """engine.driver_common.build_loader mirrors datasets.build_loader's
    positional (num_shards, shard_index) — a *args wrapper raised
    TypeError 'multiple values for argument' on positional use."""
    from midvision_probe_tpu.config import Config
    from midvision_probe_tpu.engine.driver_common import build_loader

    cfg = Config(
        {
            "_target_": "midvision_probe_tpu.datasets.synthetic.Synthetic",
            "num_instances": 8,
            "image_size": [32, 32],
        }
    )
    loader = build_loader(cfg, "train", 4, 2, 1)  # all-positional call
    batches = list(loader)
    assert len(batches) == 1  # 8 samples / 2 shards / batch 4


def test_binary_mask_rows_shard_equivalence(rng):
    """Objectness validation aggregates per-SAMPLE rows allgathered across
    hosts (review finding r4: per-host batch means covered only that
    host's loader shard). The guarantee gather_rows provides is that
    concatenating shard rows then meaning equals the full-dataset
    per-sample mean — assert that, and that reduce=True matches."""
    from midvision_probe_tpu.utils.objectness import evaluate_binary_masks

    pred = rng.uniform(size=(6, 16, 16)).astype("float32")
    gt = (rng.uniform(size=(6, 16, 16)) > 0.5).astype("float32")

    full = evaluate_binary_masks(pred, gt)
    rows = evaluate_binary_masks(pred, gt, reduce=False)
    for k, mean in full.items():
        assert abs(sum(rows[k]) / len(rows[k]) - mean) < 1e-12

    # two uneven "host shards" (4 + 2): concat of per-sample rows == full
    a = evaluate_binary_masks(pred[:4], gt[:4], reduce=False)
    b = evaluate_binary_masks(pred[4:], gt[4:], reduce=False)
    for k in full:
        merged = a[k] + b[k]
        assert abs(sum(merged) / len(merged) - full[k]) < 1e-12


# ------------------------------------------------ feature-cache device tier
def _cache_trainer(monkeypatch, device_gb, host_gb="8"):
    import sys, os
    monkeypatch.setenv("MVP_FEATURE_CACHE_DEVICE_GB", device_gb)
    monkeypatch.setenv("MVP_FEATURE_CACHE_GB", host_gb)
    sys.path.insert(0, os.path.dirname(__file__))
    from test_r3_fixes import _make_trainer

    t = _make_trainer(num_devices=1)
    t = type(t)(backbone=t.backbone, probe=t.probe, loss_fn=t.loss_fn,
                n_steps=4, warmup_steps=1.0, num_devices=1, seed=0,
                cache_features=True)
    return t


def test_feature_cache_device_tier_matches_host_tier(rng, monkeypatch):
    """The on-device feature-cache tier (zero host traffic on hits — the
    host tier re-uploads every cached batch, which through the axon tunnel
    is slower than recomputing) must be bit-equivalent to the host tier:
    same cached bf16 features, same epoch-2 losses and params."""
    batch = {
        "image": rng.rand(8, 32, 32, 3).astype(np.float32),
        "depth": (rng.rand(8, 32, 32, 1).astype(np.float32) * 9 + 0.5),
    }

    t_dev = _cache_trainer(monkeypatch, device_gb="4")
    t_host = _cache_trainer(monkeypatch, device_gb="0")
    t_dev.init(batch)
    t_host.init(batch)

    losses = {}
    for name, t in (("dev", t_dev), ("host", t_host)):
        l1 = t.train_epoch([dict(batch)])
        l2 = t.train_epoch([dict(batch)])  # served from the cache
        losses[name] = (l1, l2)

    # tier placement is what each configuration says it is: the device
    # entry is (feats, sharded target batch, n_valid) — a hit feeds the
    # step fully-resident inputs — the host entry is feature rows only
    (dev_entry,) = t_dev._feature_cache.values()
    (host_entry,) = t_host._feature_cache.values()
    dev_feats, dev_batch, dev_nv = dev_entry
    assert all(isinstance(f, jax.Array) for f in dev_feats)
    assert all(isinstance(v, jax.Array) for v in dev_batch.values())
    assert "image" not in dev_batch and dev_nv is None
    assert all(isinstance(f, np.ndarray) for f in host_entry)
    assert t_dev._dev_cache_bytes > 0 and t_dev._cache_bytes == 0
    assert t_host._dev_cache_bytes == 0 and t_host._cache_bytes > 0
    # host-tier accounting charges exactly what it stores — feature rows
    # only (r4 review finding: charging the target-batch bytes too
    # exhausted the budget ~25% early and silently re-extracted the tail)
    assert t_host._cache_bytes == sum(
        f.size * f.dtype.itemsize for f in host_entry)
    assert t_dev._dev_cache_bytes > t_host._cache_bytes

    np.testing.assert_allclose(losses["dev"][0], losses["host"][0], atol=0)
    np.testing.assert_allclose(losses["dev"][1], losses["host"][1], atol=0)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=0),
        t_dev.state.params, t_host.state.params)


def test_synthetic_memo_and_disk_cache(tmp_path, monkeypatch):
    """Synthetic items are pure functions of (seed, index): the in-RAM memo
    must return equal items without regeneration and isolate consumer key
    pops; the opt-in disk tier ($MVP_SYNTH_DISK_CACHE) must round-trip
    bit-exactly across dataset instances (the cross-sweep-tile case)."""
    from midvision_probe_tpu.datasets.synthetic import SyntheticDepth

    monkeypatch.setenv("MVP_SYNTH_DISK_CACHE", str(tmp_path))
    a = SyntheticDepth(4, (32, 32), seed=5)[2]
    a_pop = SyntheticDepth(4, (32, 32), seed=5)
    item = a_pop[2]
    item.pop("image")
    assert "image" in a_pop[2]  # pop did not leak into the memo

    # the store must COMMIT to the exact keyed path (np.savez appends
    # ".npz" to suffixless names — a tmp name without the suffix makes
    # os.replace silently miss and the cache never hits, r4 bug) and
    # leave no orphaned tmp files behind
    key = os.path.basename(a_pop._disk_key(2))
    assert os.path.exists(tmp_path / key)
    assert [f for f in os.listdir(tmp_path) if ".tmp" in f] == []

    # different generation signature must miss (distinct key)
    c = SyntheticDepth(4, (32, 32), seed=6)[2]
    assert not np.array_equal(a["depth"], c["depth"])

    b = SyntheticDepth(4, (32, 32), seed=5)  # fresh instance: disk hit
    monkeypatch.setattr(
        SyntheticDepth, "_generate",
        lambda self, i: (_ for _ in ()).throw(
            AssertionError("disk tier missed: item regenerated")))
    for k, v in a.items():
        np.testing.assert_array_equal(v, b[2][k])


_BACKBONE_CONFIGS = sorted(
    p.stem for p in __import__("pathlib").Path("configs/backbone").glob("*.yaml"))


@pytest.mark.parametrize("name", _BACKBONE_CONFIGS)
def test_every_backbone_config_instantiates(name, monkeypatch):
    """Every configs/backbone YAML must plumb through the driver's
    build_backbone into a zoo builder with a registered name (r4 suite bug:
    all 17 resnet configs crashed on the checkpoint_name key the wrapper
    ctors never accepted — no test drove backbones through the CONFIG
    path). Builders are stubbed: this pins ctor kwarg handling and name
    resolution, not weights/params (tests/test_zoo.py covers forwards)."""
    from midvision_probe_tpu.config import compose
    from midvision_probe_tpu.engine.driver_common import build_backbone
    from midvision_probe_tpu.models import zoo
    from midvision_probe_tpu.models.sd import featurizer as sd_feat

    seen = {}

    def stub(builder):
        def fake(*a, **kw):
            zoo_name = a[0] if a else kw.get("name")
            assert zoo_name in zoo.ZOO, (
                f"{builder} got unregistered name {zoo_name!r}")
            seen["name"] = zoo_name
            return f"stub:{zoo_name}"
        return fake

    for b in ("build_vit_extractor", "build_resnet_extractor",
              "build_convnext_extractor", "build_sam_extractor"):
        monkeypatch.setattr(zoo, b, stub(b))
    for cls in ("DIFT", "Zero123"):
        monkeypatch.setattr(
            sd_feat, cls,
            lambda *a, _c=cls, **kw: seen.update(name=_c) or f"stub:{_c}")

    cfg = compose("depth_training", [
        f"backbone={name}", "dataset=synthetic", "probe=depth_linear",
        "system.backbone_dtype=bfloat16"])
    out = build_backbone(cfg, needs_multilayer=True)
    assert str(out).startswith("stub:"), out
    assert seen["name"]


_PROBE_DRIVER_KWARGS = {
    # mirror each trainer's instantiate() kwargs exactly
    "depth_linear": ("depth_training", {"feat_dim": [32] * 4, "max_depth": 10.0}),
    "depth_dpt": ("depth_training", {"feat_dim": [32] * 4, "max_depth": 10.0}),
    "depth_multiscale": ("depth_training",
                         {"feat_dim": [32] * 4, "max_depth": 10.0}),
    "depth_dpt_taskonomy": ("taskonomy_training",
                            {"feat_dim": [32] * 4, "output_dim": 3}),
    "snorm_linear": ("snorm_training", {"feat_dim": [32] * 4}),
    "snorm_dpt": ("snorm_training", {"feat_dim": [32] * 4}),
    "snorm_multiscale": ("snorm_training", {"feat_dim": [32] * 4}),
    "binaryhead": ("objectness_train", {"feat_dim": [32] * 4}),
    "taskonomy_dpt": ("taskonomy_training", {"feat_dim": [32] * 4}),
}


@pytest.mark.parametrize("name", sorted(_PROBE_DRIVER_KWARGS))
def test_every_probe_config_instantiates(name):
    """Every configs/probe YAML must instantiate with the exact kwargs its
    trainer passes (same class of config-path gap as the resnet
    checkpoint_name crash: nothing drove some probe YAMLs through
    instantiate())."""
    from midvision_probe_tpu.config import compose, instantiate

    exp, kwargs = _PROBE_DRIVER_KWARGS[name]
    cfg = compose(exp, [f"probe={name}", "dataset=synthetic",
                        "backbone=test_tiny"])
    if "output_dim" in kwargs and "output_dim" not in cfg.probe:
        kwargs = {k: v for k, v in kwargs.items() if k != "output_dim"}
    probe = instantiate(cfg.probe, **kwargs)
    assert probe is not None


def test_probe_yaml_list_is_covered():
    """Fail when a new probe YAML lands without a plumbing case above."""
    import pathlib

    stems = {p.stem for p in pathlib.Path("configs/probe").glob("*.yaml")}
    assert stems == set(_PROBE_DRIVER_KWARGS), (
        stems ^ set(_PROBE_DRIVER_KWARGS))

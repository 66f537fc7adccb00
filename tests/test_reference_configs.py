"""Drop-in compatibility: the REFERENCE repo's own hydra YAMLs compose with
our config layer and their ``evals.*`` targets instantiate our models."""

import os

import pytest

REF = "/root/reference/configs"


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_reference_depth_training_composes():
    from midvision_probe_tpu.config import compose

    cfg = compose("depth_training", ["backbone=dino_b16"], config_dir=REF)
    assert cfg.backbone._target_ == "evals.models.dino.DINO"
    assert cfg.probe._target_ == "evals.models.probes.DepthHead"
    assert cfg.batch_size == 16


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_reference_backbone_yaml_instantiates(rng):
    import jax.numpy as jnp
    import numpy as np

    from midvision_probe_tpu.config import compose, instantiate

    cfg = compose("depth_training", ["backbone=dino_b16"], config_dir=REF)
    model = instantiate(cfg.backbone)
    assert model.checkpoint_name == "dino_vitb16"
    assert model.patch_size == 16
    out = model(jnp.asarray(rng.randn(1, 112, 112, 3).astype(np.float32)))
    assert out.shape == (1, 7, 7, 768)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_reference_probe_yaml_instantiates():
    from midvision_probe_tpu.config import compose, instantiate
    from midvision_probe_tpu.models.probes import DepthHead

    cfg = compose("depth_training", [], config_dir=REF)
    probe = instantiate(cfg.probe, feat_dim=[768] * 4, max_depth=10.0)
    assert isinstance(probe, DepthHead)
    assert probe.prediction_type == "bindepth"


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_all_reference_backbone_yamls_resolve():
    """Every reference backbone YAML's _target_ resolves to a callable
    (no instantiation — just the import path through the compat layer)."""
    import yaml

    from midvision_probe_tpu.config.core import _locate

    bdir = os.path.join(REF, "backbone")
    unresolved = []
    for f in sorted(os.listdir(bdir)):
        with open(os.path.join(bdir, f)) as fh:
            data = yaml.safe_load(fh)
        try:
            obj = _locate(data["_target_"])
            assert callable(obj)
        except Exception as e:  # noqa: BLE001 — collecting a report
            unresolved.append((f, data["_target_"], str(e)[:80]))
    assert not unresolved, unresolved

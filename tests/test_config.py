"""Tests for the hydra-compatible config layer."""

import pytest

from midvision_probe_tpu.config import compose, instantiate, to_dict
from midvision_probe_tpu.config.core import Config


def test_compose_defaults_groups():
    cfg = compose("depth_training")
    assert cfg.batch_size == 16
    assert cfg.optimizer.n_epochs == 10
    assert cfg.backbone._target_.endswith("DINO")
    assert cfg.probe.head_type == "dpt"
    assert cfg.dataset.name == "nyuv2"


def test_group_swap_and_dot_overrides():
    cfg = compose(
        "depth_training",
        ["optimizer=one_epoch", "batch_size=4", "probe.head_type=linear",
         "+backbone.return_multilayer=True"],
    )
    assert cfg.optimizer.n_epochs == 1
    assert cfg.batch_size == 4
    assert cfg.probe.head_type == "linear"
    assert cfg.backbone.return_multilayer is True


def test_unknown_override_rejected():
    with pytest.raises(KeyError):
        compose("depth_training", ["backbone.nonexistent_key=3"])


def test_interpolation():
    cfg = compose("depth_training")
    assert cfg.experiment_model == cfg.backbone.checkpoint_name


def test_instantiate_target():
    cfg = Config(
        {"_target_": "collections.OrderedDict"},
    )
    obj = instantiate(cfg)
    from collections import OrderedDict

    assert isinstance(obj, OrderedDict)


def test_instantiate_kwargs_override():
    cfg = Config({"_target_": "fractions.Fraction", "numerator": 1, "denominator": 2})
    frac = instantiate(cfg, denominator=4)
    assert frac.denominator == 4


def test_to_dict_roundtrip():
    cfg = compose("depth_training")
    d = to_dict(cfg)
    assert isinstance(d, dict) and not isinstance(d, Config)
    assert d["optimizer"]["n_epochs"] == 10


def test_scientific_notation_parses_as_float():
    """probe_lr=1e-4 must be a float like OmegaConf (PyYAML's 1.1 resolver
    needs a '.', so it silently became a string reaching optax)."""
    from midvision_probe_tpu.config import compose

    cfg = compose("depth_training", ["backbone=test_tiny",
                                     "dataset=synthetic", "probe_lr=1e-4"])
    assert isinstance(cfg.probe_lr, float) and cfg.probe_lr == 1e-4


def test_plus_group_override_composes_group_yaml():
    """hydra '+group=name' appends a NEW group default and composes its
    YAML; assigning the bare string fails instantiate() far from the typo."""
    from midvision_probe_tpu.config import compose

    cfg = compose("spair_correspondence", ["+dataset=synthetic_navi"])
    assert cfg.dataset.get("_target_", "").endswith("SyntheticNAVIPairs")
    # non-group '+key=value' additions still work
    cfg2 = compose("spair_correspondence", ["+brand_new_key=7"])
    assert cfg2.brand_new_key == 7


def test_leading_dot_and_signed_float_forms():
    """YAML-1.2 core-schema float forms the first resolver regex missed:
    signed leading-dot (-.5/+.5) and leading-dot with UNSIGNED exponent
    (.5e3) must parse as floats, not strings (review finding r4)."""
    from midvision_probe_tpu.config.core import _parse_value

    for text, want in [("-.5", -0.5), ("+.5", 0.5), (".5e3", 500.0),
                       (".5e-3", 0.0005), (".5", 0.5), ("-.25e2", -25.0)]:
        got = _parse_value(text)
        assert isinstance(got, float) and got == want, (text, got)
    # non-floats must stay strings
    for text in [".e3", "-.e2", ".", "+.", "1.2.3"]:
        assert isinstance(_parse_value(text), str), text

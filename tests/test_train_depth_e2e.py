"""End-to-end smoke: the full depth-probe training slice on the 8-device
virtual CPU mesh with synthetic data (SURVEY §7 milestone 4)."""

import os

import numpy as np
import pytest


@pytest.mark.parametrize("probe", ["depth_linear"])
def test_train_depth_synthetic_end_to_end(tmp_path, probe):
    from midvision_probe_tpu.config import compose

    import train_depth

    cfg = compose(
        "depth_training",
        [
            "backbone=test_tiny",
            "dataset=synthetic",
            f"probe={probe}",
            "optimizer=one_epoch",
            "batch_size=8",
            "dataset.num_instances=16",
            "+backbone.return_multilayer=True",
            f"output_dir={tmp_path}",
            "wandb.use=False",
        ],
    )
    row = train_depth.run(cfg)
    assert "sa_d1" in row and "si_d1" in row
    assert 0.0 <= row["sa_d1"] <= 1.0
    assert np.isfinite(row["sa_rmse"])
    # CSV emitted
    csvs = [f for f in os.listdir(tmp_path) if f.endswith(".csv")]
    assert len(csvs) == 1


def test_train_depth_resume(tmp_path):
    """Checkpoint written during fit() restores exactly."""
    from midvision_probe_tpu.config import compose

    import train_depth

    overrides = [
        "backbone=test_tiny", "dataset=synthetic", "probe=depth_linear",
        "optimizer=one_epoch", "batch_size=8", "dataset.num_instances=8",
        "+backbone.return_multilayer=True", f"output_dir={tmp_path}",
    ]
    cfg = compose("depth_training", overrides)
    train_depth.run(cfg)

    # second run with is_eval: loads the checkpoint instead of training
    cfg2 = compose("depth_training", overrides + ["is_eval=True"])
    row = train_depth.run(cfg2)
    assert np.isfinite(row["sa_rmse"])


def test_train_depth_with_feature_cache(tmp_path):
    """cache_features path: deterministic loader, second epoch reuses
    host-cached bf16 features."""
    from midvision_probe_tpu.config import compose

    import train_depth

    cfg = compose(
        "depth_training",
        [
            "backbone=test_tiny", "dataset=synthetic", "probe=depth_linear",
            "batch_size=8", "dataset.num_instances=16",
            "optimizer.n_epochs=2", "optimizer.warmup_epochs=0.2",
            "+backbone.return_multilayer=True", f"output_dir={tmp_path}",
            "+system.cache_features=True", "+system.backbone_dtype=bfloat16",
        ],
    )
    row = train_depth.run(cfg)
    assert np.isfinite(row["sa_rmse"])

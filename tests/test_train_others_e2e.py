"""E2E smoke for the snorm and objectness trainers on synthetic data."""

import numpy as np


def test_train_snorm_synthetic(tmp_path):
    from midvision_probe_tpu.config import compose

    import train_snorm

    cfg = compose(
        "snorm_training",
        [
            "backbone=test_tiny", "dataset=synthetic", "probe=snorm_dpt",
            "probe.hidden_dim=32",
            "optimizer=one_epoch", "batch_size=8", "dataset.num_instances=8",
            "+backbone.return_multilayer=True", f"output_dir={tmp_path}",
        ],
    )
    row = train_snorm.run(cfg)
    assert 0.0 <= row["d1"] <= 1.0
    assert np.isfinite(row["rmse"])


def test_train_objectness_synthetic(tmp_path):
    from midvision_probe_tpu.config import compose

    import train_generic_objectness

    cfg = compose(
        "objectness_train",
        [
            "backbone=test_tiny", "dataset=synthetic_voc", "probe=binaryhead",
            "+probe.hidden_dim=32",
            "optimizer=one_epoch", "batch_size=4", "dataset.num_instances=10",
            "+backbone.return_multilayer=True", f"output_dir={tmp_path}",
        ],
    )
    row = train_generic_objectness.run(cfg)
    for k in ("F-measure", "IoU", "Accuracy", "CorLoc"):
        assert 0.0 <= row[k] <= 1.0

"""Taskonomy pipeline e2e on the synthetic fallback."""

import numpy as np


def test_taskonomy_trainer_curvature(tmp_path):
    from midvision_probe_tpu.config import compose

    import train_taskonomy

    cfg = compose(
        "taskonomy_training",
        ["backbone=test_tiny", "optimizer=one_epoch", "batch_size=8",
         "probe.head_type=dpt", "+probe.hidden_dim=32",
         "+backbone.return_multilayer=True", f"output_dir={tmp_path}",
         "dataset.task=principal_curvature"],
    )
    row = train_taskonomy.run(cfg)
    assert np.isfinite(row["AbsRel"])


def test_task_transform_clamping():
    from midvision_probe_tpu.datasets.taskonomy import task_transform

    d16 = (np.ones((8, 8), np.uint16) * 9000)
    out = task_transform(d16, "depth_euclidean")
    # 9000/65535 clamped to 8000/65535 then rescaled to 1.0
    np.testing.assert_allclose(out.max(), 1.0, atol=1e-5)
    rgb = (np.random.RandomState(0).rand(8, 8, 3) * 255).astype(np.uint8)
    out = task_transform(rgb, "rgb")
    assert out.shape == (8, 8, 3)

"""Tests: RSA correlation, profiling harness, sweep launcher dry-run."""

import numpy as np


def test_correlation_utils(rng):
    from midvision_probe_tpu.utils import correlation as C

    feats = rng.randn(10, 6).astype(np.float32)
    D = np.asarray(C.compute_pw_distances(feats))
    ref = np.linalg.norm(feats[:, None] - feats[None, :], axis=-1)
    # quadratic-expansion distance: diagonal zeros come out as sqrt(eps)
    np.testing.assert_allclose(D, ref, atol=2e-3)

    a = rng.randn(8, 8)
    assert abs(C.compute_row_correlation(a, a) - 1.0) < 1e-9
    assert abs(C.compute_uppertriangle_correlation(a, a, "spearman") - 1.0) < 1e-9
    s = C.matrix_distance(a, a, use_upper=True)
    assert s.startswith("S:1.000")


def test_time_fn():
    import jax.numpy as jnp

    from midvision_probe_tpu.utils.profiling import time_fn

    stats = time_fn(lambda x: x * 2, jnp.ones((8, 8)), warmup=1, iters=3)
    assert stats["mean_ms"] > 0 and stats["iters"] == 3


def test_sweep_dry_run(capsys):
    import sys
    sys.path.insert(0, "launch_script")
    import sweep

    ret = sweep.main(["--task", "depth", "--models", "dino_b16", "mae_b16",
                      "--dry-run"])
    assert ret == 0
    out = capsys.readouterr().out
    assert "train_depth.py" in out and "backbone=dino_b16" in out


def test_2afc_metrics_match_sklearn(rng):
    """The reference computes 2AFC metrics with sklearn
    (evaluate_model_percepture.py:51-64); ours re-implements them — check
    against the genuine sklearn functions, including an imbalanced case."""
    from sklearn.metrics import (
        accuracy_score,
        f1_score,
        precision_score,
        recall_score,
    )

    from evaluate_model_percepture import compute_metrics

    gt = (rng.rand(257) > 0.7).astype(int)
    pred = (rng.rand(257) > 0.4).astype(int)
    got = compute_metrics(gt, pred)
    assert got["accuracy"] == accuracy_score(gt, pred)
    np.testing.assert_allclose(got["precision"], precision_score(gt, pred))
    np.testing.assert_allclose(got["recall"], recall_score(gt, pred))
    np.testing.assert_allclose(got["f1_score"], f1_score(gt, pred))
    # degenerate all-negative predictions: sklearn zero_division=0 default
    pred0 = np.zeros(257, int)
    got0 = compute_metrics(gt, pred0)
    assert got0["precision"] == precision_score(gt, pred0, zero_division=0)
    assert got0["recall"] == recall_score(gt, pred0, zero_division=0)

"""aggregate_results.py: suite CSV set -> paper-style ranking tables.

Covers both discovery layouts (suite archive ``<dir>/<task>_<name>.csv``
and live output tree ``<dir>/<task>/<name>.csv``), latest-row-per-backbone
dedup, the SPair Class=='all' filter, lower-is-better ranking for rmse,
and the taskonomy numeric-column fallback."""

import csv
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "launch_script"))

import aggregate_results as agg  # noqa: E402


def _write(path, rows):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0]))
        w.writeheader()
        w.writerows(rows)


def _depth_row(ckpt, sa_d1, sa_rmse):
    return {"exp_name": f"depth_{ckpt}", "checkpoint": ckpt,
            "layer": "0-1-2-3", "output": "dense", "n_epochs": 10,
            "batch_size": 32, "probe_lr": 5e-4, "note": "",
            "sa_d1": sa_d1, "sa_d2": 0.9, "sa_d3": 0.99,
            "sa_rmse": sa_rmse, "si_d1": sa_d1, "si_rmse": sa_rmse}


def test_archive_layout_end_to_end(tmp_path):
    d = tmp_path / "csv"
    _write(str(d / "depth_depth_results_nyu_final.csv"), [
        _depth_row("dino_b16", 0.50, 0.80),
        _depth_row("mae_b16", 0.70, 0.60),
        _depth_row("dino_b16", 0.60, 0.70),   # later row must win
    ])
    _write(str(d / "spair_spair_correspondence_final.csv"), [
        {"Time": "t", "Model Checkpoint": "dino_b16", "Patch Size": 16,
         "Layer": 11, "Output": "dense", "Dataset": "SPair-71k",
         "Split": "test", "Class": "cat", "Num Instances": 8,
         "Recall (View Diff 0)": 50.0, "Recall (View Diff 1)": 40.0,
         "Recall (View Diff 2)": 30.0, "Recall (View Diff all)": 45.0},
        {"Time": "t", "Model Checkpoint": "dino_b16", "Patch Size": 16,
         "Layer": 11, "Output": "dense", "Dataset": "SPair-71k",
         "Split": "test", "Class": "all", "Num Instances": 24,
         "Recall (View Diff 0)": 55.0, "Recall (View Diff 1)": 44.0,
         "Recall (View Diff 2)": 33.0, "Recall (View Diff all)": 48.0},
    ])
    out = str(tmp_path / "tables.md")
    assert agg.main(["--csv-dir", str(d), "--out", out]) == 0
    md = open(out).read()

    # dedup: dino's depth row is the LATEST (0.60), not first or both
    assert "| dino_b16 | 0.6000 |" in md
    assert "0.5000" not in md
    # ranking: mae (0.70) above dino (0.60) in the depth table
    depth = md[md.index("## depth"):]
    assert depth.index("mae_b16") < depth.index("dino_b16")
    # spair kept only the Class=='all' aggregate row
    assert "48.0000" in md and "45.0000" not in md
    # overview carries one headline column per task
    assert "depth: sa_d1" in md and "spair: Recall (View Diff all)" in md


def test_tree_layout_rmse_ranking_and_fallback(tmp_path):
    root = tmp_path / "suite_out"
    _write(str(root / "taskonomy" / "taskonomy_results_curvature.csv"), [
        {"exp_name": "e1", "checkpoint": "dino_b16", "layer": 3,
         "output": "dense", "n_epochs": 10, "batch_size": 32,
         "probe_lr": 5e-4, "note": "", "masked_l1": 0.30},
        {"exp_name": "e2", "checkpoint": "mae_b16", "layer": 3,
         "output": "dense", "n_epochs": 10, "batch_size": 32,
         "probe_lr": 5e-4, "note": "", "masked_l1": 0.20},
    ])
    out = str(tmp_path / "tables.md")
    assert agg.main(["--csv-dir", str(root), "--out", out]) == 0
    md = open(out).read()
    # fallback discovered the task-specific metric column
    assert "masked_l1" in md
    # lower-is-better: mae (0.20) ranks above dino (0.30)
    tbl = md[md.index("## taskonomy"):]
    assert tbl.index("mae_b16") < tbl.index("dino_b16")
    assert "↓" in tbl


def test_missing_dir_fails_loudly(tmp_path):
    assert agg.main(["--csv-dir", str(tmp_path / "nope"),
                     "--out", str(tmp_path / "o.md")]) == 1


def test_log_recovery_fills_missing_cells(tmp_path):
    """Cells whose CSV rows were lost (volatile /tmp tree) are recovered
    from their per-cell driver logs: recovered rows carry the † marker,
    cells that DO have a CSV row are never duplicated (name-normalized
    match, dino_b16 log vs dino_vitb16 checkpoint), unparseable logs are
    skipped."""
    d = tmp_path / "suite" / "csv"
    _write(str(d / "depth_depth_results_synthetic_final.csv"), [
        _depth_row("dino_vitb16", 0.60, 0.70),
    ])
    logs = tmp_path / "suite"
    os.makedirs(str(logs / "depth"))
    os.makedirs(str(logs / "navi"))
    # matches the existing dino_vitb16 CSV row -> must NOT be recovered
    (logs / "depth" / "dino_b16.log").write_text(
        "12:00 | INFO | scale-aware  d1 0.9999 rmse 0.1 | "
        "scale-invariant d1 0.9 rmse 0.2\n")
    # no CSV row -> recovered from the log (last metric line wins)
    (logs / "depth" / "mae_b16.log").write_text(
        "12:00 | INFO | scale-aware  d1 0.1000 rmse 9.0 | "
        "scale-invariant d1 0.1 rmse 9.0\n"
        "12:05 | INFO | scale-aware  d1 0.7000 rmse 0.5000 | "
        "scale-invariant d1 0.7100 rmse 0.4900\n")
    # a whole task with no CSVs at all
    (logs / "navi" / "dino_b16.log").write_text(
        "12:00 | INFO | Recall at 0.01 m: 84.00\n"
        "12:00 | INFO | Recall at 0.02 m: 99.25\n"
        "12:00 | INFO | Recall at   5px: 93.06\n")
    # unparseable log -> skipped, not an empty row
    (logs / "navi" / "broken.log").write_text("crash before metrics\n")

    out = str(tmp_path / "tables.md")
    assert agg.main(["--csv-dir", str(d), "--out", out]) == 0
    md = open(out).read()

    assert "mae_b16 †" in md
    assert "0.7000" in md and "0.9999" not in md  # no dup for dino
    depth = md[md.index("## depth"):md.index("## navi")]
    assert "dino_b16 †" not in depth
    navi = md[md.index("## navi"):]
    assert "dino_b16 †" in navi and "99.2500" in navi
    assert "broken" not in md
    # recovery note in the preamble
    assert "†" in md[:md.index("## ")]


def test_log_recovery_disabled(tmp_path):
    d = tmp_path / "suite" / "csv"
    _write(str(d / "depth_depth_results_synthetic_final.csv"), [
        _depth_row("dino_vitb16", 0.60, 0.70),
    ])
    os.makedirs(str(tmp_path / "suite" / "depth"))
    (tmp_path / "suite" / "depth" / "mae_b16.log").write_text(
        "12:00 | INFO | scale-aware  d1 0.7 rmse 0.5 | "
        "scale-invariant d1 0.71 rmse 0.49\n")
    out = str(tmp_path / "tables.md")
    assert agg.main(["--csv-dir", str(d), "--out", out,
                     "--logs-dir", "none"]) == 0
    assert "†" not in open(out).read()


def test_hard_task_csvs_bucket_separately(tmp_path):
    """'navi_hard_*.csv' must land under navi_hard, not navi (longest task
    prefix wins in archive-layout discovery) — and the hard column shows up
    as its own overview column so saturated-easy vs hard signal is visible
    side by side."""
    d = tmp_path / "csv"
    navi_row = {"Time": "t", "Model Checkpoint": "dino_b16",
                "Patch Size": 16, "Layer": 11, "Output": "dense",
                "Num Correspondences": 100, "Scale Factor": 0.25,
                "3D Recall (0.01m)": 84.0, "3D Recall (0.02m)": 99.2,
                "3D Recall (0.05m)": 100.0, "2D Recall (5px)": 93.0,
                "2D Recall (25px)": 97.9, "2D Recall (50px)": 98.7}
    hard_row = dict(navi_row)
    hard_row.update({"3D Recall (0.02m)": 41.5, "3D Recall (0.01m)": 30.0,
                     "3D Recall (0.05m)": 52.0})
    _write(str(d / "navi_navi_correspondence_final.csv"), [navi_row])
    _write(str(d / "navi_hard_navi_correspondence_final.csv"), [hard_row])
    by_task = agg.discover(str(d))
    assert set(by_task) == {"navi", "navi_hard"}
    out = str(tmp_path / "tables.md")
    assert agg.main(["--csv-dir", str(d), "--out", out]) == 0
    md = open(out).read()
    assert "## navi " in md and "## navi_hard " in md
    hard = md[md.index("## navi_hard"):]
    assert "41.5000" in hard and "99.2000" not in hard
    assert "navi: 3D Recall (0.02m)" in md
    assert "navi_hard: 3D Recall (0.02m)" in md

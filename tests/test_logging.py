"""Observability sinks: header-aligned CSV append (the reference's paper
tables are append-only CSVs, train_depth.py:742-829), wandb stub
semantics, and the per-experiment logger."""

import csv
import logging
import os

from midvision_probe_tpu.utils.logging import (
    CSVWriter,
    _WandbStub,
    maybe_wandb,
    setup_logger,
)


def test_csv_writer_aligns_later_rows_to_first_header(tmp_path):
    p = str(tmp_path / "results.csv")
    w = CSVWriter(p)
    w.append({"exp": "a", "d1": 0.5, "rmse": 1.0})
    # later rows: missing keys pad empty, extra keys are dropped — the
    # header is frozen at first write so old tables keep parsing
    w.append({"exp": "b", "rmse": 2.0, "new_metric": 9.0})
    with open(p, newline="") as f:
        rows = list(csv.DictReader(f))
    assert list(rows[0].keys()) == ["exp", "d1", "rmse"]
    assert rows[1]["exp"] == "b" and rows[1]["d1"] == "" \
        and rows[1]["rmse"] == "2.0"
    assert "new_metric" not in rows[1]


def test_wandb_stub_is_falsy_noop():
    stub = _WandbStub()
    assert not stub  # hot loops guard `if wandb:` to skip host fetches
    stub.log({"x": 1})
    stub.finish()
    # cfg=None (rank>0 path) and wandb.use=False both yield the stub
    assert not maybe_wandb(None)


def test_setup_logger_writes_training_log(tmp_path):
    logger = setup_logger(str(tmp_path), name="mvp_test_sink")
    logger.info("hello-sink")
    for h in logger.handlers:
        if isinstance(h, logging.FileHandler):
            h.flush()
    log = (tmp_path / "training.log").read_text()
    assert "hello-sink" in log
    # idempotent: re-setup must not duplicate handlers
    n = len(logger.handlers)
    assert len(setup_logger(str(tmp_path), name="mvp_test_sink").handlers) == n
    assert not os.path.exists(tmp_path / "training.log.1")

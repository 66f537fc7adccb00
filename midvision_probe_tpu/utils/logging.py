"""Observability sinks (reference: loguru console+file, W&B, append-only CSV
result tables — SURVEY §5).

* ``setup_logger`` — console + per-experiment ``training.log``
  (``train_depth.py:603-607``),
* ``CSVWriter`` — append-only result rows with experiment-metadata columns
  (``train_depth.py:742-829``); header written once, later rows aligned to it,
* ``maybe_wandb`` — real wandb when importable & enabled, else a no-op stub
  (the environment has no wandb and zero egress).
"""

from __future__ import annotations

import csv
import logging
import os
import sys
from typing import Any, Mapping


def setup_logger(exp_dir: str | None = None, name: str = "mvp") -> logging.Logger:
    logger = logging.getLogger(name)
    if logger.handlers:
        return logger
    logger.setLevel(logging.INFO)
    fmt = logging.Formatter(
        "%(asctime)s | %(levelname)s | %(message)s", "%H:%M:%S"
    )
    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if exp_dir:
        os.makedirs(exp_dir, exist_ok=True)
        fh = logging.FileHandler(os.path.join(exp_dir, "training.log"))
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    logger.propagate = False
    return logger


class CSVWriter:
    """Append rows to a CSV, creating the header on first write."""

    def __init__(self, path: str):
        self.path = path
        parent = os.path.dirname(os.path.abspath(path))
        os.makedirs(parent, exist_ok=True)

    def append(self, row: Mapping[str, Any]) -> None:
        exists = os.path.exists(self.path)
        if exists:
            with open(self.path, newline="") as f:
                header = next(csv.reader(f), None)
        else:
            header = None
        if header is None:
            header = list(row.keys())
            with open(self.path, "w", newline="") as f:
                w = csv.DictWriter(f, fieldnames=header)
                w.writeheader()
                w.writerow({k: row.get(k, "") for k in header})
            return
        with open(self.path, "a", newline="") as f:
            w = csv.DictWriter(f, fieldnames=header, extrasaction="ignore")
            w.writerow({k: row.get(k, "") for k in header})


class _WandbStub:
    run = None

    def __bool__(self):
        # falsy so hot loops can guard ``if wandb:`` — a per-step
        # ``float(loss)`` host fetch for a no-op log would otherwise
        # serialize async dispatch (one tunnel RTT per train step)
        return False

    def log(self, *a, **k):
        pass

    def finish(self, *a, **k):
        pass


def maybe_wandb(cfg) -> Any:
    use = bool(cfg.get_path("wandb.use", False)) if hasattr(cfg, "get_path") else False
    if not use:
        return _WandbStub()
    try:
        import wandb

        wandb.init(
            project=cfg.get_path("experiment_name", "midvision-probe-tpu"),
            config=dict(cfg),
        )
        return wandb
    except Exception as e:
        # never let a half-working wandb kill a run, but say so loudly —
        # a silent stub looks like logging worked (ADVICE r2)
        import logging as _logging

        _logging.getLogger("midvision_probe_tpu").warning(
            "wandb.use=True but wandb init failed (%s: %s) — falling back "
            "to a no-op stub; nothing will be logged to W&B",
            type(e).__name__, e,
        )
        return _WandbStub()

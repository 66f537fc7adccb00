#!/usr/bin/env python
"""End-of-round artifact pass, as ONE resumable command.

Round 4's lesson (VERDICT r4 weak #6): tail steps scheduled "for later"
(cron hopes, manual runbooks) silently expire with the round. This script
executes the whole tail eagerly and in order, appending per-step status to
``logs/round_tail_r5.log`` so an interrupted tail shows exactly where it
stopped. Steps (each skippable via ``--steps``):

  retry    — re-invoke the main suite pass (resume semantics: only
             non-green cells run, e.g. a timed-out cell)
  extras   — objectness/taskonomy/maskcut columns on the two
             representative models (VERDICT r4 next #3)
  preset   — depth/snorm dpt-192-hd256 preset cells on 5 depth families
             + 2 snorm families (VERDICT r4 next #4)
  hard     — hardened geometric eval columns (navi_hard/scannet_hard/
             percepture_hard) across the backbone list (VERDICT r4
             next #7); ``--hard-models`` trims the list when the clock
             is short
  matrix   — first real bench_matrix run (+ immediate re-check against
             the freshly stored expectations; VERDICT r4 next #5)
  bench    — headline bench.py JSON line
  report   — archive CSVs, regenerate suite report + ranking tables
  pytest   — full test suite (CPU; run LAST: the 1-core host would
             inflate measured cell walls)
  drill    — weights-landing drill (fabricate + convert + golden-verify;
             VERDICT r4 next #9)

Usage:
    python launch_script/round_tail.py                  # everything
    python launch_script/round_tail.py --steps hard report
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOG = os.path.join(REPO, "logs", "round_tail_r5.log")

PRESET_DEPTH_MODELS = ["dino_b16", "beit-v2_vitb16", "croco_b16",
                       "mocov3_b14", "simclr_resnet50"]
PRESET_SNORM_MODELS = ["dino_b16", "simclr_resnet50"]
EXTRAS_MODELS = ["dino_b16", "simclr_resnet50"]


def _log(msg: str) -> None:
    line = f"{time.strftime('%H:%M:%S')} [tail] {msg}"
    print(line, flush=True)
    os.makedirs(os.path.dirname(LOG), exist_ok=True)
    with open(LOG, "a") as f:
        f.write(line + "\n")


def _run(name: str, cmd: list[str], timeout: float | None = None) -> int:
    _log(f"step {name}: {' '.join(cmd)}")
    t0 = time.time()
    try:
        rc = subprocess.call(cmd, cwd=REPO, timeout=timeout)
    except subprocess.TimeoutExpired:
        rc = 124
    _log(f"step {name}: rc={rc} in {time.time() - t0:.0f}s")
    return rc


def main(argv=None) -> int:
    all_steps = ["retry", "extras", "preset", "hard", "matrix", "bench",
                 "report", "pytest", "drill"]
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", nargs="*", default=all_steps,
                    choices=all_steps)
    ap.add_argument("--hard-models", nargs="*", default=None,
                    help="backbones for the hard eval pass "
                         "(default: the full sweep list)")
    args = ap.parse_args(argv)
    py = sys.executable
    suite = [py, "launch_script/suite_run.py"]
    rcs = {}

    if "retry" in args.steps:
        rcs["retry"] = _run("retry", suite)
    if "extras" in args.steps:
        rcs["extras"] = _run(
            "extras", suite + ["--tasks", "objectness", "taskonomy",
                               "maskcut", "--models"] + EXTRAS_MODELS)
    if "preset" in args.steps:
        rcs["preset_depth"] = _run(
            "preset-depth", suite + ["--tasks", "depth_dpt192",
                                     "--models"] + PRESET_DEPTH_MODELS)
        rcs["preset_snorm"] = _run(
            "preset-snorm", suite + ["--tasks", "snorm_dpt192",
                                     "--models"] + PRESET_SNORM_MODELS)
    if "hard" in args.steps:
        cmd = suite + ["--tasks", "navi_hard", "scannet_hard",
                       "percepture_hard"]
        if args.hard_models:
            cmd += ["--models"] + args.hard_models
        rcs["hard"] = _run("hard", cmd)
    if "matrix" in args.steps:
        rcs["matrix"] = _run(
            "matrix", [py, "launch_script/bench_matrix.py",
                       "--out", "logs/bench_matrix_r5.json"])
        # a first run only writes expectations; the same-session re-check
        # (VERDICT r4 next #5's done-condition) must exit rc=0 against them
        rcs["matrix_recheck"] = _run(
            "matrix-recheck", [py, "launch_script/bench_matrix.py",
                               "--out", "logs/bench_matrix_r5_recheck.json"])
    if "bench" in args.steps:
        rcs["bench"] = _run("bench", [py, "bench.py"])
    if "report" in args.steps:
        sys.path.insert(0, os.path.join(REPO, "launch_script"))
        import suite_run
        suite_run.archive_csvs("logs/suite_r5")
        _log("archived CSVs -> logs/suite_r5/csv")
        rcs["report"] = _run("report", suite + ["--report-only"])
        rcs["tables"] = _run(
            "tables", [py, "launch_script/aggregate_results.py"])
    if "pytest" in args.steps:
        rcs["pytest"] = _run(
            "pytest", [py, "-m", "pytest", "tests/", "-q",
                       "--durations=10"], timeout=3600)
    if "drill" in args.steps:
        # the fabricated source-layout checkpoints live outside git and a
        # host reboot can wipe them — re-fabricate before the drill
        env = dict(os.environ, MVP_CHECKPOINT_DIR="checkpoints",
                   JAX_PLATFORMS="cpu")
        if not os.path.isdir(os.path.join(REPO, "checkpoints")):
            _log("step drill: fabricating source-layout checkpoints")
            rcs["drill_fab"] = subprocess.call(
                [py, "data_processing/make_source_layout_checkpoints.py"],
                cwd=REPO, env=env)
        _log("step drill: convert_checkpoints --all "
             "-> logs/landing_drill_r6.log")
        with open(os.path.join(REPO, "logs", "landing_drill_r6.log"),
                  "w") as f:
            rcs["drill"] = subprocess.call(
                [py, "data_processing/convert_checkpoints.py", "--all"],
                cwd=REPO, env=env, stdout=f, stderr=subprocess.STDOUT)
        _log(f"step drill: rc={rcs['drill']}")
    bad = {k: v for k, v in rcs.items() if v != 0}
    _log(f"DONE: {len(rcs)} steps, failures: {bad or 'none'}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())

#!/usr/bin/env python
"""Sweep-level scaling demonstration on the virtual CPU mesh (VERDICT r2 #1b).

The reference parallelizes its 20-backbone suite as independent SLURM jobs
(``launch_script/launch_depth.py``); our ``sweep.py --parallel N`` is the
TPU-pod analog — N driver subprocesses, each of which would own one chip
(or one mesh slice) on real hardware. With only one physical chip available
this demo runs N CPU-backed driver subprocesses through the REAL sweep
runner and real drivers (synthetic data, tiny backbone) and measures the
suite wall-clock at parallel = 1 / 4 / 8.

What this does and does not show: it validates that the sweep runner's
process orchestration scales (no serialization, no shared-state contention
in logs/CSV emission) and measures the orchestration overhead. It does NOT
measure chip-level throughput — CPU subprocesses share host cores, so the
speedup here is a LOWER bound on what independent chips give (on a v4-8,
per-chip compute does not contend). The honest v4-8 projection therefore
combines the measured per-backbone single-chip times (suite_timing_r4.md)
with the job-parallel structure demonstrated here.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    # CPU-only subprocess env: without PALLAS_AXON_POOL_IPS the boot shim
    # never registers the axon (TPU tunnel) backend, so all N subprocesses
    # genuinely run on host CPU and never contend for the single real chip.
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    os.environ["JAX_PLATFORMS"] = "cpu"

    import sweep

    n_jobs = 8
    models = ["test_tiny"] * n_jobs
    base = [
        "--task", "depth", "--models", *models,
        "--log-dir", "/tmp/sweep_demo_logs", "--no-fast",
        "--extra",
        "dataset=synthetic", "dataset.num_instances=32", "batch_size=8",
        "probe=depth_linear", "optimizer=one_epoch", "wandb.use=False",
    ]
    rows = []
    for par in (1, 4, 8):
        t0 = time.time()
        # per-parallelism output dir (appended to the --extra list):
        # concurrent identical jobs sharing one exp_dir/CSV would
        # interleave writes and muddy the isolation the demo claims
        rc = sweep.main(base + [f"output_dir=/tmp/sweep_demo_out_p{par}",
                                "--parallel", str(par)])
        dt = time.time() - t0
        rows.append((par, dt, rc))
        print(f"[demo] parallel={par}: {dt:.1f}s rc={rc}", flush=True)

    t1 = rows[0][1]
    lines = [
        "# Sweep-level scaling demo (8 jobs, virtual CPU, real drivers)",
        "",
        f"{n_jobs} x `train_depth.py backbone=test_tiny dataset=synthetic` "
        "through `launch_script/sweep.py --parallel N`:",
        "",
        "| parallel | wall-clock s | speedup | all green |",
        "|---|---|---|---|",
    ]
    for par, dt, rc in rows:
        lines.append(f"| {par} | {dt:.1f} | {t1/dt:.2f}x | "
                     f"{'yes' if rc == 0 else 'NO'} |")
    ncpu = os.cpu_count() or 1
    lines += [
        "",
        f"Host has {ncpu} CPU core(s): with fewer cores than jobs the "
        "compute is time-shared and parallel N cannot beat serial — the "
        "demo's evidentiary value is (a) all jobs green under concurrent "
        "execution (no shared-state contention in logs/CSV/checkpoints) "
        "and (b) orchestration overhead = parallel-N wall-clock minus "
        "serial wall-clock. On a v4-8 each job owns a chip, so suite time "
        "= per-chip measured time (suite_timing_r4.md) / min(jobs, chips) "
        "+ the overhead measured here.",
    ]
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                       "logs", "sweep_scaling_r4.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))
    return 0 if all(rc == 0 for _, _, rc in rows) else 1


if __name__ == "__main__":
    raise SystemExit(main())

#!/usr/bin/env python
"""One-command full-suite run (VERDICT r3 next #1).

Executes the COMPLETE product the reference ships — the reference's
depth-sweep backbone list (``launch_depth.py:22-51``, 28 families) crossed
with all six evaluation task families — as real driver subprocesses on the
real chip, fast preset, synthetic data, producing the full CSV artifact
set the reference's pipelines emit (``train_depth.py:806-829`` et al.)
plus a measured-vs-projected wall-clock table.

Per-(task, model) rows persist incrementally to ``<log-dir>/suite_rows.json``
so an interrupted suite resumes where it stopped (``--resume``, default on).

Usage:
    python launch_script/suite_run.py                     # everything
    python launch_script/suite_run.py --tasks depth navi  # subset
    python launch_script/suite_run.py --models dino_b16 mae_b16
    python launch_script/suite_run.py --report-only       # md from rows
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sweep import DEFAULT_MODELS, subprocess_env  # noqa: E402

SUITE_OUT = "/tmp/mvp_suite_r5"  # overridable via --suite-out (smokes must
                                 # not pollute the real run's CSV artifacts)

# task -> (driver, overrides). Trained probes use the fast preset
# (linear probe + cached features + bf16, BASELINE.md suite levers) at the
# protocol 480 resolution; eval tasks use the synthetic geometric datasets
# at 224 (divisible by both patch 14 and 16 families).
FAST = ["system.cache_features=true", "system.backbone_dtype=bfloat16",
        "system.probe_dtype=bfloat16"]
TRAIN_COMMON = ["dataset=synthetic", "dataset.num_instances=64",
                "dataset.image_size=[480,480]", "optimizer=ten_epoch",
                "batch_size=32", "+backbone.return_multilayer=True",
                "wandb.use=False", "+render_images=False"] + FAST


# beyond the 6 headline families: the remaining reference driver families.
# NOT in the default task list (168-cell main pass stays the artifact the
# projection priced); run explicitly on a representative subset, e.g.
#   suite_run.py --tasks objectness taskonomy maskcut \
#                --models dino_b16 simclr_resnet50
# depth_dpt192/snorm_dpt192 are the credible <1 h preset columns
# (logs/fast_preset_ab_r5.md arm dpt-192-hd256: DPT decoder at hidden_dim
# 256, full schedule, train 192², eval-only reload at protocol 480²) —
# the preset the A/B recommends, vs the fast-linear main-pass default the
# A/B disqualifies for accuracy work (δ1 −0.0086 vs −0.36).
EXTRA_TASKS = ("objectness", "taskonomy", "maskcut",
               "depth_dpt192", "snorm_dpt192",
               "navi_hard", "scannet_hard", "percepture_hard")


def _at_size(overrides: list, size: int) -> list:
    return [f"dataset.image_size=[{size},{size}]"
            if o.startswith("dataset.image_size=") else o
            for o in overrides]


def task_plan(spair_root: str) -> dict:
    return {
        "depth": ("train_depth.py",
                  TRAIN_COMMON + ["probe=depth_linear"]),
        "snorm": ("train_snorm.py",
                  TRAIN_COMMON + ["probe=snorm_linear"]),
        "navi": ("evaluate_navi_correspondence.py",
                 ["dataset=synthetic_navi", "dataset.num_instances=16",
                  "dataset.image_size=224", "num_corr=100",
                  "batch_pairs=4", "scale_factor=0.25"]),
        "scannet": ("render_scannet_correspondence.py",
                    ["dataset=synthetic_scannet", "dataset.num_instances=8",
                     "dataset.image_hw=[224,224]", "num_corr=100",
                     "batch_pairs=2", "scale_factor=0.25"]),
        "spair": ("evaluate_spair_correspondence.py",
                  [f"data_root={spair_root}", "image_size=480",
                   "num_instances=8", "batch_pairs=4"]),
        "percepture": ("evaluate_model_percepture.py",
                       ["dataset=synthetic_twoafc",
                        "dataset.num_instances=64",
                        "dataset.image_size=[224,224]", "batch_size=32"]),
        # ---- EXTRA_TASKS (explicit --tasks only) ----
        "objectness": ("train_generic_objectness.py",
                       ["dataset=synthetic_voc", "dataset.num_instances=64",
                        "dataset.image_size=[480,480]",
                        "optimizer=ten_epoch", "batch_size=32",
                        "+backbone.return_multilayer=True",
                        "wandb.use=False"] + FAST),
        "taskonomy": ("train_taskonomy.py",
                      ["dataset=taskonomy", "+dataset.num_instances=64",
                       "+dataset.image_size=[480,480]",
                       "optimizer=ten_epoch", "batch_size=32",
                       "+backbone.return_multilayer=True",
                       "wandb.use=False"] + FAST),
        "maskcut": ("evaluate_generic_objectness.py",
                    ["dataset=synthetic_voc", "dataset.num_instances=8",
                     "dataset.image_size=[224,224]",
                     "maskcut.fixed_size=224", "max_images=8"]),
        # ---- hardened geometric eval columns (explicit --tasks only):
        # the easy synthetic sets saturate (NAVI 99+, ScanNet 100, 2AFC
        # 1.0 for every backbone — VERDICT r4 weak #3); the *_hard
        # datasets add view-dependent shading, periodic-texture ambiguity,
        # occlusion, and (2AFC) shift-vs-blend triplets so rankings spread
        # and a matcher regression moves the numbers. Same shapes as the
        # easy cells -> they ride the same compiled programs (cheap).
        "navi_hard": ("evaluate_navi_correspondence.py",
                      ["dataset=synthetic_navi_hard",
                       "dataset.num_instances=16",
                       "dataset.image_size=224", "num_corr=100",
                       "batch_pairs=4", "scale_factor=0.25"]),
        "scannet_hard": ("render_scannet_correspondence.py",
                         ["dataset=synthetic_scannet_hard",
                          "dataset.num_instances=8",
                          "dataset.image_hw=[224,224]", "num_corr=100",
                          "batch_pairs=2", "scale_factor=0.25"]),
        "percepture_hard": ("evaluate_model_percepture.py",
                            ["dataset=synthetic_twoafc_hard",
                             "dataset.num_instances=64",
                             "dataset.image_size=[224,224]",
                             "batch_size=32"]),
        # ---- dpt-192-hd256 preset columns (explicit --tasks only):
        # train at 192², then reload the fully-conv probe and eval at the
        # protocol 480² (fast_preset_ab.py arm mechanics, δ1 −0.0086)
        "depth_dpt192": ("train_depth.py",
                         _at_size(TRAIN_COMMON, 192)
                         + ["probe=depth_dpt192_hd256"], 480),
        "snorm_dpt192": ("train_snorm.py",
                         _at_size(TRAIN_COMMON, 192)
                         + ["probe=snorm_dpt192_hd256"], 480),
    }


def make_mini_spair(root: str, n_pairs: int = 4) -> str:
    """Miniature SPair-71k tree in the reference on-disk layout
    (reference ``evals/datasets/spair.py`` directory contract) — synthetic
    stand-in for the real archive (zero egress), same schema as the
    layout-test fixture (tests/test_spair.py)."""
    import numpy as np
    from PIL import Image

    if os.path.exists(os.path.join(root, "PairAnnotation", "test")):
        return root
    rng = np.random.RandomState(8)
    classes = {"cat": 8, "dog": 12, "chair": 9}
    os.makedirs(os.path.join(root, "PairAnnotation", "test"), exist_ok=True)
    pid = 0
    for cls, cid in classes.items():
        for d in ("JPEGImages", "Segmentation", "ImageAnnotation"):
            os.makedirs(os.path.join(root, d, cls), exist_ok=True)
        views = [f"v{i}" for i in range(n_pairs + 1)]
        for v in views:
            img = (rng.rand(96, 128, 3) * 255).astype(np.uint8)
            Image.fromarray(img).save(
                os.path.join(root, "JPEGImages", cls, f"{v}.jpg"))
            seg = np.zeros((96, 128), np.uint8)
            seg[16:80, 16:96] = cid
            Image.fromarray(seg).save(
                os.path.join(root, "Segmentation", cls, f"{v}.png"))
            kps = {str(k): [int(20 + 10 * k + rng.randint(8)),
                            int(24 + 8 * k + rng.randint(8))]
                   for k in range(4)}
            kps["4"] = None
            json.dump({"filename": f"{v}.jpg", "kps": kps},
                      open(os.path.join(root, "ImageAnnotation", cls,
                                        f"{v}.json"), "w"))
        for i in range(n_pairs):
            pair = {
                "filename": f"pair-{views[i]}-{views[i + 1]}:{cls}",
                "category": cls,
                "viewpoint_variation": i % 3,
                "src_bndbox": [16, 16, 96, 80],
                "trg_bndbox": [16, 16, 96, 80],
                "trg_imsize": [128, 96],
            }
            json.dump(pair, open(os.path.join(
                root, "PairAnnotation", "test", f"p{pid}.json"), "w"))
            pid += 1
    return root


def wait_for_backend(max_wait_s: float = 4 * 3600,
                     probe_timeout_s: int = 300) -> bool:
    """After a cell timeout, make sure the TPU backend is actually alive
    before burning more 2400 s cell budgets — an axon tunnel outage (r3:
    14 h) would otherwise eat the whole suite. Probes jax.devices() in a
    bounded subprocess (the hang is uninterruptible inside the tunnel RPC,
    bench.py:50-70) and retries until the tunnel answers or max_wait_s."""
    t0 = time.time()
    while True:
        try:
            pre = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=probe_timeout_s, capture_output=True)
            if pre.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        waited = time.time() - t0
        if waited > max_wait_s:
            return False
        print(f"[suite] backend unreachable after a cell timeout — "
              f"retrying probe (waited {waited:.0f}s)", flush=True)
        time.sleep(120)


def run_one(task: str, driver: str, model: str, overrides: list,
            log_dir: str, eval_size: int | None = None) -> dict:
    out_dir = os.path.join(SUITE_OUT, task)
    env = subprocess_env()
    os.makedirs(os.path.join(log_dir, task), exist_ok=True)
    log_path = os.path.join(log_dir, task, f"{model}.log")
    t0 = time.time()

    def _phase(phase_overrides: list, outdir: str, log) -> int:
        cmd = [sys.executable, os.path.join(REPO, driver),
               f"backbone={model}", f"output_dir={outdir}"] + phase_overrides
        # bounded: a wedged tunnel compile must not stall the whole suite
        # (fresh B-sized compiles are <10 min; 40 min is pathological).
        # Two-phase preset cells pay TWO fresh compiles (the 192² train
        # program and the 480² eval program are distinct compile classes),
        # so each phase gets a wider budget.
        budget = 2400 if eval_size is None else 3600
        try:
            return subprocess.call(cmd, stdout=log,
                                   stderr=subprocess.STDOUT,
                                   env=env, cwd=REPO, timeout=budget)
        except subprocess.TimeoutExpired:
            log.write(f"\n[suite] KILLED: exceeded {budget} s cell budget\n")
            return 124

    with open(log_path, "w") as log:
        if eval_size is None:
            ret = _phase(overrides, out_dir, log)
        else:
            # two-phase preset cell (fast_preset_ab.py arm mechanics,
            # logs/fast_preset_ab_r5.md): train at the reduced size into a
            # per-model dir (exp_name embeds the zoo checkpoint name, so a
            # shared dir would make the ckpt glob ambiguous), then reload
            # the fully-convolutional probe and run the driver's eval-only
            # path (+is_eval +ckpt_path, train_depth.py:65-71) at the
            # protocol size, appending to the shared task CSV.
            train_dir = os.path.join(out_dir, f"train_{model}")
            ret = _phase(overrides, train_dir, log)
            if ret == 0:
                ckpts = sorted(
                    glob.glob(os.path.join(train_dir, "*", "ckpt")))
                if not ckpts:
                    log.write(f"\n[suite] no checkpoint under {train_dir}\n")
                    ret = 1
                else:
                    ret = _phase(
                        _at_size(overrides, eval_size)
                        + ["+is_eval=True", f"+ckpt_path={ckpts[-1]}"],
                        out_dir, log)
    return {"task": task, "model": model, "rc": ret,
            "wall_s": round(time.time() - t0, 1), "ts": round(t0, 1)}


def compile_identity(task: str, model: str) -> tuple:
    """The (program, architecture) class a cell's tunnel compile is keyed
    by. Two cells share a compile iff BOTH match: the driver program
    (input size and batch differ per task, so each task is its own
    program class — depth and snorm share the batch-32@480 backbone
    extract but not the probe step, so they are kept separate too) and
    the backbone architecture (croco vs crocov2 differ by RoPE;
    beit/midas are fixed-input; b14 is a distinct token grid). The r4
    report reset first-of-arch per task AND merged croco+crocov2,
    producing a fresh-median < cached-median inversion (VERDICT r4
    weak #5). The *_hard eval tasks change only the data, never the
    shapes, so they share the easy task's program class."""
    task = task.removesuffix("_hard")
    if model.startswith("crocov2"):
        arch = "crocov2"
    elif model.startswith("croco"):
        arch = "croco"
    elif "beit" in model or "midas" in model:
        arch = "beit"
    elif "resnet50" in model:
        arch = "resnet50"
    elif "b14" in model:
        arch = "b14"
    else:
        arch = "b16"
    return (task, arch)


def write_report(rows: list, out_md: str, log_dir: str,
                 expected_models: list | None = None):
    tasks = sorted({r["task"] for r in rows})
    models = []
    for r in rows:  # preserve run order
        if r["model"] not in models:
            models.append(r["model"])
    by = {(r["task"], r["model"]): r for r in rows}
    total_s = sum(r["wall_s"] for r in rows)
    n_fail = sum(1 for r in rows if r["rc"] != 0)

    lines = [
        "# Full-suite run — every backbone x every task family, one command",
        "",
        f"`python launch_script/suite_run.py` — {len(models)} backbones "
        f"(the reference depth-sweep list, launch_depth.py:22-51) x "
        f"{len(tasks)} task families, fast preset, synthetic data, real "
        "TPU v5e (single chip, serial). Cells are wall seconds per driver "
        "subprocess (compile+data+train/eval+CSV); **F** = nonzero exit.",
        "",
        "| backbone | " + " | ".join(tasks) + " |",
        "|---" * (len(tasks) + 1) + "|",
    ]
    for m in models:
        cells = []
        for t in tasks:
            r = by.get((t, m))
            cells.append("—" if r is None else
                         (f"{r['wall_s']:.0f}" if r["rc"] == 0
                          else f"**F**({r['wall_s']:.0f})"))
        lines.append(f"| {m} | " + " | ".join(cells) + " |")
    per_task = {t: sum(r["wall_s"] for r in rows if r["task"] == t)
                for t in tasks}
    lines += [
        "",
        f"**Total observed wall-clock: {total_s / 3600:.2f} h** "
        f"({len(rows)} runs, {n_fail} failures). Per task: "
        + ", ".join(f"{t} {s / 3600:.2f} h" for t, s in per_task.items())
        + ".",
        "",
        "## Measured vs projected",
        "",
        "The r4 projection (logs/suite_timing_r4.md) priced the trained-"
        "probe suite from per-step times only. This run adds what the "
        "projection could not see: per-run orchestration overhead "
        "(python+jax startup, tunnel compile, loader setup, CSV/report "
        "emission) measured per family, and proves the whole artifact "
        "pipeline end-to-end — every cell above appended its row to the "
        "task CSV (archived under logs/suite_r5/csv/).",
        "",
        "Per task (green cells only; *fresh* = the first cell of each "
        "compile-identity class — (task program, architecture), tracked "
        "over the WHOLE run order — paying the tunnel compile; *cached* "
        "= later same-class cells riding the persistent compile cache. "
        "Cells flagged in `cold_cache_cells.json` (the recompiles right "
        "after a host reboot wiped /tmp's cache) seed the identity set: "
        "they are what today's cache holds for the legacy rows. "
        "Only cells with a runner-recorded start time are attributed: "
        "the r4 cells predate the `ts` field and their true order is "
        "unrecoverable (mid-run restarts and a host reboot also "
        "invalidated compile caches between them), so they appear in "
        "the totals but not in the fresh/cached medians:",
        "",
        "| task | cells | fresh | fresh med s | cached med s | "
        "min..max s | total h |",
        "|---|---|---|---|---|---|---|",
    ]

    def _median(xs):
        return sorted(xs)[len(xs) // 2] if xs else float("nan")

    # fresh/cached split, attributed globally over the run order (rows
    # persist in run order; `ts` disambiguates resumed runs). Cells known
    # to have run against a reboot-wiped compile cache are flagged in a
    # sidecar (the live runner rewrites suite_rows.json per cell, so the
    # flag cannot live in the rows themselves).
    cold_path = os.path.join(log_dir, "cold_cache_cells.json")
    cold = (set(map(tuple, json.load(open(cold_path))))
            if os.path.exists(cold_path) else set())
    fresh_by_task: dict = {t: [] for t in tasks}
    cached_by_task: dict = {t: [] for t in tasks}
    # the cold cells are the post-reboot recompiles — the programs they
    # built are what today's persistent cache holds for the legacy rows,
    # so their identities count as already-compiled for new cells
    seen_identity: set = {compile_identity(t, m) for t, m in cold}
    fresh_wall_by_identity: dict = {}
    anomalies: list = []
    ordered = sorted((r for r in rows if r["rc"] == 0 and "ts" in r),
                     key=lambda r: r["ts"])
    for r in ordered:
        ident = compile_identity(r["task"], r["model"])
        if (ident not in seen_identity or r.get("cold_cache")
                or (r["task"], r["model"]) in cold):
            fresh_by_task[r["task"]].append(r["wall_s"])
            fresh_wall_by_identity.setdefault(ident, r["wall_s"])
        else:
            cached_by_task[r["task"]].append(r["wall_s"])
            # a cached-class cell FAR slower than its class's own fresh
            # compile = a server-side cache eviction / tunnel hiccup
            # (observed live: maskfeat depth paid 22 min inside a warm
            # b16 class). Surface these so the table's cache claim is
            # not silently contradicted by its inputs. 2x + 2 min keeps
            # ordinary eval-wall jitter out of the list.
            fw = fresh_wall_by_identity.get(ident)
            if fw is not None and r["wall_s"] > max(2 * fw, fw + 120):
                anomalies.append(
                    f"{r['task']}/{r['model']} {r['wall_s']:.0f}s "
                    f"(class fresh {fw:.0f}s)")
        seen_identity.add(ident)

    for t in tasks:
        ok_rows = [r for r in rows if r["task"] == t and r["rc"] == 0]
        if not ok_rows:
            continue
        fresh, cachd = fresh_by_task[t], cached_by_task[t]
        walls = [r["wall_s"] for r in ok_rows]
        lines.append(
            f"| {t} | {len(ok_rows)} | {len(fresh)} | "
            + (f"{_median(fresh):.0f}" if fresh else "—") + " | "
            + (f"{_median(cachd):.0f}" if cachd else "—")
            + f" | {min(walls):.0f}..{max(walls):.0f} | "
            f"{sum(walls) / 3600:.2f} |")

    med = sorted(r["wall_s"] for r in rows if r["rc"] == 0)
    if med:
        lines += [
            "",
            f"Median per-run wall {med[len(med) // 2]:.0f} s; the NYU-scale "
            "fast-preset projection (0.49 h on v4-8) therefore gains "
            f"~{len(models) * 2 * med[len(med) // 2] / 3600 / 4:.2f} h of "
            "per-run overhead when priced per job on 4 chips "
            "(overheads overlap chip compute when jobs are pipelined, so "
            "this is an upper bound). The cached-vs-fresh gap above is the "
            "measured value of the persistent compile cache the projection "
            "assumed implicitly: one compile per architecture class, not "
            "per run.",
        ]
    if anomalies:
        lines += [
            "",
            f"Cache anomalies ({len(anomalies)}): cached-class cells "
            "slower than their class's fresh compile — server-side cache "
            "evictions / tunnel slowness, counted in the cached medians "
            "above:",
        ] + [f"- {a}" for a in anomalies]
    # pending/done visibility (VERDICT r4 weak #7): a zero-failure report
    # must not read as complete when cells simply never ran.
    main_tasks = [t for t in
                  ("depth", "snorm", "navi", "scannet", "spair",
                   "percepture")]
    exp_models = expected_models or DEFAULT_MODELS
    green = {(r["task"], r["model"]) for r in rows if r["rc"] == 0}
    pending = [(t, m) for m in exp_models for t in main_tasks
               if (t, m) not in green]
    lines += [
        "",
        f"## Remaining cells: {len(pending)} of "
        f"{len(exp_models) * len(main_tasks)} main-pass cells not yet green",
        "",
    ]
    if pending:
        by_model: dict = {}
        for t, m in pending:
            by_model.setdefault(m, []).append(t)
        lines += [f"- {m}: {', '.join(ts)}" for m, ts in by_model.items()]
    else:
        lines += ["All main-pass cells green — the suite artifact is "
                  "complete."]
    with open(out_md, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"[suite] report -> {out_md}")


def main(argv=None):
    global SUITE_OUT
    ap = argparse.ArgumentParser()
    ap.add_argument("--tasks", nargs="*", default=None)
    ap.add_argument("--models", nargs="*", default=None)
    ap.add_argument("--log-dir", default="logs/suite_r5")
    ap.add_argument("--out", default="logs/suite_run_r5.md")
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--report-only", action="store_true")
    ap.add_argument("--suite-out", default=SUITE_OUT)
    args = ap.parse_args(argv)
    SUITE_OUT = args.suite_out

    os.makedirs(args.log_dir, exist_ok=True)
    rows_path = os.path.join(args.log_dir, "suite_rows.json")
    rows = []
    if os.path.exists(rows_path) and not args.no_resume:
        rows = json.load(open(rows_path))

    if not args.report_only:
        spair_root = make_mini_spair("/tmp/mvp_suite_spair")
        plan = task_plan(spair_root)
        tasks = args.tasks or [t for t in plan if t not in EXTRA_TASKS]
        models = args.models or DEFAULT_MODELS
        done = {(r["task"], r["model"]) for r in rows if r["rc"] == 0}
        todo = [(t, m) for m in models for t in tasks
                if (t, m) not in done]
        print(f"[suite] {len(todo)} runs to go "
              f"({len(done)} already ok)", flush=True)
        for i, (t, m) in enumerate(todo):
            driver, overrides = plan[t][0], plan[t][1]
            eval_size = plan[t][2] if len(plan[t]) > 2 else None
            row = run_one(t, driver, m, overrides, args.log_dir, eval_size)
            rows = [r for r in rows
                    if not (r["task"] == t and r["model"] == m)] + [row]
            json.dump(rows, open(rows_path, "w"), indent=1)
            status = "ok" if row["rc"] == 0 else f"FAILED({row['rc']})"
            print(f"[suite] {i + 1}/{len(todo)} {t}/{m}: {status} "
                  f"in {row['wall_s']:.0f}s", flush=True)
            # outage guard on ANY failure, not just rc=124 timeouts: the
            # r3 axon outage presented BOTH as hung jax.devices() (cell
            # timeout) and as fast 'backend init failed UNAVAILABLE'
            # nonzero exits — in the fast-fail mode the old rc==124-only
            # guard churned through every remaining cell in minutes,
            # marking them all F. When the backend is actually up the
            # probe returns in seconds, so real product-bug failures only
            # pay one cheap probe before the suite moves on.
            if row["rc"] != 0 and not wait_for_backend():
                print("[suite] backend still down after max wait — "
                      "stopping (resume later)", flush=True)
                break
            # keep the report current so an interrupted suite still
            # leaves a coherent artifact (rows JSON + md regenerate)
            write_report(rows, args.out, args.log_dir)
            # archive the CSVs after EVERY cell, not just at loop end:
            # /tmp is volatile (a host reboot between babysit windows ate
            # the first 41 cells' CSV rows — only the per-cell logs kept
            # their metrics), and a timeout/interrupt never reaches a
            # loop-end archive step.
            archive_csvs(args.log_dir)

        archive_csvs(args.log_dir)

    write_report(rows, args.out, args.log_dir)
    return 1 if any(r["rc"] != 0 for r in rows) else 0


def archive_csvs(log_dir: str):
    """Copy the per-task CSV artifact set from the (volatile) suite output
    tree into the repo's log dir. Idempotent, cheap (a handful of small
    files), safe to call per cell."""
    csv_dir = os.path.join(log_dir, "csv")
    os.makedirs(csv_dir, exist_ok=True)
    for p in glob.glob(os.path.join(SUITE_OUT, "*", "*.csv")):
        shutil.copy(p, os.path.join(
            csv_dir, os.path.basename(os.path.dirname(p)) + "_"
            + os.path.basename(p)))


if __name__ == "__main__":
    raise SystemExit(main())

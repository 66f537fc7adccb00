#!/usr/bin/env python
"""Backbone-sweep launcher — TPU-native replacement for the reference's
submitit SLURM scripts (``launch_script/launch_depth.py`` etc.).

The reference submits one independent 2-GPU SLURM job per backbone; on TPU
the natural unit is one process per host driving the whole mesh, so this
runner executes the sweep as sequential (or ``--parallel N`` subprocess)
driver invocations, one per backbone, with per-run logs under ``logs/``.
The default model list is the reference's depth-sweep list
(``launch_depth.py:22-51``).

Usage:
    python launch_script/sweep.py --task depth --models dino_b16 mae_b16
    python launch_script/sweep.py --task snorm            # full list
    python launch_script/sweep.py --task depth --extra dataset=navi_reldepth
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time
from concurrent.futures import ThreadPoolExecutor

# reference launch_depth.py:22-51
DEFAULT_MODELS = [
    "mocov3_resnet50", "crocov2_b16", "croco_b16", "barlowtwins_resnet50",
    "beit-v2_vitb16", "byol_resnet50", "clusterfit_resnet50",
    "deepcluster-v2-resnet50", "densecl_resnet50", "dino_b16", "eva_vitb16",
    "ibot_b16", "jigsaw_resnet50", "mae_b16", "maskfeat_vitb16",
    "milan_vitb16", "mocov2_resnet50", "mocov3_b14", "npid-plusplus_resnet50",
    "pirl_resnet50", "pixmlm_vitb16", "rotnet_resnet50", "simsiam_resnet50",
    "sela-v2_resnet50", "simclr_resnet50", "swav_resnet50", "npid_resnet50",
    "dino_resnet50",
]

DRIVERS = {
    "depth": "train_depth.py",
    "snorm": "train_snorm.py",
    "objectness": "train_generic_objectness.py",
    "taskonomy": "train_taskonomy.py",
    "spair": "evaluate_spair_correspondence.py",
    "navi": "evaluate_navi_correspondence.py",
    "scannet": "render_scannet_correspondence.py",
    "percepture": "evaluate_model_percepture.py",
    "maskcut": "evaluate_generic_objectness.py",
}


def subprocess_env() -> dict:
    """Environment for driver subprocesses, with shared cross-tile caches:
    every tile is its own subprocess, so without these each one regenerates
    the identical synthetic data (~110 s/tile on the 1-core host) and
    re-pays tunnel compiles for architectures an earlier tile already
    built. Shared by sweep.py and suite_run.py so the two launchers'
    cache paths cannot drift apart."""
    env = dict(os.environ)
    env.setdefault("MVP_SYNTH_DISK_CACHE", "/tmp/mvp_synth_cache")
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/mvp_jax_cache")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")
    return env


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", default="depth", choices=sorted(DRIVERS))
    ap.add_argument("--models", nargs="*", default=None)
    ap.add_argument("--extra", nargs="*", default=[],
                    help="extra key=value overrides for every run")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--log-dir", default="logs")
    ap.add_argument("--dry-run", action="store_true")
    ap.add_argument("--parallel", type=int, default=1, metavar="N",
                    help="run N driver subprocesses concurrently (use >1 on "
                         "CPU or when the chip is shared via cached "
                         "features; one TPU chip serializes compute anyway)")
    ap.add_argument("--no-fast", action="store_true",
                    help="disable the fast-suite defaults "
                         "(system.cache_features + bfloat16 backbone)")
    args = ap.parse_args(argv)

    models = args.models or DEFAULT_MODELS
    driver = DRIVERS[args.task]
    os.makedirs(os.path.join(args.log_dir, args.task), exist_ok=True)

    def run_one(model: str, idx: int = 0):
        tag = model if models.count(model) == 1 else f"{model}.{idx}"
        overrides = [f"backbone={model}"]
        if args.task in ("depth", "snorm", "taskonomy"):
            overrides += ["+backbone.return_multilayer=True",
                          f"system.random_seed={args.seed}"]
            if not args.no_fast:
                # the <1 hr suite levers (BASELINE.md): extract frozen
                # features once per epoch-0 batch and reuse; bf16 backbone
                overrides += ["system.cache_features=true",
                              "system.backbone_dtype=bfloat16",
                              "system.probe_dtype=bfloat16"]
        overrides += list(args.extra)
        # absolute driver path: a bare filename only works from the repo
        # root, and a failed `python train_depth.py` exits 2 PER MODEL
        driver_path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            driver)
        cmd = [sys.executable, driver_path] + overrides
        log_path = os.path.join(args.log_dir, args.task, f"{tag}.log")
        print(f"[sweep] {' '.join(cmd)} -> {log_path}", flush=True)
        if args.dry_run:
            return model, 0, 0.0
        env = subprocess_env()
        t0 = time.time()
        with open(log_path, "w") as log:
            ret = subprocess.call(cmd, stdout=log, stderr=subprocess.STDOUT,
                                  env=env)
        dt = time.time() - t0
        status = "ok" if ret == 0 else f"FAILED ({ret})"
        print(f"[sweep] {model}: {status} in {dt:.0f}s", flush=True)
        return model, ret, dt

    t_suite = time.time()
    if args.parallel > 1:
        with ThreadPoolExecutor(max_workers=args.parallel) as pool:
            results = list(pool.map(run_one, models, range(len(models))))
    else:
        results = [run_one(m, i) for i, m in enumerate(models)]

    failures = [m for m, ret, _ in results if ret != 0]
    if not args.dry_run:
        print(f"[sweep] suite wall-clock: {time.time() - t_suite:.0f}s "
              f"({len(models)} models, parallel={args.parallel})")
    if failures:
        print(f"[sweep] {len(failures)} failures: {failures}")
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

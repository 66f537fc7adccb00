#!/usr/bin/env python
"""Per-family performance regression matrix (VERDICT r3 weak #5).

``bench.py`` regression-tracks one config (ViT-B dense extract); the perf
story spans several: R50/SAM/ConvNeXt extraction and the DPT/linear probe
steps. This script measures the whole set on the real chip, writes one
diffable JSON artifact per run, and FAILS (rc=1) when any row drifts
outside tolerance of the stored expectations — so a kernel or layout
change that silently regresses a non-headline family is caught the round
it lands.

Rows (name, config) and their r4 reference points
(`logs/suite_timing_r4.md`, BASELINE.md):
  * vitb16_extract      dino_vitb16 dense 4-tap bf16, batch 64 @480x640
                        (the bench.py protocol — ~511 imgs/s/chip)
  * resnet50_extract    simclr_resnet50 stages[1-4] bf16, batch 64 @480x480
  * sam_vitb_extract    sam_vit_b windowed ViTDet bf16, batch 16 @480x480
  * convnextb_extract   cnxt_b_in22k bf16, batch 64 @480x480
  * vitb16_dpt_step     full train step (extract+DPT+adamw) batch 32 @480²
                        (~264.9 ms r4)
  * vitb16_linear_step  probe-only cached step batch 32 @480² (~12.7 ms r4)

Usage:
    python launch_script/bench_matrix.py                 # measure + check
    python launch_script/bench_matrix.py --update        # rewrite expected
    python launch_script/bench_matrix.py --out logs/bench_matrix_r5.json

Expectations live in ``logs/bench_matrix_expected.json``; tolerance is
per-row (default ±15% — tunnel noise on one-off runs is ~5-8%).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

os.makedirs("/tmp/mvp_jax_cache", exist_ok=True)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/mvp_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from time_suite import measure_backbone, timeit  # noqa: E402

EXPECTED_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "logs", "bench_matrix_expected.json")

TOLERANCE = 0.15  # fraction of expected, both directions


def _extract_imgs_per_sec(name: str, batch: int, hw, **build_kw) -> float:
    from midvision_probe_tpu.models import zoo

    entry = zoo.ZOO[name]
    if entry.arch == "resnet":
        bb = zoo.build_resnet_extractor(
            name, return_multilayer=True, return_layers=[1, 2, 3, 4],
            dtype=jnp.bfloat16)
    else:
        bb = zoo.build_vit_extractor(
            name, return_multilayer=True, dtype=jnp.bfloat16,
            init_size=224, **build_kw)
    bb_vars = bb.device_variables  # jit ARG, not closure (tunnel 413s)

    @jax.jit
    def forward(variables, images):
        maps, _ = bb._apply_fn(variables, images)
        return [m.astype(jnp.float32) for m in maps]

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(batch, *hw, 3).astype(np.float32))
    dt = timeit(lambda im: forward(bb_vars, im), images, iters=10)
    return batch / dt


def measure(rows=None) -> dict:
    out = {}

    def want(key):
        return rows is None or key in rows

    if want("vitb16_extract"):
        out["vitb16_extract"] = {
            "value": round(_extract_imgs_per_sec(
                "dino_vitb16", 64, (480, 640)), 1),
            "unit": "imgs/s"}
    if want("resnet50_extract"):
        out["resnet50_extract"] = {
            "value": round(_extract_imgs_per_sec(
                "simclr_resnet50", 64, (480, 480)), 1),
            "unit": "imgs/s"}
    if want("sam_vitb_extract"):
        out["sam_vitb_extract"] = {
            "value": round(_extract_imgs_per_sec(
                "sam_vit_b", 16, (480, 480)), 1),
            "unit": "imgs/s"}
    if want("convnextb_extract"):
        out["convnextb_extract"] = {
            "value": round(_extract_imgs_per_sec(
                "cnxt_b_in22k", 64, (480, 480)), 1),
            "unit": "imgs/s"}
    if want("vitb16_dpt_step") or want("vitb16_linear_step"):
        # full-step (uncached) and probe-only (cached) times, batch 32 @480²
        # — the two suite-projection anchors (logs/suite_timing_r4.md)
        if want("vitb16_dpt_step"):
            _, _, t_full = measure_backbone(
                "dino_vitb16", 32, (480, 480), head_type="dpt",
                probe_dtype=jnp.bfloat16)
            out["vitb16_dpt_step"] = {"value": round(t_full * 1e3, 1),
                                      "unit": "ms", "lower_is_better": True}
        if want("vitb16_linear_step"):
            _, t_probe, _ = measure_backbone(
                "dino_vitb16", 32, (480, 480), head_type="linear",
                probe_dtype=jnp.bfloat16)
            out["vitb16_linear_step"] = {"value": round(t_probe * 1e3, 2),
                                         "unit": "ms",
                                         "lower_is_better": True}
    return out


def check(measured: dict, expected: dict, rows=None) -> list[str]:
    failures = []
    for key, exp in expected.items():
        if rows is not None and key not in rows:
            continue  # --rows subset: unrequested keys are not failures
        if key not in measured:
            failures.append(f"{key}: not measured")
            continue
        got, want = measured[key]["value"], exp["value"]
        lo, hi = want * (1 - TOLERANCE), want * (1 + TOLERANCE)
        # regressions only: faster extract (higher) / faster step (lower)
        # never fails
        if exp.get("lower_is_better"):
            ok = got <= hi
        else:
            ok = got >= lo
        status = "ok" if ok else "REGRESSED"
        print(f"  {key:22s} {got:>10} {exp['unit']}  "
              f"(expected {want}, bounds [{lo:.1f}, {hi:.1f}]) {status}")
        if not ok:
            failures.append(f"{key}: {got} vs expected {want} (±15%)")
    return failures


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None,
                    help="JSON artifact path (default logs/bench_matrix_"
                         "<timestamp>.json)")
    ap.add_argument("--update", action="store_true",
                    help="rewrite the expected file from this run")
    ap.add_argument("--rows", nargs="*", default=None,
                    help="subset of row keys to measure")
    args = ap.parse_args(argv)

    t0 = time.time()
    measured = measure(args.rows)
    measured["_meta"] = {
        "platform": jax.devices()[0].platform,
        "device": str(jax.devices()[0]),
        "wall_s": round(time.time() - t0, 1),
        "date": time.strftime("%Y-%m-%d %H:%M"),
    }

    out_path = args.out or os.path.join(
        "logs", f"bench_matrix_{time.strftime('%Y%m%d-%H%M')}.json")
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(measured, f, indent=1)
    print(f"[bench_matrix] wrote {out_path}")

    if args.update or not os.path.exists(EXPECTED_PATH):
        # merge into the existing expectations so a --rows subset update
        # refreshes only the measured keys instead of deleting every other
        # family's regression baseline
        expected = {}
        if os.path.exists(EXPECTED_PATH):
            with open(EXPECTED_PATH) as f:
                expected = json.load(f)
        expected.update(
            {k: v for k, v in measured.items() if k != "_meta"})
        with open(EXPECTED_PATH, "w") as f:
            json.dump(expected, f, indent=1)
        print(f"[bench_matrix] expectations written to {EXPECTED_PATH}")
        return 0

    with open(EXPECTED_PATH) as f:
        expected = json.load(f)
    failures = check(measured, expected, rows=args.rows)
    if failures:
        print(f"[bench_matrix] {len(failures)} regression(s): {failures}")
        return 1
    print("[bench_matrix] all rows within tolerance")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

#!/usr/bin/env python
"""Get a ViT-L-sized program through the axon tunnel (VERDICT r2 #5).

Round-2 state: ViT-L programs at batch 64 crashed remote_compile with
"Broken pipe" (CLAUDE.md), so no large model ever got a real-chip number.
This script climbs a ladder of (backbone, size, batch) rungs, each in its
OWN SUBPROCESS (a tunnel crash must not kill the ladder), with the
persistent compile cache on, and records imgs/s for every rung that
passes — or the exact failure per rung, giving the program-size threshold.

Usage:
    python launch_script/vitl_bench.py                  # run the ladder
    python launch_script/vitl_bench.py --single dinov2_vitl14 8 224 224
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

LADDER = [
    # (zoo name, batch, H, W) — small to large program size
    ("dinov2_vitl14", 8, 224, 224),
    ("dinov2_vitl14", 8, 476, 644),
    ("dinov2_vitl14", 32, 476, 644),
    ("dinov2_vitl14", 64, 476, 644),
    ("midas_l16", 8, 480, 640),      # BEiT-L DPT backbone (fixed input 384)
    ("deit3_vitl16", 32, 480, 640),
]


def run_single(name: str, batch: int, h: int, w: int) -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    os.makedirs("/tmp/mvp_jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/mvp_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from midvision_probe_tpu.models import zoo

    bb = zoo.build_vit_extractor(name, output="dense", return_multilayer=True,
                                 dtype=jnp.bfloat16, init_size=224)
    bb_vars = bb.device_variables

    @jax.jit
    def forward(variables, images):
        maps, _ = bb._apply_fn(variables, images)
        return jnp.sum(maps[-1][0, 0, 0].astype(jnp.float32))

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(batch, h, w, 3).astype(np.float32))
    t0 = time.perf_counter()
    chk = forward(bb_vars, images)
    v = float(chk)
    t_compile = time.perf_counter() - t0
    if not np.isfinite(v):
        print(f"RESULT {name} b{batch} {h}x{w}: NON-FINITE", flush=True)
        return 2
    # Both timing modes over-measure through the tunnel, differently:
    # per-iteration host fetches add one tunnel RTT per iter, while
    # enqueue-batch (one trailing fetch) can choke the axon queue into
    # absurd readings (CLAUDE.md hazard: a 42 ms kernel "measured" 22-90 s).
    # Each is an upper bound on true per-iter compute, so report the
    # tighter one and print both for the choke check.
    n_iters = 10
    t0 = time.perf_counter()
    for _ in range(n_iters):
        float(forward(bb_vars, images))
    dt_fetch = (time.perf_counter() - t0) / n_iters
    t0 = time.perf_counter()
    for _ in range(n_iters):
        chk = forward(bb_vars, images)
    float(chk)
    dt_batch = (time.perf_counter() - t0) / n_iters
    dt = min(dt_fetch, dt_batch)
    ips = batch / dt
    print(f"RESULT {name} b{batch} {h}x{w}: OK {ips:.1f} imgs/s "
          f"({dt*1e3:.1f} ms/it; per-iter-fetch {dt_fetch*1e3:.1f} / "
          f"enqueue-batch {dt_batch*1e3:.1f}, first-call {t_compile:.0f}s)",
          flush=True)
    return 0


def main(argv=None):
    if argv is None:
        argv = sys.argv[1:]
    if argv and argv[0] == "--single":
        name, batch, h, w = argv[1], int(argv[2]), int(argv[3]), int(argv[4])
        return run_single(name, batch, h, w)

    log_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                            "logs", "vitl_tpu_r4.log")
    lines = ["# ViT-L through the tunnel — ladder results (round 3)"]
    for name, batch, h, w in LADDER:
        cmd = [sys.executable, os.path.abspath(__file__), "--single",
               name, str(batch), str(h), str(w)]
        t0 = time.time()
        try:
            out = subprocess.run(cmd, capture_output=True, text=True,
                                 timeout=2400)
            res = [ln for ln in out.stdout.splitlines()
                   if ln.startswith("RESULT")]
            if res:
                line = res[0]
            else:
                tail = (out.stdout + out.stderr).strip().splitlines()[-3:]
                line = (f"RESULT {name} b{batch} {h}x{w}: FAILED "
                        f"rc={out.returncode} :: " + " | ".join(tail))
        except subprocess.TimeoutExpired:
            line = (f"RESULT {name} b{batch} {h}x{w}: TIMEOUT "
                    f"after {time.time()-t0:.0f}s")
        print(line, flush=True)
        lines.append(line)
        with open(log_path, "w") as f:
            f.write("\n".join(lines) + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

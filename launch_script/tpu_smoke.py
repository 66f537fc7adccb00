#!/usr/bin/env python
"""Real-TPU smoke: one forward per architecture family at eval-like sizes.

The headline bench only exercises dino_vitb16; this drives every
structurally distinct backbone path (fused+padded ViT, register tokens,
no-cls SigLIP, QuickGELU CLIP, RoPE CroCo, rel-pos BEiT, windowed SAM,
ConvNeXt, ResNet) through a jitted forward on the real chip and checks the
outputs are finite. ~2-4 min/backbone on a cold compile cache.

Usage: python launch_script/tpu_smoke.py [--batch 8] [--size 224]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

os.makedirs("/tmp/mvp_jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/mvp_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# one representative per structurally distinct forward path
FAMILIES = [
    "dino_vitb16",       # fused+padded ViT (learned pos)
    "dinov2_vitb14_reg", # register tokens + LayerScale
    "mae_vitb16",        # sincos2d pos
    "clip_vitb16",       # pre-norm, QuickGELU, bias-free patch
    "siglip_vitb16",     # no cls token
    "crocov2_vitb16",    # 2D RoPE (einsum path)
    "beitv2_vitb16",     # relative position bias (einsum path)
    "sam_vit_b",         # windowed ViTDet
    "cnxt_b_in22k",      # ConvNeXt
    "simclr_resnet50",   # ResNet
]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=224)
    ap.add_argument("--backbones", nargs="*", default=FAMILIES)
    ap.add_argument("--preflight-timeout", type=int, default=300,
                    help="seconds to wait for the TPU backend before "
                         "failing fast (a dead tunnel otherwise burns "
                         "~25 min of backend-init timeout PER FAMILY)")
    args = ap.parse_args(argv)

    # fast-fail preflight in a SUBPROCESS (backend init can hang
    # uninterruptibly inside the tunnel RPC; a thread can't be killed)
    import subprocess

    try:
        pre = subprocess.run(
            [sys.executable, "-c", "import jax; print(jax.devices())"],
            timeout=args.preflight_timeout, capture_output=True, text=True,
        )
    except subprocess.TimeoutExpired:
        print(f"PREFLIGHT FAIL: jax.devices() did not return within "
              f"{args.preflight_timeout}s — tunnel down? aborting smoke")
        return 2
    if pre.returncode != 0:
        print("PREFLIGHT FAIL: backend init errored — aborting smoke\n"
              + pre.stderr.strip()[-500:])
        return 2

    from midvision_probe_tpu.models import zoo

    rng = np.random.RandomState(0)
    failures = []
    for name in args.backbones:
        t0 = time.perf_counter()
        try:
            entry = zoo.ZOO[name]
            kw = dict(return_multilayer=True, dtype=jnp.bfloat16)
            if entry.arch == "resnet":
                bb = zoo.build_resnet_extractor(
                    name, return_layers=[1, 2, 3, 4], **kw)
            elif entry.arch == "convnext":
                bb = zoo.build_convnext_extractor(name, **kw)
            elif entry.arch == "sam":
                bb = zoo.build_sam_extractor(name, dtype=jnp.bfloat16)
            else:
                bb = zoo.build_vit_extractor(name, init_size=224, **kw)
            # SAM fixes its own input size; ViTs round --size to the patch
            # grid; convs (patch_size <= 1) take it as-is
            if entry.arch == "sam":
                size = 1024
            elif getattr(bb, "patch_size", 0) and bb.patch_size > 1:
                size = (args.size // bb.patch_size) * bb.patch_size
            else:
                size = args.size
            batch = 1 if entry.arch == "sam" else args.batch
            images = jnp.asarray(
                rng.rand(batch, size, size, 3).astype(np.float32))
            feats = jax.jit(
                lambda v, im: [f.astype(jnp.float32)
                               for f in bb._apply_fn(v, im)[0]]
            )(bb.device_variables, images)
            feats = jax.tree_util.tree_map(np.asarray, feats)
            ok = all(np.isfinite(f).all() for f in feats)
            shapes = [tuple(f.shape) for f in feats]
            dt = time.perf_counter() - t0
            status = "OK" if ok else "NON-FINITE"
            print(f"{name:22s} {status}  {dt:6.1f}s  taps={shapes}",
                  flush=True)
            if not ok:
                failures.append(name)
        except Exception as e:  # noqa: BLE001 — smoke must report, not die
            print(f"{name:22s} FAIL  {type(e).__name__}: {e}", flush=True)
            failures.append(name)
    print(f"smoke: {len(args.backbones) - len(failures)}/"
          f"{len(args.backbones)} OK" + (f"  failures={failures}"
                                         if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

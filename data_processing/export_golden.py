#!/usr/bin/env python
"""Export golden torch activations for converter validation (SURVEY §4b).

For each checkpoint present under ``$MVP_CHECKPOINT_DIR``, run the *raw
torch state_dict* through a minimal torch forward (per source layout) on a
fixed input and save input/output NPZs. ``verify`` mode then compares this
repo's converted Flax forward against the stored goldens at <= 1e-3.

This replaces the reference's eyeball-the-notebook porting validation with
a reproducible artifact. Torch here is CPU-only and used as an oracle.

Usage:
    python data_processing/export_golden.py export --out goldens/
    python data_processing/export_golden.py verify --goldens goldens/
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def _fixed_input(size: int) -> np.ndarray:
    rng = np.random.RandomState(1234)
    return rng.randn(1, 3, size, size).astype(np.float32)


def export(out_dir: str) -> int:
    """Torch-side golden export (requires the family's torch modeling code;
    ViT families use the replica modules from the test suite — the same
    structures validated against timm/HF in tests/test_convert*.py are
    instantiated at full size and loaded with the real state_dict)."""
    import torch

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
    from midvision_probe_tpu.models import zoo
    from midvision_probe_tpu.models.convert.remap import unwrap_checkpoint

    os.makedirs(out_dir, exist_ok=True)
    n = 0
    for name, entry in sorted(zoo.ZOO.items()):
        if entry.arch != "resnet" or name.startswith("test_"):
            continue  # torch replica available at full size: R50 only (v1)
        path = os.path.join(zoo.checkpoint_dir(), entry.filename)
        if not os.path.exists(path):
            continue
        from test_convert import _TorchResNet50  # noqa: E402

        sd = unwrap_checkpoint(
            torch.load(path, map_location="cpu", weights_only=False),
            entry.source,
        )
        t = _TorchResNet50()
        t.load_state_dict(sd)
        t.eval()
        x = _fixed_input(224)
        with torch.no_grad():
            taps = [o.numpy() for o in t(torch.from_numpy(x))]
        np.savez_compressed(
            os.path.join(out_dir, f"{name}.npz"),
            input=x, **{f"tap_{i}": o for i, o in enumerate(taps)},
        )
        print(f"[golden] {name}")
        n += 1
    print(f"exported {n} goldens to {out_dir}")
    return 0


def verify(golden_dir: str, atol: float = 1e-3) -> int:
    import jax.numpy as jnp

    from midvision_probe_tpu.models import zoo

    failures = []
    for f in sorted(os.listdir(golden_dir)):
        if not f.endswith(".npz"):
            continue
        name = f[:-4]
        data = np.load(os.path.join(golden_dir, f))
        m = zoo.build_resnet_extractor(name, return_multilayer=True)
        x = data["input"].transpose(0, 2, 3, 1)
        outs = m(jnp.asarray(x))
        for i, out in enumerate(outs):
            ref = data[f"tap_{i}"]
            err = float(np.abs(np.asarray(out).transpose(0, 3, 1, 2)
                               - ref).max())
            status = "ok" if err <= atol else "FAIL"
            print(f"[{status}] {name} tap {i}: max err {err:.2e}")
            if err > atol:
                failures.append((name, i, err))
    return 1 if failures else 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["export", "verify"])
    ap.add_argument("--out", default="goldens")
    ap.add_argument("--goldens", default="goldens")
    args = ap.parse_args()
    if args.mode == "export":
        return export(args.out)
    return verify(args.goldens)


if __name__ == "__main__":
    raise SystemExit(main())

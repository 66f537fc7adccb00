#!/usr/bin/env python
"""Batch-verify/convert zoo checkpoints (replaces the reference's manual
per-model porting notebooks, ``evals/models/models_jupyter_notebook/``).

For every zoo entry whose torch checkpoint exists under
``$MVP_CHECKPOINT_DIR``, build the extractor (which runs the converter),
run a forward smoke test, and report success/failure — the CI version of
the reference's eyeball-the-notebook workflow.

Usage:
    python data_processing/convert_checkpoints.py            # all available
    python data_processing/convert_checkpoints.py dino_vitb16 mae_vitb16
"""

from __future__ import annotations

import os
import sys

import numpy as np


def main(argv=None):
    names = (argv or sys.argv[1:]) or None
    import jax.numpy as jnp

    from midvision_probe_tpu.models import zoo

    ok, missing, failed = [], [], []
    for name, entry in sorted(zoo.ZOO.items()):
        if names and name not in names:
            continue
        if name.startswith("test_"):
            continue
        path = os.path.join(zoo.checkpoint_dir(), entry.filename)
        if not os.path.exists(path):
            missing.append(name)
            continue
        try:
            if entry.arch == "resnet":
                m = zoo.build_resnet_extractor(name, return_multilayer=True)
            elif entry.arch == "convnext":
                m = zoo.build_convnext_extractor(name, return_multilayer=True)
            elif entry.arch == "sam":
                m = zoo.build_sam_extractor(name, return_multilayer=True)
            else:
                m = zoo.build_vit_extractor(name, return_multilayer=True)
            size = min(entry.default_size, 224)
            size -= size % max(m.patch_size, 1) if m.patch_size else 0
            x = jnp.zeros((1, size or 224, size or 224, 3), jnp.float32)
            out = m(x)
            first = out[0] if isinstance(out, list) else out
            assert np.isfinite(np.asarray(first)).all()
            ok.append(name)
            print(f"[ok]      {name}: {tuple(first.shape)}")
        except Exception as e:  # noqa: BLE001 — report-and-continue tool
            failed.append((name, str(e)))
            print(f"[FAILED]  {name}: {e}")

    print(f"\nconverted {len(ok)} | missing weights {len(missing)} | "
          f"failed {len(failed)}")
    if missing:
        print("missing:", ", ".join(missing))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())

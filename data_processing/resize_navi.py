#!/usr/bin/env python
"""Downsample NAVI images/depths to the ``downsampled_*`` pyramid the
loader reads (port of reference ``data_processing/resize_navi.py`` —
joblib-parallel).

Usage:
    python data_processing/resize_navi.py --root data/navi_v1 --min-side 512
"""

from __future__ import annotations

import argparse
import glob
import os


def process_scene(scene_path: str, min_side: int) -> int:
    from PIL import Image

    n = 0
    for sub, resample in (("images", Image.LANCZOS), ("depth", Image.NEAREST)):
        d = os.path.join(scene_path, sub)
        if not os.path.isdir(d):
            continue
        for path in sorted(glob.glob(os.path.join(d, "*"))):
            stem = os.path.basename(path)
            if stem.startswith("downsampled_"):
                continue
            out = os.path.join(d, f"downsampled_{stem}")
            if os.path.exists(out):
                continue
            with Image.open(path) as img:
                w, h = img.size
                scale = min_side / min(w, h)
                if scale < 1.0:
                    img = img.resize(
                        (round(w * scale), round(h * scale)), resample
                    )
                img.save(out)
            n += 1
    return n


def main():
    from joblib import Parallel, delayed

    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--min-side", type=int, default=512)
    ap.add_argument("--jobs", type=int, default=8)
    args = ap.parse_args()

    scenes = glob.glob(os.path.join(args.root, "*", "multiview_*"))
    scenes += glob.glob(os.path.join(args.root, "*", "wild_set"))
    counts = Parallel(n_jobs=args.jobs)(
        delayed(process_scene)(s, args.min_side) for s in sorted(scenes)
    )
    print(f"downsampled {sum(counts)} files across {len(scenes)} scenes")


if __name__ == "__main__":
    main()

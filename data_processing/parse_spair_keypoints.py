#!/usr/bin/env python
"""SPair keypoint-name CSV → per-class JSON (port of reference
``data_processing/parse_spair_keypoints.py``).

Usage:
    python data_processing/parse_spair_keypoints.py \
        --csv spair_keypoint_names.csv --out spair_keypoint_names.json
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--csv", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    table = np.loadtxt(args.csv, delimiter=",", dtype=str).T
    class_names = [c.strip() for c in table[1:, 0]]
    kp_table = table[1:, 1:]

    out = {}
    for cls, row in zip(class_names, kp_table):
        names = [n.strip() for n in row if n.strip()]
        out[cls] = {str(i): name for i, name in enumerate(names)}

    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote keypoint names for {len(out)} classes to {args.out}")


if __name__ == "__main__":
    main()

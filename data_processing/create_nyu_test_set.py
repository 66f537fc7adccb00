#!/usr/bin/env python
"""Build the processed NYUv2 test set consumed by ``datasets/nyu.NYUTest``.

Port of reference ``data_processing/create_nyu_pkl.py`` (mat73 → pkl.gz)
generalized to emit the per-sample file layout the loader reads
(images/depths/normals/metadata); mat73 is not in this environment, so the
labeled .mat (v7.3 = HDF5) is read with h5py when available, else scipy.io.

Usage:
    python data_processing/create_nyu_test_set.py \
        --mat nyu_depth_v2_labeled.mat --normals all_normals.pklz \
        --out data/nyuv2_test_processed
"""

from __future__ import annotations

import argparse
import gzip
import os
import pickle

import numpy as np


def load_labeled_mat(path):
    try:
        import h5py

        f = h5py.File(path, "r")
        images = np.array(f["images"])  # (N, 3, W, H) in mat order
        depths = np.array(f["depths"])  # (N, W, H)
        # mat73/HDF5 stores transposed: -> (N, H, W, 3)
        images = images.transpose(0, 3, 2, 1)
        depths = depths.transpose(0, 2, 1)
        return images, depths
    except ImportError:
        from scipy.io import loadmat

        d = loadmat(path)
        images = d["images"].transpose(3, 0, 1, 2)
        depths = d["depths"].transpose(2, 0, 1)
        return images, depths


def main():
    from PIL import Image

    ap = argparse.ArgumentParser()
    ap.add_argument("--mat", required=True)
    ap.add_argument("--normals", required=True,
                    help="all_normals.pklz (Ladicky surface normals)")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    images, depths = load_labeled_mat(args.mat)
    with gzip.GzipFile(args.normals, "r") as f:
        snorm_dict = pickle.load(f)
    snorms = snorm_dict["all_normals"] if isinstance(snorm_dict, dict) else snorm_dict

    for sub in ("images", "depths", "normals", "metadata"):
        os.makedirs(os.path.join(args.out, sub), exist_ok=True)

    # the labeled set's canonical test split = all 1449 labeled frames; the
    # reference pipeline stores every sample with a nyuv2_test_{i} stem
    for i in range(len(images)):
        Image.fromarray(images[i].astype(np.uint8)).save(
            os.path.join(args.out, "images", f"nyuv2_test_{i}_image.png")
        )
        np.save(os.path.join(args.out, "depths", f"nyuv2_test_{i}_depth.npy"),
                depths[i].astype(np.float32))
        np.save(os.path.join(args.out, "normals", f"nyuv2_test_{i}_norm.npy"),
                np.asarray(snorms[i], np.float32))
        np.save(os.path.join(args.out, "metadata",
                             f"nyuv2_test_{i}_metadata.npy"),
                {"index": i})
    print(f"wrote {len(images)} samples to {args.out}")
    print("run data_processing/oneformer_preprocess.py next to add the "
          "panoptic segmentations/ NPZs")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Build the probing Taskonomy HF datasets from a raw omnitools download.

TPU-native analog of the reference's 668-line preprocessing notebook
(``data_processing/taskonomy_preprocess/data_preprocess.ipynb``): walks the
raw per-component Taskonomy tree, pairs every keypoints3d view with its
sibling components, splits by the notebook's fixed scene lists, samples
per-scene caps, and writes two ``datasets.DatasetDict`` directories that
``midvision_probe_tpu.datasets.taskonomy.Taskonomy`` consumes via
``load_from_disk``:

  * the MAIN dataset (``--out-main``, columns rgb / depth / reshading /
    edge_occlusion / edge_texture / keypoints2d / keypoints3d /
    principal_curvature / mask_valid / scene) — notebook cells 1-3
  * the SNORM dataset (``--out-snorm``, columns rgb / normal / mask_valid /
    scene) — notebook cells 5-6

Raw layout (omnitools.download, notebook README):
    <raw>/<component>/taskonomy/<scene>/point_P_view_V_domain_<component>.png

Faithfully mirrored quirks (cited against the notebook):
  * the MAIN dataset's ``mask_valid`` column points at the scene's
    **depth_zbuffer** files, not the mask_valid component (cell 1:
    ``mask_valid_path = ...replace('keypoints3d', 'depth_zbuffer')``); the
    SNORM dataset uses the real mask_valid component (cell 5)
  * per-scene caps are ``size // n_scenes * 2`` for the main set and
    ``* 4`` for the snorm set (cells 1 and 5)
  * a view is kept only when EVERY component file exists (cell 1)

Usage:
    python data_processing/prepare_taskonomy.py --raw-root data/taskonomy_raw \
        --out-main data/taskonomy_seg --out-snorm data/taskonomy_snorm_seg \
        --train-size 20000 --val-size 2000 --test-size 2000
"""

from __future__ import annotations

import argparse
import os
import random

# notebook cell 0 — the fixed scene split of the taskonomy "tiny" subset
TRAIN_SCENES = [
    "hanson", "merom", "klickitat", "onaga", "leonardo", "marstons",
    "newfields", "pinesdale", "lakeville", "cosmos", "benevolence",
    "pomaria", "tolstoy", "shelbyville", "allensville", "wainscott",
    "beechwood", "coffeen", "stockman", "hiteman", "woodbine",
    "lindenwood", "forkland", "mifflinburg", "ranchester",
]
VALIDATION_SCENES = [
    "wiconisco", "corozal", "collierville", "markleeville", "darden",
]
TEST_SCENES = ["ihlen", "muleshoe", "uvalda", "noxapater", "mcdade"]

# (column name, raw component dir) for the main dataset; mask_valid
# deliberately reads depth_zbuffer (see module docstring)
MAIN_COLUMNS = [
    ("rgb", "rgb"),
    ("depth", "depth_euclidean"),
    ("reshading", "reshading"),
    ("edge_occlusion", "edge_occlusion"),
    ("edge_texture", "edge_texture"),
    ("keypoints2d", "keypoints2d"),
    ("keypoints3d", "keypoints3d"),
    ("principal_curvature", "principal_curvature"),
    ("mask_valid", "depth_zbuffer"),
]
SNORM_COLUMNS = [
    ("rgb", "rgb"),
    ("normal", "normal"),
    ("mask_valid", "mask_valid"),
]


def _component_dir(raw_root: str, component: str) -> str:
    """``<raw>/<component>/taskonomy`` with a flat-``<raw>/<component>``
    fallback (both layouts appear in the wild)."""
    nested = os.path.join(raw_root, component, "taskonomy")
    return nested if os.path.isdir(nested) else os.path.join(raw_root, component)


def collect_views(raw_root: str, columns, sizes: dict, seed: int,
                  scale: int) -> dict:
    """Walk keypoints3d as the reference component (notebook cell 1) and
    return ``{split: {column: [paths], 'scene': [names]}}``."""
    ref_dir = _component_dir(raw_root, "keypoints3d")
    caps = {
        "train": sizes["train"] // len(TRAIN_SCENES) * scale,
        "validation": sizes["validation"] // len(VALIDATION_SCENES) * scale,
        "test": sizes["test"] // len(TEST_SCENES) * scale,
    }
    split_of = {s: "train" for s in TRAIN_SCENES}
    split_of.update({s: "validation" for s in VALIDATION_SCENES})
    split_of.update({s: "test" for s in TEST_SCENES})

    out = {sp: {c: [] for c, _ in columns} | {"scene": []} for sp in caps}
    totals = dict.fromkeys(caps, 0)
    per_scene = {}
    rng = random.Random(seed)

    for root, _, files in sorted(os.walk(ref_dir)):
        files = sorted(files)
        rng.shuffle(files)  # notebook: random.shuffle for sampling
        for fname in files:
            if not fname.endswith(".png"):
                continue
            rel = os.path.relpath(os.path.join(root, fname), ref_dir)
            scene = rel.split(os.sep)[0]
            split = split_of.get(scene)
            if split is None:
                continue
            if per_scene.get(scene, 0) >= caps[split]:
                continue
            if totals[split] >= sizes[split]:
                continue
            paths = {
                col: os.path.join(
                    _component_dir(raw_root, comp),
                    rel.replace("keypoints3d", comp))
                for col, comp in columns
            }
            if not all(os.path.exists(p) for p in paths.values()):
                continue  # cell 1: keep only fully-paired views
            for col, p in paths.items():
                out[split][col].append(p)
            out[split]["scene"].append(scene)
            per_scene[scene] = per_scene.get(scene, 0) + 1
            totals[split] += 1
    return out


def build_dataset_dict(split_data: dict):
    from datasets import Dataset, DatasetDict, Features, Image, Value

    splits = {}
    for split, data in split_data.items():
        if not data["scene"]:
            continue
        feats = Features(
            {c: Image() for c in data if c != "scene"}
            | {"scene": Value("string")}
        )
        splits[split] = Dataset.from_dict(data, features=feats)
    return DatasetDict(splits)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--raw-root", required=True,
                    help="omnitools download root (contains rgb/, "
                         "depth_euclidean/, ... component dirs)")
    ap.add_argument("--out-main", default="data/taskonomy_seg")
    ap.add_argument("--out-snorm", default="data/taskonomy_snorm_seg")
    ap.add_argument("--train-size", type=int, default=20000)
    ap.add_argument("--val-size", type=int, default=2000)
    ap.add_argument("--test-size", type=int, default=2000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--skip-main", action="store_true")
    ap.add_argument("--skip-snorm", action="store_true")
    args = ap.parse_args(argv)

    sizes = {"train": args.train_size, "validation": args.val_size,
             "test": args.test_size}

    for skip, columns, out_dir, scale, tag in (
        (args.skip_main, MAIN_COLUMNS, args.out_main, 2, "main"),
        (args.skip_snorm, SNORM_COLUMNS, args.out_snorm, 4, "snorm"),
    ):
        if skip:
            continue
        data = collect_views(args.raw_root, columns, sizes, args.seed, scale)
        dd = build_dataset_dict(data)
        counts = {k: len(v) for k, v in dd.items()}
        if not counts:
            raise SystemExit(
                f"[prepare_taskonomy] {tag}: no paired views found under "
                f"{args.raw_root} — check the raw layout")
        os.makedirs(os.path.dirname(out_dir) or ".", exist_ok=True)
        dd.save_to_disk(out_dir)
        print(f"[prepare_taskonomy] {tag}: {counts} -> {out_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

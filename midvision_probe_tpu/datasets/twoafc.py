"""NIGHTS 2AFC perceptual-similarity dataset (reference
``evals/datasets/twoafcdataset.py``).

CSV-driven triplets (ref / left / right images + human vote p), filtered to
>= 6 unanimous votes (``twoafcdataset.py:22-24``). Preprocess modes follow
``get_preprocess_fn`` (``datasets/utils.py:36-78``): DEFAULT = bicubic
resize to load_size² + [0,1] scaling (no mean normalization); LPIPS =
[-1, 1].
"""

from __future__ import annotations

import os

import numpy as np


class TwoAFCDataset:
    def __init__(self, root_dir: str, split: str = "train",
                 load_size: int = 224, preprocess: str = "DEFAULT", **_):
        import pandas as pd

        self.root_dir = root_dir
        self.load_size = int(load_size)
        self.preprocess = preprocess
        csv = pd.read_csv(os.path.join(root_dir, "data.csv"))
        csv = csv[csv["votes"] >= 6]
        if split in ("train", "val", "test"):
            csv = csv[csv["split"] == split]
        elif split == "test_imagenet":
            csv = csv[(csv["split"] == "test") & (csv["is_imagenet"])]
        elif split == "test_no_imagenet":
            csv = csv[(csv["split"] == "test") & (~csv["is_imagenet"])]
        else:
            raise ValueError(f"Invalid split: {split}")
        self.csv = csv
        self.name = "nights_2afc"

    def __len__(self):
        return len(self.csv)

    def _load(self, rel_path):
        import jax.numpy as jnp
        from PIL import Image

        from midvision_probe_tpu.ops.image import resize

        img = Image.open(os.path.join(self.root_dir, rel_path)).convert("RGB")
        arr = np.array(img).astype(np.float32) / 255.0
        if self.preprocess == "LPIPS":
            return arr * 2.0 - 1.0
        s = self.load_size
        arr = np.asarray(
            resize(jnp.asarray(arr), (s, s), mode="bicubic")
        ).clip(0, 1)
        return arr

    def __getitem__(self, idx):
        row = self.csv.iloc[idx]
        return {
            "id": np.int64(row.iloc[0]),
            "p": np.float32(row.iloc[2]),
            "img_ref": self._load(row.iloc[4]).astype(np.float32),
            "img_left": self._load(row.iloc[5]).astype(np.float32),
            "img_right": self._load(row.iloc[6]).astype(np.float32),
        }

"""Taskonomy probing dataset (reference ``evals/datasets/taskonomy.py`` +
``task_configs.py`` + ``transforms.py:96-181``).

The reference streams HF datasets (``uva-cv-lab/taskonomy_*``); zero-egress
here, so the loader accepts either a local HF-datasets directory
(``datasets.load_from_disk``) or falls back to a synthetic generator with
the same item schema (rgb / <task> / mask_valid), keeping the trainer and
transforms fully exercised.
"""

from __future__ import annotations

import numpy as np

from midvision_probe_tpu.datasets.transforms import normalize_image

# reference task_configs.task_parameters (subset used by the pipelines)
TASK_PARAMETERS = {
    "depth_euclidean": {"num_channels": 1,
                        "clamp_to": (0.0, 8000.0 / (2**16 - 1))},
    "depth_zbuffer": {"num_channels": 1, "mask_val": 1.0,
                      "clamp_to": (0.0, 8000.0 / (2**16 - 1))},
    "edge_texture": {"num_channels": 1, "clamp_to": (0.0, 0.25)},
    "edge_occlusion": {"num_channels": 1},
    "keypoints2d": {"num_channels": 1},
    "keypoints3d": {"num_channels": 1},
    "principal_curvature": {"num_channels": 3, "mask_val": 0.0},
    "reshading": {"num_channels": 1},
    "normal": {"num_channels": 3},
}


def task_transform(arr: np.ndarray, task: str) -> np.ndarray:
    """numpy port of ``transforms.py:96-181`` for the HWC case."""
    arr = np.asarray(arr)
    if task == "rgb":
        return normalize_image(arr.astype(np.float32))
    if task == "mask_valid":
        m = arr.astype(np.float32)
        if m.max() > 1.5:
            m = m / 255.0
        if m.ndim == 2:
            m = m[..., None]
        return (m > 0.5).astype(np.float32)

    x = arr.astype(np.float32)
    if arr.dtype == np.uint16:
        x = x / (2**16 - 1)
    elif x.max() > 1.5:
        x = x / 255.0
    if x.ndim == 2:
        x = x[..., None]

    # resolve aliases EXPLICITLY: a blanket depth_euclidean fallback would
    # clamp curvature targets to depth's [0, 8000/65535] range and destroy
    # them silently (transforms.py:117 maps 'curvature' with
    # principal_curvature's parameters)
    aliases = {"depth": "depth_euclidean", "curvature": "principal_curvature"}
    base = aliases.get(task, task)
    if base not in TASK_PARAMETERS:
        raise KeyError(f"unknown taskonomy task {task!r}; known: "
                       f"{sorted(TASK_PARAMETERS)}")
    params = TASK_PARAMETERS[base]
    if task in ("principal_curvature", "curvature"):
        x = x[..., :2]  # reference keeps 2 channels (transform_8bit_n_channel(2))
    if "clamp_to" in params:
        lo, hi = params["clamp_to"]
        x = np.clip(x, lo, hi) / hi  # MAKE_RESCALE_0_MAX_0_POS1
    return x


class TaskonomyDataset:
    """Wraps an HF-style dataset to {rgb, <task>, mask_valid} items
    (``taskonomy.py:62-85``)."""

    name = "taskonomy"

    def __init__(self, dataset, task: str):
        self.dataset = dataset
        self.task = task

    def __len__(self):
        return len(self.dataset)

    def __getitem__(self, idx):
        item = self.dataset[idx]
        # the published dataset's column is 'depth' (notebook
        # data_preprocess.ipynb cell 1; reference taskonomy.py:72 reads
        # item[self.task]) while the synthetic fallback stores the raw
        # component name — accept either
        src_key = self.task
        if src_key not in item and self.task == "depth":
            src_key = "depth_euclidean"
        return {
            "image": task_transform(np.asarray(item["rgb"]), "rgb"),
            "target": task_transform(np.asarray(item[src_key]), src_key),
            "mask_valid": task_transform(np.asarray(item["mask_valid"]),
                                         "mask_valid"),
        }


class _SyntheticTaskonomy:
    def __init__(self, task, num_instances=16, image_size=(64, 64), seed=0):
        from midvision_probe_tpu.datasets.synthetic import SyntheticDepth

        self.inner = SyntheticDepth(num_instances, image_size, seed=seed)
        self.task = task

    def __len__(self):
        return len(self.inner)

    def __getitem__(self, idx):
        it = self.inner[idx]
        ch = TASK_PARAMETERS.get(self.task, {}).get("num_channels", 1)
        if self.task == "normal":
            target = it["snorm"] * 0.5 + 0.5
        elif ch == 3 or self.task in ("principal_curvature", "curvature"):
            target = np.repeat(it["depth"] / 10.0, 2, axis=-1)
        else:
            target = it["depth"] / 10.0
        return {
            "rgb": (it["image"] * 255).astype(np.uint8),
            self.task if self.task != "depth" else "depth_euclidean":
                (target * (2**16 - 1)).astype(np.uint16)
                if self.task in ("depth", "depth_euclidean") else target,
            "mask_valid": (it["depth"][..., 0] > 0).astype(np.float32),
        }


def Taskonomy(
    snorm_path,
    other_path,
    split,
    task,
    name="taskonomy",
    image_mean="imagenet",
    center_crop=False,
    rotateflip=False,
    augment_train=False,
    num_instances=16,
    image_size=(64, 64),
    **_,
):
    """Factory (``taskonomy.py:30-58``): HF dataset dir on disk, else
    synthetic fallback (``num_instances``/``image_size`` size the fallback
    only — the on-disk dataset ignores them)."""
    import os

    path = snorm_path if task == "normal" else other_path
    if os.path.isdir(str(path)):
        import datasets as hf_datasets

        ds = hf_datasets.load_from_disk(path)
        if hasattr(ds, "keys") and split in ds:
            ds = ds[split]
        return TaskonomyDataset(ds, task)
    seed = {"train": 0, "valid": 1, "test": 2}.get(split, 0)
    return TaskonomyDataset(
        _SyntheticTaskonomy(task, num_instances=int(num_instances),
                            image_size=tuple(image_size), seed=seed), task)

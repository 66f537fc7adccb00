"""SPair-71k semantic-correspondence dataset (reference
``evals/datasets/spair.py``).

Same on-disk layout (``PairAnnotation/<split>/*.json``,
``ImageAnnotation/<class>/*.json``, ``JPEGImages``, ``Segmentation``); same
behaviors: optional bbox crop, white square padding (``spair.py:206-211``),
bicubic-antialias image resize, keypoint rescale to image_size, PCK
``thresh_scale = max-bbox-side / max-image-dim`` when ``use_bbox=False``
(``spair.py:169-175``), ``num_instances`` subsample with seed 20.

TPU delta: keypoints are padded to ``MAX_KPS`` with a validity flag so the
whole evaluation batches and jits with static shapes.
"""

from __future__ import annotations

import glob
import json
import os
import random

import numpy as np

from midvision_probe_tpu.datasets.transforms import mean_std

CLASS_IDS = {
    "aeroplane": 1, "bicycle": 2, "bird": 3, "boat": 4, "bottle": 5,
    "bus": 6, "car": 7, "cat": 8, "chair": 9, "cow": 10, "dog": 12,
    "horse": 13, "motorbike": 14, "person": 15, "pottedplant": 16,
    "sheep": 17, "train": 19, "tvmonitor": 20,
}

MAX_KPS = 30


class SPairDataset:
    def __init__(
        self,
        root,
        split,
        image_size=512,
        image_mean="imagenet",
        use_bbox=True,
        class_name=None,
        num_instances=None,
        vp_diff=None,
    ):
        assert split in ["train", "valid", "test"]
        self.root = root
        self.split = split
        self.image_size = int(image_size)
        self.use_bbox = use_bbox
        self.mean, self.std = mean_std(image_mean)

        instances = self._pair_annotations()
        if class_name:
            instances = [a for a in instances if a["category"] == class_name]
        if vp_diff is not None:
            instances = [
                a for a in instances if a["viewpoint_variation"] == vp_diff
            ]
        if num_instances:
            random.seed(20)
            random.shuffle(instances)
            instances = instances[:num_instances]
        self.instances = instances
        self.image_annotations = self._image_annotations()

    def _pair_annotations(self):
        split = {"train": "trn", "valid": "val", "test": "test"}[self.split]
        files = glob.glob(os.path.join(self.root, "PairAnnotation", split,
                                       "*.json"))
        return [json.load(open(p)) for p in files]

    def _image_annotations(self):
        annot_path = os.path.join(self.root, "ImageAnnotation")
        out = {}
        for cls in os.listdir(annot_path):
            files = glob.glob(os.path.join(annot_path, cls, "*.json"))
            annots = [json.load(open(p)) for p in files]
            out[cls] = {a["filename"].split(".")[0]: a for a in annots}
        return out

    def __len__(self):
        return len(self.instances)

    def _kps(self, kp_dict, bbox):
        """Padded (MAX_KPS, 3) int array (``spair.py:130-145``)."""
        num_kps = len(kp_dict)
        kps = np.zeros((MAX_KPS, 3), np.float32)
        for i in range(num_kps):
            v = kp_dict[str(i)]
            if v:
                x, y = v
                if bbox:
                    x, y = x - bbox[0], y - bbox[1]
                kps[i] = (x, y, 1)
        return kps

    def _load(self, class_name, image_name, bbox, is_mask):
        from PIL import Image

        sub = "Segmentation" if is_mask else "JPEGImages"
        ext = ".png" if is_mask else ".jpg"
        path = os.path.join(self.root, sub, class_name, image_name + ext)
        arr = np.array(Image.open(path))
        if bbox:
            l, u, r, d = bbox
            arr = arr[u:d, l:r]
        h, w = arr.shape[:2]
        max_hw = max(h, w)
        if is_mask:
            arr = np.pad(arr, ((0, max_hw - h), (0, max_hw - w)))
            arr = (arr == CLASS_IDS[class_name]).astype(np.float32)
        else:
            arr = np.pad(arr, ((0, max_hw - h), (0, max_hw - w), (0, 0)),
                         constant_values=255)
        return arr, max_hw

    def __getitem__(self, index):
        from midvision_probe_tpu.ops.image import resize as jresize
        import jax.numpy as jnp

        pair = self.instances[index]
        class_name = pair["category"]
        class_dict = self.image_annotations[class_name]
        _, view_i, view_j = pair["filename"].split(":")[0].split("-")

        bbx_i = pair["src_bndbox"] if self.use_bbox else None
        bbx_j = pair["trg_bndbox"] if self.use_bbox else None

        kps_i = self._kps(class_dict[view_i]["kps"], bbx_i)
        kps_j = self._kps(class_dict[view_j]["kps"], bbx_j)

        img_i, hw_i = self._load(class_name, view_i, bbx_i, is_mask=False)
        img_j, hw_j = self._load(class_name, view_j, bbx_j, is_mask=False)
        seg_i, _ = self._load(class_name, view_i, bbx_i, is_mask=True)
        seg_j, _ = self._load(class_name, view_j, bbx_j, is_mask=True)

        s = self.image_size
        # bicubic antialias resize == torchvision Resize(BICUBIC, antialias)
        img_i = np.asarray(
            jresize(jnp.asarray(img_i.astype(np.float32) / 255.0), (s, s),
                    mode="bicubic", antialias=True)
        ).clip(0, 1)
        img_j = np.asarray(
            jresize(jnp.asarray(img_j.astype(np.float32) / 255.0), (s, s),
                    mode="bicubic", antialias=True)
        ).clip(0, 1)
        from midvision_probe_tpu.datasets.transforms import resize_nearest

        seg_i = resize_nearest(seg_i, (s, s))
        seg_j = resize_nearest(seg_j, (s, s))

        mean = np.asarray(self.mean, np.float32)
        std = np.asarray(self.std, np.float32)
        img_i = (img_i - mean) / std
        img_j = (img_j - mean) / std

        kps_i[:, :2] *= s / hw_i
        kps_j[:, :2] *= s / hw_j

        if not self.use_bbox:
            l, u, r, d = pair["trg_bndbox"]
            max_bbox = max(r - l, d - u)
            max_idim = max(pair["trg_imsize"][:2])
            thresh_scale = float(max_bbox) / max_idim
        else:
            thresh_scale = 1.0

        return {
            "img_i": img_i.astype(np.float32),
            "seg_i": seg_i.astype(np.float32),
            "kps_i": kps_i,
            "img_j": img_j.astype(np.float32),
            "seg_j": seg_j.astype(np.float32),
            "kps_j": kps_j,
            "thresh_scale": np.float32(thresh_scale),
            "class_name": class_name,
        }

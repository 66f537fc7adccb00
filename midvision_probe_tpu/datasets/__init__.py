"""Datasets + loader builder (reference ``evals/datasets/``).

Layout convention: every item is a dict of numpy arrays, channel-last
(image (H, W, 3) float32 normalized, depth (H, W, 1), snorm (H, W, 3),
segmentation (H, W) int32). ``build_loader`` batches onto the host; the
training engine shards batches over the device mesh.
"""

from midvision_probe_tpu.datasets.builder import build_loader  # noqa: F401

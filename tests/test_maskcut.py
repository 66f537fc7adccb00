"""MaskCut + CRF + percepture evaluator tests on synthetic data."""

import numpy as np
import pytest


def test_densecrf_refines_toward_image_edges():
    from midvision_probe_tpu.models.crf import densecrf

    # image: left half dark, right half bright; noisy mask ~ right half
    H = W = 64
    img = np.zeros((H, W, 3), np.uint8)
    img[:, W // 2:] = 200
    rng = np.random.RandomState(0)
    mask = np.zeros((H, W), np.float32)
    mask[:, W // 2:] = 1.0
    noise = rng.rand(H, W) < 0.1
    noisy = np.abs(mask - noise.astype(np.float32))

    out = densecrf(img, noisy)
    assert out.shape == (H, W)
    # refined mask should agree with the clean mask better than the noisy one
    acc_ref = (out == mask).mean()
    acc_noisy = (noisy.round() == mask).mean()
    assert acc_ref >= acc_noisy - 1e-6
    assert acc_ref > 0.93


def test_maskcut_finds_synthetic_object():
    """Features constant inside a square 'object' and different outside:
    spectral bipartition must recover the square."""
    from midvision_probe_tpu.models.maskcut import MaskCutProcessor

    dims = (16, 16)
    rng = np.random.RandomState(0)
    obj = np.zeros(dims, bool)
    obj[4:12, 5:13] = True
    C = 8
    feats = np.where(
        obj.reshape(-1), 1.0, -1.0
    )[None] * np.ones((C, 1)) + rng.randn(C, 256) * 0.05

    proc = MaskCutProcessor(feature_extractor_fn=lambda img: feats,
                            patch_size=16, fixed_size=256)
    seed, bipartitions, eigvecs = proc.maskcut_forward(
        feats, list(dims), [16, 16], [256, 256], num_pseudo_masks=1,
    )
    mask = bipartitions[0] > 0
    # upscaled mask should overlap the upscaled object box heavily
    obj_up = np.kron(obj, np.ones((16, 16), bool))
    iou = (mask & obj_up).sum() / (mask | obj_up).sum()
    assert iou > 0.8, iou


def test_maskcut_process_image_end_to_end():
    from midvision_probe_tpu.models import zoo
    from midvision_probe_tpu.models.maskcut import MaskCutProcessor

    backbone = zoo.build_vit_extractor("test_tiny_vit", output="dense",
                                       init_size=64)
    rng = np.random.RandomState(0)
    img = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
    img[16:48, 16:48] = [200, 30, 30]

    proc = MaskCutProcessor(backbone=backbone, patch_size=8, fixed_size=64)
    bboxes, masks, combined = proc.process_image(img, num_pseudo_masks=1)
    assert combined.shape == (64, 64)
    assert combined.dtype == bool
    for bbox in bboxes:
        assert len(bbox) == 4


def test_objectness_eval_driver(tmp_path):
    from midvision_probe_tpu.config import compose
    from midvision_probe_tpu.datasets.synthetic import SyntheticBinaryMask

    import evaluate_generic_objectness as drv

    cfg = compose(
        "objectness_eval",
        ["backbone=test_tiny", "max_images=2", f"output_dir={tmp_path}"],
    )

    class _DS(SyntheticBinaryMask):
        name = "synthetic_voc"

        def __getitem__(self, i):
            item = super().__getitem__(i)
            item["raw_image"] = (item["image"] - item["image"].min()) / (
                np.ptp(item["image"]) + 1e-6
            )
            return item

    metrics = drv.run(cfg, dataset=_DS(4, (64, 64)))
    for k in ("F-measure", "IoU", "Accuracy", "CorLoc"):
        assert 0.0 <= metrics[k] <= 1.0


def test_percepture_driver(tmp_path, rng):
    from midvision_probe_tpu.config import compose

    import evaluate_model_percepture as drv

    class FakeTriplets:
        name = "fake_2afc"

        def __len__(self):
            return 6

        def __getitem__(self, i):
            r = np.random.RandomState(i)
            ref = r.rand(32, 32, 3).astype(np.float32)
            near = np.clip(ref + r.randn(32, 32, 3) * 0.01, 0, 1).astype(
                np.float32
            )
            far = r.rand(32, 32, 3).astype(np.float32)
            left_is_near = i % 2 == 0
            return {
                "id": np.int64(i),
                "p": np.float32(0.0 if left_is_near else 1.0),
                "img_ref": ref,
                "img_left": near if left_is_near else far,
                "img_right": far if left_is_near else near,
            }

    cfg = compose("model_percepture",
                  ["backbone=test_tiny", "batch_size=3",
                   f"output_dir={tmp_path}"])
    metrics = drv.run(cfg, dataset=FakeTriplets())
    # near-duplicate features are closer even for a random backbone
    assert metrics["accuracy"] >= 0.8


def test_percepture_driver_config_surface(tmp_path):
    """2AFC driver via `dataset=synthetic_twoafc` (no injection needed)."""
    from midvision_probe_tpu.config import compose

    import evaluate_model_percepture as drv

    cfg = compose("model_percepture",
                  ["backbone=test_tiny", "dataset=synthetic_twoafc",
                   "dataset.num_instances=6", "batch_size=3",
                   f"output_dir={tmp_path}"])
    metrics = drv.run(cfg)
    assert metrics["accuracy"] >= 0.8

"""SPair dataset + evaluator tests on a generated miniature SPair-71k tree."""

import json
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def spair_root(tmp_path_factory):
    """Miniature SPair-71k directory in the reference layout."""
    from PIL import Image

    root = tmp_path_factory.mktemp("spair")
    rng = np.random.RandomState(0)
    cls = "cat"
    class_id = 8
    os.makedirs(root / "JPEGImages" / cls)
    os.makedirs(root / "Segmentation" / cls)
    os.makedirs(root / "ImageAnnotation" / cls)
    os.makedirs(root / "PairAnnotation" / "test")

    views = ["v0", "v1"]
    kps = {"v0": {"0": [10, 12], "1": [30, 20], "2": None},
           "v1": {"0": [14, 16], "1": [28, 24], "2": None}}
    for v in views:
        img = (rng.rand(48, 64, 3) * 255).astype(np.uint8)
        Image.fromarray(img).save(root / "JPEGImages" / cls / f"{v}.jpg")
        seg = np.zeros((48, 64), np.uint8)
        seg[8:40, 8:48] = class_id
        Image.fromarray(seg).save(root / "Segmentation" / cls / f"{v}.png")
        json.dump(
            {"filename": f"{v}.jpg", "kps": kps[v]},
            open(root / "ImageAnnotation" / cls / f"{v}.json", "w"),
        )

    pair = {
        "filename": f"pair-v0-v1:{cls}",
        "category": cls,
        "viewpoint_variation": 0,
        "src_bndbox": [8, 8, 48, 40],
        "trg_bndbox": [8, 8, 48, 40],
        "trg_imsize": [64, 48],
    }
    json.dump(pair, open(root / "PairAnnotation" / "test" / "p0.json", "w"))
    return str(root)


def test_spair_dataset_item(spair_root):
    from midvision_probe_tpu.datasets.spair import SPairDataset

    ds = SPairDataset(spair_root, "test", image_size=64, use_bbox=False)
    assert len(ds) == 1
    it = ds[0]
    assert it["img_i"].shape == (64, 64, 3)
    assert it["kps_i"].shape == (30, 3)
    assert it["kps_i"][:, 2].sum() == 2  # two valid keypoints
    # thresh_scale = max_bbox / max_imdim = 40/64
    np.testing.assert_allclose(it["thresh_scale"], 40 / 64, atol=1e-6)
    # kps scaled from padded-square (64) coords to image_size
    np.testing.assert_allclose(it["kps_i"][0, :2], [10, 12], atol=1e-5)


def test_spair_evaluator_identical_images(spair_root):
    """Matching an image against itself: every valid keypoint lands on (or
    within a patch of) itself → recall 100 at generous threshold."""
    from midvision_probe_tpu.config import compose
    from midvision_probe_tpu.datasets.spair import SPairDataset
    import evaluate_spair_correspondence as drv
    from midvision_probe_tpu.evaluators.spair import make_feature_fn
    from midvision_probe_tpu.models import zoo

    model = zoo.build_vit_extractor("test_tiny_vit", output="dense",
                                    return_multilayer=False, init_size=64)
    ds = SPairDataset(spair_root, "test", image_size=64, use_bbox=False)

    # make the pair identical so correspondence is exact
    item = ds[0]

    class _SelfPair:
        def __len__(self):
            return 1

        def __getitem__(self, i):
            it = dict(item)
            it["img_j"] = it["img_i"]
            it["kps_j"] = it["kps_i"]
            return it

    import jax.numpy as jnp

    from midvision_probe_tpu.evaluators.spair import batch_errors

    fn = make_feature_fn(model)
    it = _SelfPair()[0]
    feats = fn(jnp.asarray(np.stack([it["img_i"], it["img_j"]])))
    err_same, err_nn, in_both, idx_nn = batch_errors(
        feats[:1], feats[1:],
        jnp.asarray(it["kps_i"][None]), jnp.asarray(it["kps_j"][None]),
        jnp.asarray(np.float32([it["thresh_scale"]])), 64,
    )
    sel = np.asarray(in_both[0]).astype(bool)
    errs = np.asarray(err_same[0])[sel]
    # argmax resolution is one patch (8px/64px): worst-case quantization
    # error is sqrt(2)/8 / thresh_scale ≈ 0.28
    assert (errs <= 0.30).all(), errs
    # NN index of each valid keypoint is itself
    assert (np.asarray(idx_nn[0])[sel] == np.where(sel)[0]).all()

    # driver aggregation path also runs
    recall, confusion = drv.evaluate_dataset(fn, _SelfPair(), batch_pairs=1,
                                             image_size=64)
    assert confusion.sum() == 2


def test_patch_masks_hand_computed():
    """patch_masks vs hand count: a patch is kept iff >4 fg pixels
    (reference avg_pool2d(16) > 4/16**2 with intended 0/1 masks)."""
    import jax.numpy as jnp

    from midvision_probe_tpu.evaluators.spair import patch_masks

    seg = np.zeros((1, 32, 32), np.float32)
    seg[0, 0:2, 0:2] = 1.0      # patch (0,0): 4 px -> NOT kept (>4 strict)
    seg[0, 0:2, 16:19] = 1.0    # patch (0,1): 6 px -> kept
    seg[0, 16, 0] = 1.0         # patch (1,0): 1 px -> not kept
    m = np.asarray(patch_masks(jnp.asarray(seg), patch_size=16))
    assert m.shape == (1, 2, 2)
    assert m.tolist() == [[[False, True], [False, False]]]


def test_spair_mask_feats_and_heatmaps(spair_root):
    """mask_feats zeroes background-patch features (reference
    evaluate_spair_correspondence.py:61-63) and return_heatmaps yields the
    (K, h, w) similarity maps (:100-103): heatmap columns at masked target
    patches must be exactly 0."""
    import jax.numpy as jnp

    from midvision_probe_tpu.datasets.spair import SPairDataset
    from midvision_probe_tpu.evaluators.spair import (
        batch_errors,
        make_feature_fn,
        patch_masks,
    )
    from midvision_probe_tpu.models import zoo

    model = zoo.build_vit_extractor("test_tiny_vit", output="dense",
                                    return_multilayer=False, init_size=64)
    ds = SPairDataset(spair_root, "test", image_size=64, use_bbox=False)
    it = ds[0]
    fn = make_feature_fn(model)
    feats = fn(jnp.asarray(np.stack([it["img_i"], it["img_j"]])))
    p = model.patch_size
    segs = jnp.asarray(np.stack([it["seg_i"], it["seg_j"]]))
    pm = patch_masks(segs, p)
    assert not np.asarray(pm).all(), "fixture must have background patches"

    out = batch_errors(
        feats[:1], feats[1:],
        jnp.asarray(it["kps_i"][None]), jnp.asarray(it["kps_j"][None]),
        jnp.asarray(np.float32([it["thresh_scale"]])), 64,
        masks_i=pm[:1], masks_j=pm[1:], return_heatmaps=True,
    )
    err_same, err_nn, in_both, idx_nn, heat = out
    h = 64 // p
    assert heat.shape == (1, it["kps_i"].shape[0], h, h)
    heat = np.asarray(heat[0])
    tgt_mask = np.asarray(pm[1])
    assert (heat[:, ~tgt_mask] == 0).all()
    assert np.abs(heat[:, tgt_mask]).max() > 0

    # driver path with both flags on
    import evaluate_spair_correspondence as drv

    class _One:
        def __len__(self):
            return 1

        def __getitem__(self, i):
            return it

    recall, confusion, heatmaps = drv.evaluate_dataset(
        fn, _One(), batch_pairs=1, image_size=64,
        mask_feats=True, return_heatmaps=True, patch_size=p)
    assert heatmaps.shape == (1, it["kps_i"].shape[0], h, h)
    assert np.isfinite(recall)


def test_patch_masks_nondivisible_patch():
    """p=14 at a 64px image: mask grid must crop to the feature grid
    (s//p) instead of crashing on the reshape (VALID-stride alignment)."""
    import jax.numpy as jnp
    from midvision_probe_tpu.evaluators.spair import patch_masks

    seg = np.zeros((1, 64, 64), np.float32)
    seg[0, :28, :28] = 1.0          # exactly the top-left 2x2 patch block
    m = np.asarray(patch_masks(jnp.asarray(seg), patch_size=14))
    assert m.shape == (1, 4, 4)
    assert m[0, :2, :2].all() and not m[0, 2:, :].any() and not m[0, :, 2:].any()


def test_patch_masks_grid_hw_area_path():
    """grid_hw that doesn't tile the image (fixed-input backbones) takes
    the area-resize path; threshold stays >4 source pixels per cell."""
    import jax.numpy as jnp

    from midvision_probe_tpu.evaluators.spair import patch_masks

    seg = np.zeros((1, 48, 48), np.float32)
    seg[0, :24, :24] = 1.0  # top-left quadrant fully foreground
    m = np.asarray(patch_masks(jnp.asarray(seg), grid_hw=(5, 5)))
    assert m.shape == (1, 5, 5)
    # cells fully inside the quadrant are kept; fully-background cells not
    assert m[0, 0, 0] and m[0, 1, 1]
    assert not m[0, 4, 4] and not m[0, 0, 4]


def test_spair_mask_feats_fixed_input_backbone(spair_root):
    """Fixed-input backbones (BEiT family) emit features at THEIR grid, not
    image_size//patch: the mask grid must follow the feature shape (the
    reference hardcodes image_size/16 and would crash —
    evaluate_spair_correspondence.py:52-53 vs beit_v2.py:255-257)."""
    import jax
    import jax.numpy as jnp

    from midvision_probe_tpu.datasets.spair import SPairDataset
    from midvision_probe_tpu.evaluators.spair import make_feature_fn
    from midvision_probe_tpu.models import zoo

    import evaluate_spair_correspondence as drv

    model = zoo.build_vit_extractor("test_tiny_vit", output="dense",
                                    return_multilayer=False, init_size=32)
    inner = make_feature_fn(model)

    def fixed_input_fn(imgs):  # simulate a forced 32px input at 64px eval
        imgs = jax.image.resize(
            imgs, (imgs.shape[0], 32, 32, imgs.shape[3]), "bilinear")
        return inner(imgs)

    ds = SPairDataset(spair_root, "test", image_size=64, use_bbox=False)
    it = ds[0]

    class _One:
        def __len__(self):
            return 1

        def __getitem__(self, i):
            return it

    recall, _ = drv.evaluate_dataset(
        fixed_input_fn, _One(), batch_pairs=1, image_size=64,
        mask_feats=True, patch_size=model.patch_size)
    assert np.isfinite(recall)


def test_patch_masks_valid_stride_alignment_nondivisible_grid():
    """p=7 at a 30px image -> grid 4 with 30 % 4 != 0: the exact-pooling
    path must still run (cells = 7px blocks over the cropped 28px the
    VALID-stride conv embedded), not the area-resize fallback — resize
    cells would span ~7.5px and drift off the feature grid."""
    import jax.numpy as jnp

    from midvision_probe_tpu.evaluators.spair import patch_masks

    seg = np.zeros((1, 30, 30), np.float32)
    seg[0, :14, :14] = 1.0  # exactly the top-left 2x2 block of 7px patches
    m = np.asarray(patch_masks(jnp.asarray(seg), patch_size=7))
    assert m.shape == (1, 4, 4)
    assert m[0, :2, :2].all()
    assert not m[0, 2:, :].any() and not m[0, :, 2:].any()

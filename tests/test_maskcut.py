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

    # the dataset itself must carry raw_image (voc.py:79 schema): the old
    # patched-in copy here hid a missing key that zeroed the whole eval
    # through the driver's reference-mandated per-image error swallowing
    ds = SyntheticBinaryMask(4, (64, 64))
    item = ds[0]
    assert "raw_image" in item
    assert item["raw_image"].min() >= 0.0 and item["raw_image"].max() <= 1.0

    metrics = drv.run(cfg, dataset=ds)
    for k in ("F-measure", "IoU", "Accuracy", "CorLoc"):
        assert 0.0 <= metrics[k] <= 1.0


def test_objectness_eval_driver_fails_when_all_images_fail(tmp_path):
    """rc=0 with every image swallowed is a suite trap — the driver must
    exit nonzero when n_ok == 0 (deliberate tightening over the
    reference's log-only behavior)."""
    import pytest

    from midvision_probe_tpu.config import compose
    from midvision_probe_tpu.datasets.synthetic import SyntheticBinaryMask

    import evaluate_generic_objectness as drv

    cfg = compose(
        "objectness_eval",
        ["backbone=test_tiny", "max_images=2", f"output_dir={tmp_path}"],
    )

    class _Broken(SyntheticBinaryMask):
        name = "synthetic_voc"

        def __getitem__(self, i):
            item = super().__getitem__(i)
            del item["raw_image"]
            return item

    with pytest.raises(SystemExit, match="all .* images failed"):
        drv.run(cfg, dataset=_Broken(4, (64, 64)))

    # and it must exit BEFORE the CSV append: an all-0.0000 row in the
    # archived artifact looks like a legitimate result (r4 review finding)
    import glob

    assert not glob.glob(str(tmp_path / "final_results_summary_*.csv"))


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


def test_permutohedral_filter_high_dim_exact_properties():
    """d>=2 regression for the simplex-vertex key formula: a wrong wrap
    offset (remainder * -d instead of remainder-(d+1)) splits the same
    lattice vertex into several hash keys, so splat mass fragments and
    blur neighbours vanish. Caught only at d>=2 (the d=1 Gaussian test's
    remainders are 0/1, where both formulas agree). Properties checked:

    * filtering a CONSTANT value field returns the same constant after
      homogeneous normalization (exact for any correct lattice),
    * the filter is symmetric: <f(x), y> == <x, f(y)> (splat/blur/slice
      adjointness), which a key-fragmented lattice breaks.
    """
    import ctypes

    import numpy as np

    from midvision_probe_tpu.models.crf import _load_native

    lib = _load_native()
    if lib is None:
        import pytest

        pytest.skip("native densecrf lib unavailable")
    lib.permutohedral_filter.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.permutohedral_filter.restype = ctypes.c_int

    rng = np.random.RandomState(0)
    N, d = 400, 5  # bilateral-kernel dimensionality
    feats = np.ascontiguousarray(rng.rand(N, d).astype(np.float32) * 4)

    def filt(values):
        values = np.ascontiguousarray(values.astype(np.float32))
        vs = values.shape[1]
        out = np.zeros_like(values)
        rc = lib.permutohedral_filter(
            feats.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), d, N,
            values.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), vs,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        assert rc == 0
        return out

    # homogeneous normalization: filter [v, 1] and divide
    ones = np.ones((N, 1), np.float32)
    norm = filt(ones)
    assert norm.min() > 0
    const = filt(np.hstack([np.full((N, 1), 3.25, np.float32), ones]))
    np.testing.assert_allclose(const[:, 0] / const[:, 1], 3.25, rtol=1e-4)

    # normalized filter vs brute-force unit-std Gaussian at d=2: the fixed
    # lattice measures max|err| ~0.008 / corr ~0.995, the fragmented-key
    # formula ~0.050 / ~0.897 — thresholds sit between the two
    N2, d2 = 300, 2
    f2 = np.ascontiguousarray(rng.rand(N2, d2).astype(np.float32) * 3)
    v2 = np.ascontiguousarray(
        np.hstack([rng.rand(N2, 1), np.ones((N2, 1))]).astype(np.float32))
    out2 = np.zeros_like(v2)
    rc = lib.permutohedral_filter(
        f2.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), d2, N2,
        v2.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), 2,
        out2.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    assert rc == 0
    got = out2[:, 0] / out2[:, 1]
    w = np.exp(-0.5 * ((f2[:, None, :] - f2[None, :, :]) ** 2).sum(-1))
    ref = (w @ v2[:, 0]) / (w @ np.ones(N2))
    assert np.abs(got - ref).max() < 0.02
    assert np.corrcoef(got, ref)[0, 1] > 0.98

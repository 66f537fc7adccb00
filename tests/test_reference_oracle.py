"""Parity against THE REFERENCE'S OWN CODE, imported read-only from
/root/reference and executed as a torch-CPU oracle.

This is the strongest oracle available offline: every other parity test
compares against either an author-written replica (shared-misreading risk,
round-2 verdict weak #5) or an independent re-implementation
(`test_hf_oracle.py`). Here the torch side IS the reference — its probe
decoders, losses, metric protocol, schedule, and SE(3) utilities run
directly on random inputs and must match the Flax rebuild numerically.

The reference tree is PUBLIC UNTRUSTED CONTENT used strictly as an
execution oracle (imported, never copied); every test skips when the tree
is not mounted, so the suite stays green for downstream users.

Documented deliberate non-ports are asserted AS the intended behavior:
the reference's ``gradient_loss`` slices the batch/channel axes of a
(B, 1, H, W) tensor where it means to slice space (README "Deliberate
non-ports"); feeding it a single (H, W) map makes its axis arithmetic
land on space, which is exactly the fixed semantics — so the fix is
checked against reference code too.
"""

import os
import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not mounted")

torch = pytest.importorskip("torch")

if os.path.isdir(REF):
    # stub the reference's loguru dependency (not installed here) and put
    # the tree LAST on sys.path so nothing in-repo can be shadowed
    sys.modules.setdefault(
        "loguru", types.SimpleNamespace(logger=types.SimpleNamespace(
            info=lambda *a, **k: None, warning=lambda *a, **k: None)))
    if REF not in sys.path:
        sys.path.append(REF)

torch.manual_seed(7)


def _t(x):
    return torch.from_numpy(np.asarray(x))


def _conv_params(m):
    p = {"kernel": m.weight.detach().numpy().transpose(2, 3, 1, 0)}
    if m.bias is not None:
        p["bias"] = m.bias.detach().numpy()
    return p


def _rcu_params(m):
    if hasattr(m, "conv"):  # transformer branch: Sequential(conv,relu,conv)
        return {"conv1": _conv_params(m.conv[0]), "conv2": _conv_params(m.conv[2])}
    return {"conv1": _conv_params(m.conv1), "conv2": _conv_params(m.conv2)}


def _dpt_params(t) -> dict:
    p = {}
    for i in range(4):
        p[f"conv_{i}"] = _conv_params(getattr(t, f"conv_{i}"))
        ref = getattr(t, f"ref_{i}")
        rp = {"resConfUnit2": _rcu_params(ref.resConfUnit2)}
        if ref.with_skip:
            rp["resConfUnit1"] = _rcu_params(ref.resConfUnit1)
        p[f"ref_{i}"] = rp
    p["out_conv_0"] = _conv_params(t.out_conv[0])
    p["out_conv_1"] = _conv_params(t.out_conv[2])
    return p


# --------------------------------------------------------------------------
# probe decoders (reference evals/models/probes.py)
# --------------------------------------------------------------------------
def test_dpt_decoder_matches_reference(rng):
    from evals.models import probes as ref_probes

    from midvision_probe_tpu.models.probes import DPT

    t = ref_probes.DPT([24, 24, 24, 24], output_dim=5, hidden_dim=32,
                       kernel_size=3).eval()
    feats_t = [torch.from_numpy(rng.randn(2, 24, 7, 9).astype(np.float32))
               for _ in range(4)]
    with torch.no_grad():
        ref = t(list(feats_t)).numpy()

    model = DPT(output_dim=5, hidden_dim=32, kernel_size=3, resnet_mode=False)
    feats_j = [jnp.asarray(f.numpy().transpose(0, 2, 3, 1)) for f in feats_t]
    got = model.apply({"params": _dpt_params(t)}, feats_j)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), ref,
                               atol=1e-4, rtol=1e-3)


def test_dpt_resnet_decoder_matches_reference(rng):
    from evals.models import probes as ref_probes

    from midvision_probe_tpu.models.probes import DPT

    dims = [(16, 0), (24, 0), (32, 0), (48, 0)]
    t = ref_probes.DPT(dims, output_dim=1, hidden_dim=32, kernel_size=3).eval()
    shapes = [(2, 16, 32, 32), (2, 24, 16, 16), (2, 32, 8, 8), (2, 48, 4, 4)]
    feats_t = [torch.from_numpy(rng.randn(*s).astype(np.float32))
               for s in shapes]
    with torch.no_grad():
        ref = t(list(feats_t)).numpy()

    model = DPT(output_dim=1, hidden_dim=32, kernel_size=3, resnet_mode=True)
    feats_j = [jnp.asarray(f.numpy().transpose(0, 2, 3, 1)) for f in feats_t]
    got = model.apply({"params": _dpt_params(t)}, feats_j)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), ref,
                               atol=1e-4, rtol=1e-3)


def test_linear_and_multiscale_decoders_match_reference(rng):
    from evals.models import probes as ref_probes

    from midvision_probe_tpu.models.probes import Linear, MultiscaleHead

    feats_t = [torch.from_numpy(rng.randn(2, 12, 8, 8).astype(np.float32))
               for _ in range(4)]
    feats_j = [jnp.asarray(f.numpy().transpose(0, 2, 3, 1)) for f in feats_t]

    lin = ref_probes.Linear([12] * 4, output_dim=3, kernel_size=1).eval()
    with torch.no_grad():
        ref = lin(list(feats_t)).numpy()
    got = Linear(output_dim=3, kernel_size=1).apply(
        {"params": {"conv": _conv_params(lin.conv)}}, feats_j)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), ref,
                               atol=1e-5, rtol=1e-4)

    ms = ref_probes.MultiscaleHead([12] * 4, output_dim=3, hidden_dim=16,
                                   kernel_size=1).eval()
    with torch.no_grad():
        ref = ms(list(feats_t)).numpy()
    # per-layer convs are make_conv(num_layers=1) = a bare Conv2d
    p = {f"convs_{i}": _conv_params(ms.convs[i]) for i in range(4)}
    # make_conv(num_layers=3) => Sequential(conv, relu, conv, relu, conv)
    for j, idx in enumerate((0, 2, 4)):
        p[f"conv_mid_{j}"] = _conv_params(ms.conv_mid[idx])
    for j, idx in enumerate((0, 2)):
        p[f"conv_out_{j}"] = _conv_params(ms.conv_out[idx])
    got = MultiscaleHead(output_dim=3, hidden_dim=16, kernel_size=1).apply(
        {"params": p}, feats_j)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), ref,
                               atol=1e-4, rtol=1e-3)


def test_depth_head_bindepth_matches_reference(rng):
    """Full head: DPT decoder -> 256-bin relu/eps-normalized expectation
    (reference probes.py:160-200), including our defer-resize rewrite."""
    from evals.models import probes as ref_probes

    from midvision_probe_tpu.models.probes import DepthHead

    t = ref_probes.DepthHead([24] * 4, head_type="dpt",
                             prediction_type="bindepth", max_depth=10,
                             hidden_dim=32, kernel_size=3).eval()
    feats_t = [torch.from_numpy(rng.randn(2, 24, 7, 9).astype(np.float32))
               for _ in range(4)]
    with torch.no_grad():
        ref = t(list(feats_t)).numpy()  # (B, 1, H, W)

    head = DepthHead(feat_dim=[24] * 4, head_type="dpt",
                     prediction_type="bindepth", max_depth=10.0,
                     hidden_dim=32, kernel_size=3)
    feats_j = [jnp.asarray(f.numpy().transpose(0, 2, 3, 1)) for f in feats_t]
    import jax

    skeleton = head.init(jax.random.PRNGKey(0), feats_j)
    (wrapper_key,) = skeleton["params"].keys()  # auto-named decoder module
    got = head.apply({"params": {wrapper_key: _dpt_params(t.head)}}, feats_j)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), ref,
                               atol=1e-4, rtol=1e-3)


# --------------------------------------------------------------------------
# losses (reference evals/utils/losses.py)
# --------------------------------------------------------------------------
def test_losses_match_reference(rng):
    from evals.utils import losses as ref_losses

    from midvision_probe_tpu.utils import losses

    pr = (rng.rand(2, 16, 16).astype(np.float32) * 9 + 0.3)
    gt = (rng.rand(2, 16, 16).astype(np.float32) * 9 + 0.3)
    gt[rng.rand(2, 16, 16) < 0.2] = 0.0  # invalid pixels

    np.testing.assert_allclose(
        float(losses.sig_loss(jnp.asarray(pr), jnp.asarray(gt))),
        float(ref_losses.sig_loss(_t(pr), _t(gt))), rtol=1e-5)
    np.testing.assert_allclose(
        float(losses.depth_si_loss(jnp.asarray(pr), jnp.asarray(gt))),
        float(ref_losses.depth_si_loss(_t(pr), _t(gt))), rtol=1e-5)

    sn_pr = rng.randn(2, 3, 16, 16).astype(np.float32)
    sn_gt = rng.randn(2, 3, 16, 16).astype(np.float32)
    mask = (rng.rand(2, 1, 16, 16) > 0.3).astype(np.float32)
    ref_ang = float(ref_losses.angular_loss(_t(sn_pr), _t(sn_gt), _t(mask)))
    got_ang = float(losses.angular_loss(
        jnp.asarray(sn_pr.transpose(0, 2, 3, 1)),
        jnp.asarray(sn_gt.transpose(0, 2, 3, 1)),
        jnp.asarray(mask.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got_ang, ref_ang, rtol=1e-5)

    ref_l1 = float(ref_losses.snorm_l1_loss(_t(sn_pr), _t(sn_gt), _t(mask)))
    got_l1 = float(losses.snorm_l1_loss(
        jnp.asarray(sn_pr.transpose(0, 2, 3, 1)),
        jnp.asarray(sn_gt.transpose(0, 2, 3, 1)),
        jnp.asarray(mask.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got_l1, ref_l1, rtol=1e-5)

    im1 = rng.rand(2, 3, 24, 24).astype(np.float32)
    im2 = rng.rand(2, 3, 24, 24).astype(np.float32)
    np.testing.assert_allclose(
        float(losses.ssim(jnp.asarray(im1.transpose(0, 2, 3, 1)),
                          jnp.asarray(im2.transpose(0, 2, 3, 1)))),
        float(ref_losses.ssim(_t(im1), _t(im2))), rtol=1e-4)


def test_gradient_loss_fix_matches_reference_on_single_map(rng):
    """The reference's gradient_loss means to slice SPACE but slices
    batch/channel on its (B, 1, H, W) input (documented non-port). On a
    single (H, W) map its axis arithmetic lands on space — the intended
    semantics — and our fixed batch version must reproduce it exactly."""
    from evals.utils import losses as ref_losses

    from midvision_probe_tpu.utils import losses

    pr = (rng.rand(20, 24).astype(np.float32) * 9 + 0.3)
    gt = (rng.rand(20, 24).astype(np.float32) * 9 + 0.3)
    gt[rng.rand(20, 24) < 0.2] = 0.0

    ref = float(ref_losses.gradient_loss(_t(pr), _t(gt)))
    got = float(losses.gradient_loss(jnp.asarray(pr[None]),
                                     jnp.asarray(gt[None])))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


# --------------------------------------------------------------------------
# metric protocol (reference evals/utils/metrics.py)
# --------------------------------------------------------------------------
def _seg_map(rng, b, h, w):
    from midvision_probe_tpu.utils.metrics import STUFF, THINGS

    ids = np.asarray(list(STUFF[:4]) + list(THINGS[:4]))
    return ids[rng.randint(0, len(ids), size=(b, h, w))].astype(np.int32)


@pytest.mark.parametrize("scale_invariant", [False, True])
def test_evaluate_depth_matches_reference(rng, scale_invariant):
    from evals.utils import metrics as ref_metrics

    from midvision_probe_tpu.utils import metrics

    b, h, w = 2, 24, 32
    pr = (rng.rand(b, h, w).astype(np.float32) * 9 + 0.3)
    gt = (rng.rand(b, h, w).astype(np.float32) * 9 + 0.3)
    gt[rng.rand(b, h, w) < 0.15] = 0.0
    seg = _seg_map(rng, b, h, w)

    ref_g, ref_lvl, _ = ref_metrics.evaluate_depth(
        _t(pr), _t(gt), _t(seg), scale_invariant=scale_invariant)
    got_g, got_lvl = metrics.evaluate_depth(
        jnp.asarray(pr), jnp.asarray(gt), jnp.asarray(seg),
        scale_invariant=scale_invariant)

    shared = set(ref_g) & set(got_g)
    assert {"d1", "d2", "d3", "rmse", "stuff_d1", "things_d1",
            "stuff_rmse", "things_rmse", "variance_ratio"} <= shared
    for k in sorted(shared):
        # the reference keeps (B,1,1) keepdims on some stats; values match
        np.testing.assert_allclose(
            np.asarray(got_g[k]).reshape(-1), ref_g[k].numpy().reshape(-1),
            rtol=2e-4, atol=1e-5, err_msg=f"global metric {k}")
    assert set(ref_lvl) == set(got_lvl)
    for lk in ref_lvl:
        for k in ref_lvl[lk]:
            np.testing.assert_allclose(
                np.asarray(got_lvl[lk][k]).reshape(-1),
                ref_lvl[lk][k].numpy().reshape(-1),
                rtol=2e-4, atol=1e-5, err_msg=f"level {lk} metric {k}")


def test_evaluate_surface_norm_matches_reference(rng):
    from evals.utils import metrics as ref_metrics

    from midvision_probe_tpu.utils import metrics

    b, h, w = 2, 24, 32
    pr = rng.randn(b, 3, h, w).astype(np.float32)
    gt = rng.randn(b, 3, h, w).astype(np.float32)
    gt[:, :, rng.rand(h, w) < 0.1] = 0.0  # invalid normals
    seg = _seg_map(rng, b, h, w)

    ref_g, ref_lvl, _ = ref_metrics.evaluate_surface_norm(
        _t(pr), _t(gt), _t(seg))
    got_g, got_lvl = metrics.evaluate_surface_norm(
        jnp.asarray(pr.transpose(0, 2, 3, 1)),
        jnp.asarray(gt.transpose(0, 2, 3, 1)), jnp.asarray(seg))

    shared = set(ref_g) & set(got_g)
    assert {"d1", "d2", "d3", "rmse"} <= shared
    for k in sorted(shared):
        np.testing.assert_allclose(
            np.asarray(got_g[k]), ref_g[k].numpy(), rtol=2e-4, atol=2e-4,
            err_msg=f"global metric {k}")
    for lk in ref_lvl:
        for k in ref_lvl[lk]:
            np.testing.assert_allclose(
                np.asarray(got_lvl[lk][k]), ref_lvl[lk][k].numpy(),
                rtol=2e-4, atol=2e-4, err_msg=f"level {lk} metric {k}")


def test_match_scale_and_shift_matches_reference(rng):
    from evals.utils import metrics as ref_metrics

    from midvision_probe_tpu.utils import metrics

    pr = (rng.rand(3, 16, 16).astype(np.float32) * 5 + 0.1)
    gt = (2.3 * pr + 0.7).astype(np.float32)
    gt[rng.rand(3, 16, 16) < 0.2] = 0.0
    ref = ref_metrics.match_scale_and_shift(_t(pr), _t(gt)).numpy()
    got = np.asarray(metrics.match_scale_and_shift(jnp.asarray(pr),
                                                   jnp.asarray(gt)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


# --------------------------------------------------------------------------
# optimizer schedule + SE(3) utils
# --------------------------------------------------------------------------
def test_schedule_matches_reference():
    from evals.utils import optim as ref_optim

    from midvision_probe_tpu.utils.optim import cosine_decay_linear_warmup_factor

    for step in (0, 1, 5, 150, 151, 1000, 7569):
        ref = ref_optim.cosine_decay_linear_warmup(step, 7570, 150.0)
        got = float(cosine_decay_linear_warmup_factor(step, 7570, 150.0))
        # ours evaluates in f32 inside jit; the reference in f64 numpy
        np.testing.assert_allclose(got, ref, rtol=1e-5, err_msg=f"step {step}")


def test_transformations_match_reference(rng):
    from evals.utils import transformations as ref_tf
    from scipy.spatial.transform import Rotation

    from midvision_probe_tpu.utils import transformations as tf

    R = Rotation.random(2, random_state=3).as_matrix().astype(np.float32)
    t = rng.randn(2, 3).astype(np.float32)
    Rt = np.concatenate([R, t[:, :, None]], axis=2)  # (B, 3, 4)
    pts = rng.randn(2, 11, 3).astype(np.float32)

    for inverse in (False, True):
        ref = ref_tf.transform_points_Rt(_t(pts), _t(Rt), inverse=inverse)
        got = tf.transform_points_Rt(jnp.asarray(pts), jnp.asarray(Rt),
                                     inverse=inverse)
        np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=1e-4,
                                   atol=1e-5)

    ref = ref_tf.so3_rotation_angle(_t(R))
    got = tf.so3_rotation_angle(jnp.asarray(R))
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=1e-4)


# --------------------------------------------------------------------------
# shared model utils (reference evals/models/utils.py — the uniform
# feature contract every wrapper uses)
# --------------------------------------------------------------------------
def test_tokens_to_output_matches_reference(rng):
    from evals.models import utils as ref_utils

    from midvision_probe_tpu.models.feature_extractor import tokens_to_output

    B, h, w, C = 2, 3, 4, 8
    dense = rng.randn(B, h * w, C).astype(np.float32)
    cls = rng.randn(B, C).astype(np.float32)
    for mode in ("cls", "gap", "dense", "dense-cls"):
        ref = ref_utils.tokens_to_output(mode, _t(dense), _t(cls), (h, w))
        got = np.asarray(tokens_to_output(mode, jnp.asarray(dense),
                                          jnp.asarray(cls), (h, w)))
        if mode in ("dense", "dense-cls"):
            got = got.transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, ref.numpy(), rtol=1e-6,
                                   err_msg=mode)


def test_resize_pos_embed_matches_reference(rng):
    from evals.models import utils as ref_utils

    from midvision_probe_tpu.models.vit import resize_pos_embed

    for has_cls in (True, False):
        n = 7 * 7 + (1 if has_cls else 0)
        pos = rng.randn(n, 16).astype(np.float32)
        ref = ref_utils.resize_pos_embed(_t(pos), (11, 9),
                                         has_cls_token=has_cls).numpy()
        got = np.asarray(resize_pos_embed(jnp.asarray(pos), (11, 9),
                                          has_cls_token=has_cls))
        np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4,
                                   err_msg=f"has_cls={has_cls}")


def test_sincos_pos_embed_matches_reference():
    from evals.models import utils as ref_utils

    from midvision_probe_tpu.models.vit import get_2d_sincos_pos_embed

    for add_cls in (False, True):
        ref = ref_utils.get_2d_sincos_pos_embed(32, (5, 7),
                                                add_cls_token=add_cls)
        got = np.asarray(get_2d_sincos_pos_embed(32, (5, 7),
                                                 add_cls_token=add_cls))
        np.testing.assert_allclose(got, ref, atol=1e-6)


def test_center_padding_matches_reference(rng):
    from evals.models import utils as ref_utils

    from midvision_probe_tpu.ops.image import center_padding

    x = rng.randn(2, 3, 29, 34).astype(np.float32)
    ref = ref_utils.center_padding(_t(x), 16).numpy()
    got = np.asarray(center_padding(jnp.asarray(x.transpose(0, 2, 3, 1)), 16))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), ref, rtol=1e-6)


# --------------------------------------------------------------------------
# correspondence utilities (reference evals/utils/correspondence.py; faiss
# itself is stubbed — only the pure-torch functions run)
# --------------------------------------------------------------------------
def _import_ref_correspondence():
    for name in ("faiss", "faiss.contrib", "faiss.contrib.torch_utils"):
        sys.modules.setdefault(name, types.ModuleType(name))
    # the module creates a GPU handle at import time (correspondence.py:11)
    sys.modules["faiss"].StandardGpuResources = lambda: None
    sys.modules["faiss"].contrib = sys.modules["faiss.contrib"]
    from evals.utils import correspondence as ref_corr
    return ref_corr


def test_correspondence_utils_match_reference(rng):
    ref_corr = _import_ref_correspondence()

    from midvision_probe_tpu.ops.matching import calculate_ratio_test
    from midvision_probe_tpu.utils import correspondence as corr

    # Lowe ratio-test weights
    d = np.sort(rng.rand(3, 17, 2).astype(np.float32), axis=-1)
    np.testing.assert_allclose(
        np.asarray(calculate_ratio_test(jnp.asarray(d))),
        ref_corr.calculate_ratio_test(_t(d)).numpy(), rtol=1e-6)

    # argmax_2d coordinate convention (x, y)
    m = rng.randn(2, 5, 9, 13).astype(np.float32)
    np.testing.assert_array_equal(
        np.asarray(corr.argmax_2d(jnp.asarray(m))),
        ref_corr.argmax_2d(_t(m)).numpy())

    # depth unprojection + reprojection round trip
    K = np.asarray([[40.0, 0, 16], [0, 42.0, 12], [0, 0, 1]], np.float32)
    depth = (rng.rand(24, 32).astype(np.float32) * 3 + 0.5)
    ref_pts = ref_corr.grid_to_pointcloud(
        _t(np.linalg.inv(K)), _t(depth[None])).numpy()
    got_pts = np.asarray(corr.grid_to_pointcloud(
        jnp.asarray(np.linalg.inv(K)), jnp.asarray(depth)))
    np.testing.assert_allclose(got_pts, ref_pts, rtol=1e-4, atol=1e-5)

    uv_ref = ref_corr.project_3dto2d(_t(ref_pts), _t(K)).numpy()
    uv_got = np.asarray(corr.project_3dto2d(jnp.asarray(got_pts),
                                            jnp.asarray(K)))
    np.testing.assert_allclose(uv_got, uv_ref, rtol=1e-4, atol=1e-4)

    # grid_sample at projected points (align_corners=False path)
    feats = rng.randn(8, 24, 32).astype(np.float32)  # (C, h, w) for torch
    ref_f = ref_corr.sample_pointcloud_features(
        _t(feats), _t(K), _t(ref_pts.copy()), (24, 32)).numpy()
    got_f = np.asarray(corr.sample_pointcloud_features(
        jnp.asarray(feats.transpose(1, 2, 0)), jnp.asarray(K),
        jnp.asarray(got_pts), (24, 32)))
    np.testing.assert_allclose(got_f, ref_f, atol=1e-4, rtol=1e-3)


# --------------------------------------------------------------------------
# MaskCut spectral pipeline (reference evals/models/maskcut_processor.py;
# viz/IO deps stubbed, sklearn+scipy run for real)
# --------------------------------------------------------------------------
def _import_ref_maskcut():
    for name in ("torchvision", "torchvision.transforms",
                 "torchvision.transforms.functional", "pycocotools",
                 "pycocotools.mask", "seaborn", "wandb", "pydensecrf",
                 "pydensecrf.densecrf", "pydensecrf.utils"):
        mod = types.ModuleType(name)
        mod.__path__ = []  # mark as package so submodule imports resolve
        sys.modules.setdefault(name, mod)
    sys.modules["torchvision"].transforms = sys.modules[
        "torchvision.transforms"]
    sys.modules["torchvision.transforms"].functional = sys.modules[
        "torchvision.transforms.functional"]
    sys.modules["pycocotools"].mask = sys.modules["pycocotools.mask"]
    sys.modules["pydensecrf"].densecrf = sys.modules["pydensecrf.densecrf"]
    sys.modules["pydensecrf"].utils = sys.modules["pydensecrf.utils"]
    for attr in ("unary_from_softmax", "create_pairwise_bilateral",
                 "create_pairwise_gaussian"):
        setattr(sys.modules["pydensecrf.utils"], attr, lambda *a, **k: None)
    sys.modules["pydensecrf.densecrf"].DenseCRF2D = lambda *a, **k: None
    from evals.models import maskcut_processor as ref_mc
    return ref_mc


def test_maskcut_spectral_matches_reference(rng):
    ref_mc = _import_ref_maskcut()

    from midvision_probe_tpu.models.maskcut import MaskCutProcessor

    ref = ref_mc.MaskCutProcessor.__new__(ref_mc.MaskCutProcessor)
    ours = MaskCutProcessor(feature_extractor_fn=lambda x: x)

    # two well-separated patch populations -> a bimodal affinity histogram,
    # so the KMeans-tau path is deterministic in both implementations
    base = rng.randn(16, 1).astype(np.float32)
    f = np.concatenate([base + 0.05 * rng.randn(16, 18).astype(np.float32),
                        -base + 0.05 * rng.randn(16, 18).astype(np.float32)],
                       axis=1)  # (C=16, N=36)
    t = torch.from_numpy(f)

    np.random.seed(0)
    A_ref, D_ref = ref.get_affinity_matrix(t, tau=0.15, is_wandb=False)
    np.random.seed(0)
    A_got, D_got = ours.get_affinity_matrix(f, tau=0.15)
    np.testing.assert_allclose(A_got, A_ref, atol=1e-6)
    np.testing.assert_allclose(D_got, D_ref, atol=1e-6)

    eig_ref, vec_ref = ref.second_smallest_eigenvector(A_ref, D_ref)
    eig_got, vec_got = ours.second_smallest_eigenvector(A_got, D_got)
    # generalized eigenvectors are sign-ambiguous
    s = np.sign(np.dot(vec_ref, vec_got)) or 1.0
    np.testing.assert_allclose(s * vec_got, vec_ref, atol=1e-6)

    bip_ref = ref.get_salient_areas(vec_ref)
    bip_got = ours.get_salient_areas(s * vec_got)
    np.testing.assert_array_equal(bip_got, bip_ref)


def test_maskcut_iou_matches_reference_metric(rng):
    """The processor's IoU mask filter (maskcut_processor.py imports
    evals.utils.metric) vs our _iou."""
    _import_ref_maskcut()
    from evals.utils import metric as ref_metric

    from midvision_probe_tpu.models.maskcut import _iou

    a = (rng.rand(20, 20) > 0.5)
    b = (rng.rand(20, 20) > 0.5)
    np.testing.assert_allclose(_iou(a, b),
                               float(ref_metric.IoU(_t(a), _t(b))),
                               rtol=1e-6)


# --------------------------------------------------------------------------
# dataset utilities (reference evals/datasets/utils.py; torchvision/
# albumentations stubbed — only the pure numpy/torch geometry runs)
# --------------------------------------------------------------------------
def _import_ref_dataset_utils():
    for name in ("albumentations", "torchvision", "torchvision.transforms",
                 "torchvision.transforms.functional"):
        mod = types.ModuleType(name)
        mod.__path__ = []
        sys.modules.setdefault(name, mod)
    sys.modules["torchvision"].transforms = sys.modules[
        "torchvision.transforms"]
    sys.modules["torchvision.transforms"].functional = sys.modules[
        "torchvision.transforms.functional"]
    from evals.datasets import utils as ref_du
    return ref_du


def test_compute_normal_matches_reference(rng):
    """NAVI trains surface normals DERIVED from depth via cross products
    (navi.py + datasets/utils.py:236-275) — the geometry must match."""
    ref_du = _import_ref_dataset_utils()

    from midvision_probe_tpu.datasets.navi_utils import compute_normal

    depth = (rng.rand(20, 26, 1).astype(np.float32) * 2 + 0.5)
    depth[rng.rand(20, 26) < 0.1, 0] = 0.0  # holes
    focal = 400.0
    # reference is channels-first (1, H, W) -> (3, H, W); ours (H, W, 1).
    # COPY: the reference mutates its input in place (holes -> 1e6,
    # utils.py:252) and torch.from_numpy shares the numpy buffer.
    ref = ref_du.compute_normal(_t(depth.transpose(2, 0, 1).copy()), focal)
    got = np.asarray(compute_normal(depth, focal))
    ref = ref.numpy().transpose(1, 2, 0)
    # normals TOUCHING a hole are numerically meaningless in the protocol:
    # holes become depth 1e6 (utils.py:252), so adjacent cross products are
    # ~1e12-scale cancellations whose direction is f32-rounding noise in
    # BOTH implementations. Compare the well-conditioned pixels; the rest
    # must still be unit-or-zero vectors.
    hole = (depth[..., 0] <= 0)
    import scipy.ndimage as ndi
    chaotic = ndi.binary_dilation(hole, np.ones((3, 3), bool))
    np.testing.assert_allclose(got[~chaotic], ref[~chaotic],
                               atol=1e-4, rtol=1e-3)
    norms = np.linalg.norm(got[chaotic], axis=-1)
    assert np.all((norms < 1e-6) | (np.abs(norms - 1) < 1e-4))


def test_bbox_crop_matches_reference(rng):
    """NAVI square bbox crop around valid depth (datasets/utils.py:300-329)."""
    ref_du = _import_ref_dataset_utils()

    from midvision_probe_tpu.datasets.navi_utils import bbox_crop

    h, w = 40, 56
    image = rng.randint(0, 255, (h, w, 3)).astype(np.uint8)
    depth = np.zeros((h, w, 1), np.float32)
    depth[12:30, 20:44, 0] = rng.rand(18, 24) + 0.5  # object region
    xyz = rng.randn(h, w, 3).astype(np.float32)

    # reference operates channels-first
    ref_img, ref_depth, ref_xyz = ref_du.bbox_crop(
        _t(image.transpose(2, 0, 1)), _t(depth.transpose(2, 0, 1)),
        _t(xyz.transpose(2, 0, 1)))
    got_img, got_depth, got_xyz = bbox_crop(image, depth, xyz)
    np.testing.assert_array_equal(np.asarray(got_img),
                                  ref_img.numpy().transpose(1, 2, 0))
    np.testing.assert_allclose(np.asarray(got_depth),
                               ref_depth.numpy().transpose(1, 2, 0))
    np.testing.assert_allclose(np.asarray(got_xyz),
                               ref_xyz.numpy().transpose(1, 2, 0))


def test_quaternion_and_camera_matrices_match_reference(rng):
    ref_du = _import_ref_dataset_utils()

    from midvision_probe_tpu.datasets import navi_utils

    q = rng.randn(4).astype(np.float32)
    q = q / np.linalg.norm(q)
    ref_R = ref_du.quaternion_to_rotation_matrix(_t(q)).numpy()
    got_R = np.asarray(navi_utils.quaternion_to_rotation_matrix(q))
    np.testing.assert_allclose(got_R, ref_R, atol=1e-6)

    ann = {
        "camera": {
            "q": q.tolist(),
            "t": rng.randn(3).astype(np.float32).tolist(),
        }
    }
    ref_Rt = ref_du.camera_matrices_from_annotation(ann)
    got_Rt = navi_utils.camera_matrices_from_annotation(ann)
    np.testing.assert_allclose(np.asarray(got_Rt),
                               np.asarray(ref_Rt), atol=1e-6)


def test_maskcut_forward_matches_reference(rng, monkeypatch):
    """The full iterative N-mask extraction loop (maskcut_processor.py:
    215-296): per-round KMeans-tau affinity, eigh bipartition, seed and
    corner-reversal heuristics, connected-component box, IoU/area
    rejection, and the painting-based feature masking between rounds."""
    ref_mc = _import_ref_maskcut()

    from midvision_probe_tpu.models.maskcut import MaskCutProcessor

    # reference runs on .cuda() tensors and logs round 0 to wandb
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self: self,
                        raising=False)
    sys.modules["wandb"].log = lambda *a, **k: None
    sys.modules["wandb"].Image = lambda *a, **k: None
    sys.modules["seaborn"].histplot = lambda *a, **k: None

    ref = ref_mc.MaskCutProcessor.__new__(ref_mc.MaskCutProcessor)
    ref.tau = 0.15
    ours = MaskCutProcessor(feature_extractor_fn=lambda x: x, tau=0.15)

    # a spatially-coherent two-object scene on a square 12x12 patch grid:
    # object patches share one feature direction, background another
    g = 12
    obj = np.zeros((g, g), bool)
    obj[2:6, 2:7] = True    # object 1
    obj[7:11, 8:11] = True  # object 2
    d1 = rng.randn(16).astype(np.float32)
    d0 = rng.randn(16).astype(np.float32)
    f = np.where(obj.reshape(-1)[None], d1[:, None], d0[:, None])
    f = (f + 0.05 * rng.randn(16, g * g)).astype(np.float32)  # (C, N)

    dims = (g, g)
    scales = (16, 16)
    init_size = (g * 16, g * 16)

    np.random.seed(3)
    with torch.no_grad():
        r_seed, r_bips, r_eigs = ref.maskcut_forward(
            torch.from_numpy(f.copy()), list(dims), scales, init_size, 2)
    np.random.seed(3)
    o_seed, o_bips, o_eigs = ours.maskcut_forward(
        f.copy(), dims, scales, init_size, 2)

    assert o_seed == int(r_seed)
    assert len(o_bips) == len(r_bips) == 2
    for got, want in zip(o_bips, r_bips):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-6)
    for got, want in zip(o_eigs, r_eigs):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)


# --------------------------------------------------------------------------
# 2D RoPE — the reference's pure-torch fallback
# (croco_models/pos_embed.py:110-157) IS the semantics of the CUDA kernel
# our Pallas op replaces; run it as the oracle for both dispatch paths.
# --------------------------------------------------------------------------
def _import_ref_pos_embed():
    from evals.models.croco_models import pos_embed as ref_pe
    return ref_pe


def test_rope2d_matches_reference(rng):
    ref_pe = _import_ref_pos_embed()
    rope = ref_pe.RoPE2D(freq=100.0)

    from midvision_probe_tpu.ops.rope2d import rope_2d

    B, H, N, D = 2, 3, 35, 16
    tokens = rng.randn(B, H, N, D).astype(np.float32)
    pos = rng.randint(0, 13, size=(B, N, 2)).astype(np.int64)
    with torch.no_grad():
        want = rope(_t(tokens.copy()), _t(pos)).numpy()

    got = np.asarray(rope_2d(jnp.asarray(tokens), jnp.asarray(pos),
                             use_pallas=False))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)

    # the Pallas TPU kernel, interpreted on CPU (same code path as chip)
    got_k = np.asarray(rope_2d(jnp.asarray(tokens), jnp.asarray(pos),
                               use_pallas=True, interpret=True))
    np.testing.assert_allclose(got_k, want, atol=1e-5, rtol=1e-5)


# --------------------------------------------------------------------------
# CroCo encoder end-to-end: a real (tiny) reference CroCoNet's state_dict
# through the RELEASED-layout converter path (remap source="croco" →
# convert_vit_timm), per-block taps vs the reference wrapper's tap loop
# (evals/models/croco.py:168-175 — raw block outputs, no enc_norm).
# --------------------------------------------------------------------------
@pytest.mark.parametrize("pos_mode", ["cosine", "RoPE100"])
def test_croco_encoder_matches_reference(rng, pos_mode):
    from evals.models.croco_models.croco import CroCoNet

    from midvision_probe_tpu.models.convert.remap import unwrap_checkpoint
    from midvision_probe_tpu.models.convert.vit_convert import convert_vit_timm
    from midvision_probe_tpu.models.vit import ViT, ViTConfig

    torch.manual_seed(3)
    m = CroCoNet(img_size=32, patch_size=8, enc_embed_dim=32, enc_depth=2,
                 enc_num_heads=2, dec_embed_dim=32, dec_depth=1,
                 dec_num_heads=2, pos_embed=pos_mode).eval()

    sd = unwrap_checkpoint({"model": m.state_dict()}, source="croco")
    cfg = ViTConfig(
        patch_size=8, width=32, depth=2, num_heads=2, class_token=False,
        pos_embed="sincos2d" if pos_mode == "cosine" else "none",
        rope=pos_mode.startswith("RoPE"),
    )
    variables = convert_vit_timm(sd, cfg)

    x = rng.rand(2, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        t, pos = m.patch_embed(_t(x.transpose(0, 3, 1, 2)))
        if m.enc_pos_embed is not None:
            t = t + m.enc_pos_embed[None, ...]
        refs = []
        for blk in m.enc_blocks:
            t = blk(t, pos)
            refs.append(t.numpy())

    res = ViT(cfg).apply(variables, jnp.asarray(x), taps=(0, 1))
    assert len(res["tokens"]) == len(refs)
    for got, want in zip(res["tokens"], refs):
        np.testing.assert_allclose(np.asarray(got), want,
                                   atol=1e-4, rtol=1e-3)


# --------------------------------------------------------------------------
# Objectness metric formulas — the reference driver's own compute_* fns
# (train_generic_objectness.py:56-183; driver deps stubbed)
# --------------------------------------------------------------------------
def _import_ref_objectness():
    for name in ("hydra", "hydra.utils", "omegaconf", "wandb",
                 "torchvision", "torchvision.transforms", "submitit"):
        mod = types.ModuleType(name)
        mod.__path__ = []
        sys.modules.setdefault(name, mod)
    sys.modules["hydra"].utils = sys.modules["hydra.utils"]
    sys.modules["hydra"].main = lambda *a, **k: (lambda f: f)
    sys.modules["hydra.utils"].instantiate = lambda *a, **k: None
    sys.modules["omegaconf"].DictConfig = dict
    sys.modules["omegaconf"].OmegaConf = types.SimpleNamespace(
        to_yaml=lambda c: str(c))
    sys.modules["wandb"].require = lambda *a, **k: None
    sys.modules["torchvision"].transforms = sys.modules[
        "torchvision.transforms"]
    import importlib
    spec = importlib.util.spec_from_file_location(
        "ref_train_generic_objectness",
        os.path.join(REF, "train_generic_objectness.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_objectness_formulas_match_reference(rng):
    ref = _import_ref_objectness()

    from midvision_probe_tpu.utils import objectness as ours

    for _ in range(4):
        pred = (rng.rand(24, 24) > rng.rand()).astype(np.uint8)
        gt = (rng.rand(24, 24) > rng.rand()).astype(np.uint8)
        p_ref, r_ref = ref.compute_precision_recall(pred, gt)
        p_got, r_got = ours.compute_precision_recall(pred, gt)
        np.testing.assert_allclose([p_got, r_got], [p_ref, r_ref],
                                   rtol=1e-6)
        np.testing.assert_allclose(ours.compute_f_measure(p_got, r_got),
                                   ref.compute_f_measure(p_ref, r_ref),
                                   rtol=1e-6)
        np.testing.assert_allclose(ours.compute_iou(pred, gt),
                                   ref.compute_iou(pred, gt), rtol=1e-6)
        np.testing.assert_allclose(ours.compute_accuracy(pred, gt),
                                   ref.compute_accuracy(pred, gt), rtol=1e-6)
        assert ours.compute_corloc(pred, gt) == ref.compute_corloc(pred, gt)


# --------------------------------------------------------------------------
# SPair PCK protocol — the reference driver's own compute_errors +
# evaluate_dataset (evaluate_spair_correspondence.py:45-123), executed with
# a feature-stub model so the ENTIRE error/recall/confusion pipeline (kp
# grid_sample, heatmap argmax, thresh_scale normalization, invalid-kp 1e3
# fill, NN search, recall aggregation, confusion matrix) is the oracle.
#
# Only the reachable path is compared: the reference's ``mask_feats=True``
# branch is dead code that CRASHES as written — ``feats * masks``
# broadcasts (2, C, h, w) against (2, h, w), which torch rejects at
# non-singleton dim 1 (evaluate_spair_correspondence.py:61-63; no caller
# passes mask_feats). Our evaluator implements the intended per-pixel
# masking (README "Deliberate non-ports").
# --------------------------------------------------------------------------
def _scoped_stub_modules(monkeypatch, names):
    """setdefault-like stub installation routed through monkeypatch so the
    sys.modules mutations are undone per-test (ADVICE r3). Pre-existing
    modules keep their identity (cached ``evals.*`` imports hold references
    to them); only newly-created stubs are removed on teardown."""
    mods = {}
    for name in names:
        mod = sys.modules.get(name)
        if mod is None:
            mod = types.ModuleType(name)
            mod.__path__ = []
            monkeypatch.setitem(sys.modules, name, mod)
        mods[name] = mod
    return mods


def _import_ref_spair(monkeypatch):
    m = _scoped_stub_modules(
        monkeypatch, ("hydra", "hydra.utils", "omegaconf", "wandb",
                      "torchvision", "torchvision.transforms"))
    mp = monkeypatch.setattr
    mp(m["hydra"], "utils", m["hydra.utils"], raising=False)
    mp(m["hydra"], "main", lambda *a, **k: (lambda f: f), raising=False)
    mp(m["hydra.utils"], "instantiate", lambda *a, **k: None, raising=False)
    mp(m["omegaconf"], "DictConfig", dict, raising=False)
    mp(m["omegaconf"], "OmegaConf", types.SimpleNamespace(
        to_yaml=lambda c: str(c), to_container=lambda *a, **k: {}),
       raising=False)
    mp(m["torchvision"], "transforms", m["torchvision.transforms"],
       raising=False)
    import importlib
    spec = importlib.util.spec_from_file_location(
        "ref_evaluate_spair",
        os.path.join(REF, "evaluate_spair_correspondence.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_spair_protocol_matches_reference(rng, monkeypatch):
    _import_ref_correspondence()  # stubs faiss (correspondence.py:4-11)
    ref = _import_ref_spair(monkeypatch)
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self,
                        raising=False)

    import evaluate_spair_correspondence as ours_driver
    from midvision_probe_tpu.evaluators.spair import batch_errors

    S, C, K, n_pairs = 64, 16, 6, 3
    h = S // 16
    raw = rng.randn(n_pairs, 2, C, h, h).astype(np.float32)
    # the reference L2-normalizes model output over channels (:59); feed
    # our evaluator the identically-normalized maps (its make_feature_fn
    # normalizes the same way, tested end-to-end elsewhere)
    feats_n = raw / np.linalg.norm(raw, axis=2, keepdims=True)

    kps = rng.randint(0, S, size=(n_pairs, 2, K, 3)).astype(np.float32)
    kps[..., 2] = (rng.rand(n_pairs, 2, K) > 0.25).astype(np.float32)
    kps[:, :, 0, 2] = 1.0  # at least one kp visible in both views
    # bbox-scale normalizers sized so per-kp errors straddle the 0.10
    # threshold (recall is neither 0 nor 100)
    thresh_scales = (rng.rand(n_pairs) * 0.3 + 0.02).astype(np.float32)

    class _StubModel:
        """Returns the pre-drawn (2, C, h, w) features per call, in
        dataset order — evaluate_dataset calls it once per pair."""

        def __init__(self):
            self.i = 0

        def __call__(self, images):
            assert images.shape == (2, 3, S, S)
            out = torch.from_numpy(raw[self.i].copy())
            self.i += 1
            return out

    class _RefDataset:
        def __len__(self):
            return n_pairs

        def __getitem__(self, i):
            img = torch.zeros(3, S, S)
            mask = np.zeros((S, S), dtype=np.float32)
            return (img, mask, torch.from_numpy(kps[i, 0].copy()),
                    img.clone(), mask, torch.from_numpy(kps[i, 1].copy()),
                    torch.tensor(float(thresh_scales[i])), None)

    ref_recall, ref_conf = ref.evaluate_dataset(
        _StubModel(), _RefDataset(), 0.10)

    # ---- per-pair raw outputs incl. heatmaps (compute_errors, pair 0)
    e_same, e_nn, i_same, i_nn, heat = ref.compute_errors(
        _StubModel(), _RefDataset()[0], return_heatmaps=True)

    feats_nhwc = feats_n.transpose(0, 1, 3, 4, 2)  # (n, 2, h, w, C)
    out = batch_errors(
        jnp.asarray(feats_nhwc[:1, 0]), jnp.asarray(feats_nhwc[:1, 1]),
        jnp.asarray(kps[:1, 0]), jnp.asarray(kps[:1, 1]),
        jnp.asarray(thresh_scales[:1]), S, return_heatmaps=True)
    g_same, g_nn, g_in, g_idx, g_heat = [np.asarray(x)[0] for x in out]
    sel = g_in.astype(bool)
    assert np.array_equal(np.nonzero(sel)[0], i_same.numpy())
    np.testing.assert_allclose(g_same[sel], e_same.numpy(),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(g_nn[sel], e_nn.numpy(),
                               atol=1e-4, rtol=1e-4)
    assert np.array_equal(g_idx[sel], i_nn.numpy())
    np.testing.assert_allclose(g_heat, heat.numpy(), atol=1e-4)

    # ---- full-dataset aggregation through OUR driver's evaluate_dataset
    class _OurDataset:
        def __len__(self):
            return n_pairs

        def __getitem__(self, i):
            return {"img_i": np.zeros((S, S, 3), np.float32),
                    "img_j": np.zeros((S, S, 3), np.float32),
                    "kps_i": kps[i, 0], "kps_j": kps[i, 1],
                    "thresh_scale": thresh_scales[i]}

    def feature_fn(imgs):
        # the driver stacks [img_i]*b + [img_j]*b per batch
        b = imgs.shape[0] // 2
        assert b == n_pairs
        return jnp.asarray(
            np.concatenate([feats_nhwc[:, 0], feats_nhwc[:, 1]], axis=0))

    got_recall, got_conf = ours_driver.evaluate_dataset(
        feature_fn, _OurDataset(), batch_pairs=8, image_size=S)
    np.testing.assert_allclose(got_recall, ref_recall, atol=1e-4)
    np.testing.assert_allclose(got_conf, ref_conf)


# --------------------------------------------------------------------------
# NAVI matcher end-to-end — the reference's estimate_correspondence_xyz
# (correspondence.py:235-263: bicubic feature upsample → z>0 masking →
# cosine k=2 kNN → Lowe ratio weights → top-num_corr selection) plus the
# driver's full error chain (evaluate_navi_correspondence.py:178-223).
# faiss.GpuIndexFlatL2 is replaced by an exact torch brute-force index, so
# every other line of reference code runs for real.
# --------------------------------------------------------------------------
def test_navi_matcher_end_to_end_matches_reference(rng, monkeypatch):
    ref_corr = _import_ref_correspondence()

    class _BruteFlatL2:
        """Exact stand-in for faiss.GpuIndexFlatL2 (squared-L2 search).
        knn_points only consumes the INDICES (correspondence.py:50-58)."""

        def __init__(self, res, dim):
            self.dim = dim

        def add(self, target):
            self.t = target

        def search(self, query, k):
            d2 = torch.cdist(query.float(), self.t.float()) ** 2
            dist, idx = torch.topk(d2, k, dim=-1, largest=False)
            return dist, idx

    # scoped: undone after the test so later tests can't silently reuse the
    # brute index (ADVICE r3)
    monkeypatch.setattr(sys.modules["faiss"], "GpuIndexFlatL2",
                        _BruteFlatL2, raising=False)

    from midvision_probe_tpu.utils import correspondence as corr
    from midvision_probe_tpu.evaluators.geometric import navi_batch_errors
    from midvision_probe_tpu.utils.metrics import compute_binned_performance
    from evals.utils import transformations as ref_tf

    C, h, w, H, W, num_corr = 12, 6, 8, 12, 16, 40
    feats = rng.randn(2, 2, C, h, w).astype(np.float32)
    xyz = rng.randn(2, 2, H, W, 3).astype(np.float32)
    # z > 0 for ~70% of pixels — irregular valid masks on both views
    xyz[..., 2] = np.where(rng.rand(2, 2, H, W) < 0.7,
                           rng.rand(2, 2, H, W) * 2 + 0.1, -1.0)

    Rt = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))
    for b in range(2):
        th = 0.3 + 0.5 * b
        Rt[b, :3, :3] = np.asarray(
            [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0],
             [0, 0, 1]], np.float32)
        Rt[b, :3, 3] = rng.randn(3) * 0.1
    K = np.asarray([[100.0, 0, W / 2], [0, 100.0, H / 2], [0, 0, 1]],
                   np.float32)

    ref_err3d, ref_err2d = [], []
    for b in range(2):
        c_xyz0, c_xyz1, c_w, c_uv0, c_uv1 = ref_corr.estimate_correspondence_xyz(
            _t(feats[b, 0]), _t(feats[b, 1]),
            _t(xyz[b, 0].transpose(2, 0, 1)),
            _t(xyz[b, 1].transpose(2, 0, 1)), num_corr)

        got = corr.estimate_correspondence_xyz(
            jnp.asarray(feats[b, 0].transpose(1, 2, 0)),
            jnp.asarray(feats[b, 1].transpose(1, 2, 0)),
            jnp.asarray(xyz[b, 0]), jnp.asarray(xyz[b, 1]),
            num_corr, use_pallas=False)
        g_xyz0, g_xyz1, g_w, g_uv0, g_uv1 = [np.asarray(x) for x in got]

        # both sides return matches in descending-weight topk order
        np.testing.assert_allclose(g_w, c_w.numpy(), atol=1e-5, rtol=1e-4)
        np.testing.assert_allclose(g_xyz0, c_xyz0.numpy(), atol=1e-5)
        np.testing.assert_allclose(g_xyz1, c_xyz1.numpy(), atol=1e-5)
        np.testing.assert_allclose(g_uv0, c_uv0.numpy(), atol=1e-5)
        np.testing.assert_allclose(g_uv1, c_uv1.numpy(), atol=1e-5)

        # driver error chain (evaluate_navi_correspondence.py:183-192)
        c_xyz0in1 = ref_tf.transform_points_Rt(c_xyz0, _t(Rt[b, :3, :4]))
        ref_err3d.append((c_xyz0in1 - c_xyz1).norm(p=2, dim=1).numpy())
        uv1 = ref_corr.project_3dto2d(c_xyz1, _t(K))
        uv0in1 = ref_corr.project_3dto2d(c_xyz0in1, _t(K))
        ref_err2d.append((uv0in1 - uv1).norm(p=2, dim=1).numpy())

    e3, e2, valid = navi_batch_errors(
        jnp.asarray(feats[:, 0].transpose(0, 2, 3, 1)),
        jnp.asarray(feats[:, 1].transpose(0, 2, 3, 1)),
        jnp.asarray(xyz[:, 0]), jnp.asarray(xyz[:, 1]),
        jnp.asarray(Rt), jnp.asarray(np.tile(K, (2, 1, 1))),
        num_corr=num_corr, use_pallas=False)
    assert bool(np.asarray(valid).all())  # num_corr < valid points here
    np.testing.assert_allclose(np.asarray(e3), np.stack(ref_err3d),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(e2), np.stack(ref_err2d),
                               atol=1e-3, rtol=1e-4)

    # recall + rotation-binned aggregation (:200-223)
    err_3d = np.stack(ref_err3d)
    for th in (0.01, 0.02, 0.05):
        ref_rec = 100 * float((_t(err_3d) < th).float().mean())
        got_rec = 100 * float((np.asarray(e3) < th).mean())
        np.testing.assert_allclose(got_rec, ref_rec, atol=1e-4)
    rel_ang = ref_tf.so3_rotation_angle(_t(Rt[:, :3, :3])) * 180.0 / np.pi
    rec_2cm = (_t(err_3d) < 0.02).float().mean(dim=1)
    ref_bins = ref_corr.compute_binned_performance(
        rec_2cm, rel_ang, [0, 30, 60, 90, 120])
    got_bins = compute_binned_performance(
        np.asarray((np.asarray(e3) < 0.02).mean(axis=1)),
        rel_ang.numpy(), [0, 30, 60, 90, 120])
    for gb, rb in zip(got_bins, ref_bins):
        rb = float(rb) if np.isfinite(float(rb)) else np.nan
        if np.isnan(rb):
            assert np.isnan(gb)
        else:
            np.testing.assert_allclose(gb, rb, atol=1e-5)


# --------------------------------------------------------------------------
# ScanNet matcher end-to-end — the reference's estimate_correspondence_depth
# (correspondence.py:218-232: depth unprojection → z>0 masking → pointcloud
# feature sampling → cosine ratio-test matching) plus the driver's error
# chain and recall thresholds (render_scannet_correspondence.py:205-268),
# with the same brute-force faiss index as the NAVI oracle.
# --------------------------------------------------------------------------
def test_scannet_matcher_end_to_end_matches_reference(rng, monkeypatch):
    ref_corr = _import_ref_correspondence()

    class _BruteFlatL2:
        def __init__(self, res, dim):
            self.dim = dim

        def add(self, target):
            self.t = target

        def search(self, query, k):
            d2 = torch.cdist(query.float(), self.t.float()) ** 2
            dist, idx = torch.topk(d2, k, dim=-1, largest=False)
            return dist, idx

    monkeypatch.setattr(sys.modules["faiss"], "GpuIndexFlatL2",
                        _BruteFlatL2, raising=False)

    from midvision_probe_tpu.utils import correspondence as corr
    from midvision_probe_tpu.evaluators.geometric import scannet_batch_errors
    from evals.utils import transformations as ref_tf

    C, h, w, H, W, num_corr = 12, 6, 8, 12, 16, 40
    feats = rng.randn(2, 2, C, h, w).astype(np.float32)
    depth = (rng.rand(2, 2, H, W) * 3 + 0.3).astype(np.float32)
    depth[rng.rand(2, 2, H, W) < 0.3] = 0.0  # irregular holes
    K = np.asarray([[100.0, 0, W / 2], [0, 100.0, H / 2], [0, 0, 1]],
                   np.float32)
    Rt = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))
    for b in range(2):
        th = 0.2 + 0.4 * b
        Rt[b, :3, :3] = np.asarray(
            [[1, 0, 0], [0, np.cos(th), -np.sin(th)],
             [0, np.sin(th), np.cos(th)]], np.float32)
        Rt[b, :3, 3] = rng.randn(3) * 0.05

    ref_err3d, ref_err2d, ref_uv00, ref_uv11 = [], [], [], []
    for b in range(2):
        c_xyz0, c_xyz1, c_w = ref_corr.estimate_correspondence_depth(
            _t(feats[b, 0]), _t(feats[b, 1]),
            _t(depth[b, 0][None]), _t(depth[b, 1][None]),
            _t(K.copy()), num_corr)

        g_xyz0, g_xyz1, g_w = [np.asarray(x)
                               for x in corr.estimate_correspondence_depth(
            jnp.asarray(feats[b, 0].transpose(1, 2, 0)),
            jnp.asarray(feats[b, 1].transpose(1, 2, 0)),
            jnp.asarray(depth[b, 0]), jnp.asarray(depth[b, 1]),
            jnp.asarray(K), num_corr, use_pallas=False)]
        np.testing.assert_allclose(g_w, c_w.numpy(), atol=1e-5, rtol=1e-4)
        np.testing.assert_allclose(g_xyz0, c_xyz0.numpy(),
                                   atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(g_xyz1, c_xyz1.numpy(),
                                   atol=1e-4, rtol=1e-4)

        # driver error chain (render_scannet_correspondence.py:210-218)
        c_xyz0in1 = ref_tf.transform_points_Rt(c_xyz0, _t(Rt[b, :3, :4]))
        ref_err3d.append((c_xyz0in1 - c_xyz1).norm(p=2, dim=1).numpy())
        uv_0in0 = ref_corr.project_3dto2d(c_xyz0, _t(K.copy()))
        uv_0in1 = ref_corr.project_3dto2d(c_xyz0in1, _t(K.copy()))
        uv_1in1 = ref_corr.project_3dto2d(c_xyz1, _t(K.copy()))
        ref_err2d.append((uv_0in1 - uv_1in1).norm(p=2, dim=1).numpy())
        ref_uv00.append(uv_0in0.numpy())
        ref_uv11.append(uv_1in1.numpy())

    e3, e2, uv00, uv11, valid = scannet_batch_errors(
        jnp.asarray(feats[:, 0].transpose(0, 2, 3, 1)),
        jnp.asarray(feats[:, 1].transpose(0, 2, 3, 1)),
        jnp.asarray(depth[:, 0]), jnp.asarray(depth[:, 1]),
        jnp.asarray(np.tile(K, (2, 1, 1))), jnp.asarray(Rt),
        num_corr=num_corr, use_pallas=False)
    assert bool(np.asarray(valid).all())
    np.testing.assert_allclose(np.asarray(e3), np.stack(ref_err3d),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(e2), np.stack(ref_err2d),
                               atol=1e-3, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(uv00), np.stack(ref_uv00),
                               atol=1e-3, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(uv11), np.stack(ref_uv11),
                               atol=1e-3, rtol=1e-4)

    # recall thresholds (:253-263)
    for th in (0.01, 0.02, 0.05, 0.1, 0.2, 0.3, 0.4, 0.5):
        ref_rec = 100 * float((_t(np.stack(ref_err3d)) < th).float().mean())
        np.testing.assert_allclose(
            100 * float((np.asarray(e3) < th).mean()), ref_rec, atol=1e-4)
    for th in (1, 2, 5, 15, 25, 35, 50):
        ref_rec = 100 * float((_t(np.stack(ref_err2d)) < th).float().mean())
        np.testing.assert_allclose(
            100 * float((np.asarray(e2) < th).mean()), ref_rec, atol=1e-4)


# --------------------------------------------------------------------------
# 2AFC choice rule — the reference driver's cosine-similarity comparison
# and 0/1 prediction (evaluate_model_percepture.py:46-49, 115-120) plus its
# sklearn metric block (:52-64), vs our driver's batched rule
# --------------------------------------------------------------------------
def test_2afc_choice_rule_matches_reference(rng, monkeypatch):
    m = _scoped_stub_modules(
        monkeypatch, ("hydra", "hydra.utils", "omegaconf", "wandb"))
    mp = monkeypatch.setattr
    mp(m["hydra"], "utils", m["hydra.utils"], raising=False)
    mp(m["hydra"], "main", lambda *a, **k: (lambda f: f), raising=False)
    mp(m["hydra.utils"], "instantiate", lambda *a, **k: None, raising=False)
    mp(m["omegaconf"], "DictConfig", dict, raising=False)
    mp(m["omegaconf"], "OmegaConf", types.SimpleNamespace(
        to_yaml=lambda c: str(c), to_container=lambda *a, **k: {}),
       raising=False)
    mp(m["wandb"], "require", lambda *a, **k: None, raising=False)
    # the driver imports build_loader at module level; its dataset deps are
    # irrelevant to the scoring rule under test
    monkeypatch.setitem(sys.modules, "evals.datasets.builder",
                        types.SimpleNamespace(build_loader=None))
    import importlib
    spec = importlib.util.spec_from_file_location(
        "ref_evaluate_model_percepture",
        os.path.join(REF, "evaluate_model_percepture.py"))
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    import evaluate_model_percepture as ours

    f_ref = rng.randn(33, 24).astype(np.float32)
    f_left = rng.randn(33, 24).astype(np.float32)
    # make some left/right pairs nearly tied so the > comparison is exercised
    f_right = np.where(rng.rand(33, 1) < 0.5,
                       f_left + 1e-3 * rng.randn(33, 24).astype(np.float32),
                       rng.randn(33, 24).astype(np.float32))
    gt = (rng.rand(33) < 0.5).astype(int)

    sim_l = ref.cosine_similarity_batch(_t(f_ref), _t(f_left))
    sim_r = ref.cosine_similarity_batch(_t(f_ref), _t(f_right))
    ref_pred = torch.where(sim_l > sim_r, 0, 1).numpy()
    ref_metrics = ref.compute_metrics(gt.tolist(), ref_pred.tolist())

    # the PRODUCTION choice rule (module-level so run() and this test share
    # one implementation — ADVICE r3)
    got_pred = ours.choose_2afc(jnp.asarray(f_ref), jnp.asarray(f_left),
                                jnp.asarray(f_right))
    np.testing.assert_array_equal(got_pred, ref_pred)
    got_metrics = ours.compute_metrics(gt.tolist(), got_pred.tolist())
    for k in ("accuracy", "f1_score", "precision", "recall"):
        np.testing.assert_allclose(got_metrics[k], ref_metrics[k], atol=1e-9)

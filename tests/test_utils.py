"""Parity tests for losses / metrics / correspondence vs literal torch/numpy
transcriptions of the reference formulas (SURVEY §2.3)."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from midvision_probe_tpu.utils import correspondence as C
from midvision_probe_tpu.utils import losses as L
from midvision_probe_tpu.utils import metrics as M
from midvision_probe_tpu.utils import transformations as T
from midvision_probe_tpu.utils.optim import cosine_decay_linear_warmup_factor


def _depth_pair(rng, B=2, H=16, W=20):
    gt = np.abs(rng.rand(B, H, W)).astype(np.float32) * 9 + 0.5
    gt[rng.rand(B, H, W) < 0.2] = 0.0  # invalid holes
    pr = np.clip(gt + rng.randn(B, H, W) * 0.3, 0.01, None).astype(np.float32)
    return pr, gt


def test_sig_loss_matches_reference(rng):
    pr, gt = _depth_pair(rng)
    tpr, tgt = torch.from_numpy(pr), torch.from_numpy(gt)
    valid = tgt > 0
    g = torch.log(tpr[valid] + 0.001) - torch.log(tgt[valid] + 0.001)
    ref = (g.pow(2).mean() - 0.85 * g.mean().pow(2)).sqrt().item()
    got = float(L.sig_loss(jnp.asarray(pr), jnp.asarray(gt)))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_depth_si_loss_matches_reference(rng):
    pr, gt = _depth_pair(rng)
    tpr, tgt = torch.from_numpy(pr), torch.from_numpy(gt)
    valid = (tgt > 0).float()
    num_valid = valid.sum(dim=(-1, -2)).clamp(min=1)
    dp = tpr.clamp(min=1e-5).log()
    dg = tgt.clamp(min=1e-5).log()
    diff = (dp - dg) * valid
    diff_mean = diff.pow(2).sum(dim=(-2, -1)) / num_valid
    diff_var = diff.sum(dim=(-2, -1)).pow(2) / num_valid.pow(2)
    ref = (10 * (diff_mean - 0.85 * diff_var).sqrt().mean()).item()
    got = float(L.depth_si_loss(jnp.asarray(pr), jnp.asarray(gt)))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_gradient_loss_spatial(rng):
    """vs a torch transcription of the intended (spatial) multi-scale loss."""
    pr, gt = _depth_pair(rng, B=2, H=24, W=24)

    def torch_ref(dpr, dgt, eps=0.001):
        total = 0.0
        for s in [1, 2, 4, 6]:
            p, g = dpr[:, ::s, ::s], dgt[:, ::s, ::s]
            valid = (g > 0).float()
            N = valid.sum().clamp(min=1)
            diff = (torch.log(p + eps) - torch.log(g + eps)) * valid
            v = (diff[:, :-2, :] - diff[:, 2:, :]).abs() * (
                valid[:, :-2, :] * valid[:, 2:, :]
            )
            h = (diff[:, :, :-2] - diff[:, :, 2:]).abs() * (
                valid[:, :, :-2] * valid[:, :, 2:]
            )
            total = total + (h.sum() + v.sum()) / N
        return total.item()

    ref = torch_ref(torch.from_numpy(pr), torch.from_numpy(gt))
    got = float(L.gradient_loss(jnp.asarray(pr), jnp.asarray(gt)))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_angular_loss_matches_reference(rng):
    B, H, W = 2, 8, 8
    pr = rng.randn(B, H, W, 4).astype(np.float32)
    gt = rng.randn(B, H, W, 3).astype(np.float32)
    gt /= np.linalg.norm(gt, axis=-1, keepdims=True)
    mask = (rng.rand(B, H, W, 1) > 0.3).astype(np.float32)

    # torch transcription (losses.py:157-182), NCHW
    tpr = torch.from_numpy(pr.transpose(0, 3, 1, 2))
    tgt = torch.from_numpy(gt.transpose(0, 3, 1, 2))
    tm = torch.from_numpy(mask.transpose(0, 3, 1, 2)).squeeze(1)
    eps = 1e-4
    la = torch.cosine_similarity(tpr[:, :3], tgt, dim=1)
    la = la.clamp(min=-1 + eps, max=1 - eps).acos()
    kappa = F.elu(tpr[:, 3]) + 1.01
    kappa_reg = (1 + (-kappa * torch.pi).exp()).log() - (kappa.pow(2) + 1).log()
    loss = kappa_reg + kappa * la
    ref_ua = loss[tm.bool()].mean().item()
    got_ua = float(L.angular_loss(jnp.asarray(pr), jnp.asarray(gt),
                                  jnp.asarray(mask), uncertainty_aware=True))
    np.testing.assert_allclose(got_ua, ref_ua, rtol=1e-4)

    la3 = torch.cosine_similarity(tpr[:, :3], tgt, dim=1)
    ref = la3.clamp(min=-1 + eps, max=1 - eps).acos()[tm.bool()].mean().item()
    got = float(L.angular_loss(jnp.asarray(pr[..., :3]), jnp.asarray(gt),
                               jnp.asarray(mask)))
    np.testing.assert_allclose(got, ref, rtol=1e-4)


def test_ssim_matches_reference(rng):
    a = rng.rand(2, 1, 16, 16).astype(np.float32)
    b = rng.rand(2, 1, 16, 16).astype(np.float32)

    # torch transcription (losses.py:203-288)
    def gaussian(ws, sigma):
        g = torch.tensor([
            np.exp(-((x - ws // 2) ** 2) / (2 * sigma**2)) for x in range(ws)
        ], dtype=torch.float32)
        return g / g.sum()

    w1 = gaussian(11, 1.5).unsqueeze(1)
    win = (w1 @ w1.t()).unsqueeze(0).unsqueeze(0)
    ta, tb = torch.from_numpy(a), torch.from_numpy(b)
    mu1 = F.conv2d(ta, win, padding=5)
    mu2 = F.conv2d(tb, win, padding=5)
    s1 = F.conv2d(ta * ta, win, padding=5) - mu1**2
    s2 = F.conv2d(tb * tb, win, padding=5) - mu2**2
    s12 = F.conv2d(ta * tb, win, padding=5) - mu1 * mu2
    C1, C2 = 0.01**2, 0.03**2
    ref = (((2 * mu1 * mu2 + C1) * (2 * s12 + C2)) /
           ((mu1**2 + mu2**2 + C1) * (s1 + s2 + C2))).mean().item()

    got = float(L.ssim(jnp.asarray(a.transpose(0, 2, 3, 1)),
                       jnp.asarray(b.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, ref, rtol=1e-4)


def test_match_scale_and_shift_recovers_affine(rng):
    _, gt = _depth_pair(rng)
    pred = 0.5 * gt + 2.0
    pred[gt == 0] = 3.3
    out = M.match_scale_and_shift(jnp.asarray(pred), jnp.asarray(gt))
    valid = gt > 0
    np.testing.assert_allclose(np.asarray(out)[valid], gt[valid], atol=1e-3)


def test_evaluate_depth_perfect_prediction(rng):
    _, gt = _depth_pair(rng)
    seg = rng.randint(0, 150, size=gt.shape)
    g, lv = M.evaluate_depth(jnp.asarray(gt), jnp.asarray(gt),
                             jnp.asarray(seg), image_average=True)
    assert float(g["d1"]) == 1.0
    assert float(g["rmse"]) < 1e-6
    assert set(lv) == {f"level_{i}" for i in range(1, 6)}
    # level masks partition the valid set
    valid = (gt > 0).astype(np.float32)
    masks = M._level_masks(jnp.asarray(valid), 5)
    total = sum(np.asarray(m) for m in masks)
    np.testing.assert_allclose(total, valid)


def test_evaluate_depth_thresholds(rng):
    gt = np.full((1, 4, 4), 2.0, np.float32)
    pr = gt.copy()
    pr[0, 0, 0] = 2.0 * 1.3  # fails d1, passes d2
    g, _ = M.evaluate_depth(jnp.asarray(pr), jnp.asarray(gt), None,
                            is_navi=True, image_average=True)
    np.testing.assert_allclose(float(g["d1"]), 15 / 16)
    np.testing.assert_allclose(float(g["d2"]), 1.0)


def test_evaluate_surface_norm(rng):
    B, H, W = 1, 10, 10
    gt = rng.randn(B, H, W, 3).astype(np.float32)
    gt /= np.linalg.norm(gt, axis=-1, keepdims=True)
    g, lv = M.evaluate_surface_norm(jnp.asarray(gt), jnp.asarray(gt),
                                    None, is_navi=True, image_average=True)
    assert float(g["d1"]) == 1.0
    assert float(g["rmse"]) < 1e-2


def test_stuff_things_lists_match_reference():
    assert len(M.STUFF) == 22
    assert len(M.THINGS) == 124
    assert set(M.STUFF).isdisjoint(M.THINGS)
    assert 7 in M.THINGS and 11 not in M.THINGS and 11 not in M.STUFF


def test_precision_recall_edge_cases():
    gt = jnp.zeros((1, 8, 8))
    pr = jnp.zeros((1, 8, 8))
    p, r = M.precision_recall(gt, pr)
    assert float(p[0]) == 1.0 and float(r[0]) == 1.0
    f = M.f_score(jnp.asarray([0.0]), jnp.asarray([0.0]))
    assert float(f[0]) == 0.0


def test_cosine_decay_linear_warmup_matches_reference():
    for step in [0, 10, 150, 999, 1000]:
        got = cosine_decay_linear_warmup_factor(step, 1000, 150)
        if step <= 150:
            ref = 0.99 * (step / 150) + 0.01
        else:
            rel = (step - 150) / 850
            ref = 0.99 * np.cos(0.5 * rel * np.pi) + 0.01
        # the factor delegates to the optax schedule that training actually
        # uses, which computes in float32 — tolerance matches that
        np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_transform_points_Rt_roundtrip(rng):
    from scipy.spatial.transform import Rotation

    R = Rotation.random(3, random_state=0).as_matrix().astype(np.float32)
    t = rng.randn(3, 3).astype(np.float32)
    Rt = np.concatenate([R, t[:, :, None]], axis=-1)  # (3, 3, 4)
    pts = rng.randn(3, 50, 3).astype(np.float32)
    fwd = T.transform_points_Rt(jnp.asarray(pts), jnp.asarray(Rt))
    back = T.transform_points_Rt(fwd, jnp.asarray(Rt), inverse=True)
    np.testing.assert_allclose(np.asarray(back), pts, atol=1e-4)
    ang = T.so3_rotation_angle(jnp.asarray(R))
    ref = np.arccos(np.clip((np.trace(R, axis1=1, axis2=2) - 1) / 2, -1, 1))
    np.testing.assert_allclose(np.asarray(ang), ref, atol=1e-5)


def test_grid_to_pointcloud_projects_back(rng):
    H, W = 12, 16
    K = np.array([[20.0, 0, 8], [0, 20.0, 6], [0, 0, 1]], np.float32)
    depth = (rng.rand(H, W).astype(np.float32) + 0.5) * 3
    pc = C.grid_to_pointcloud(jnp.asarray(np.linalg.inv(K)), jnp.asarray(depth))
    uv = C.project_3dto2d(pc, jnp.asarray(K))
    grid = np.asarray(C.get_grid(H, W)).transpose(1, 2, 0).reshape(-1, 3)
    np.testing.assert_allclose(np.asarray(uv), grid[:, :2], atol=1e-4)
    np.testing.assert_allclose(np.asarray(pc)[:, 2], depth.reshape(-1), atol=1e-5)


def test_argmax_2d(rng):
    x = rng.randn(2, 5, 7).astype(np.float32)
    got = np.asarray(C.argmax_2d(jnp.asarray(x)))
    for b in range(2):
        iy, ix = np.unravel_index(x[b].argmax(), x[b].shape)
        assert tuple(got[b]) == (ix, iy)


def test_estimate_correspondence_xyz_identity(rng):
    """Identical feature grids: each selected query matches itself."""
    H, W, D = 12, 12, 16
    feats = rng.randn(H, W, D).astype(np.float32)
    xyz = rng.rand(H, W, 3).astype(np.float32) + 0.5  # all z > 0
    xyz0 = xyz.copy()
    c0, c1, w, uv0, uv1 = C.estimate_correspondence_xyz(
        jnp.asarray(feats), jnp.asarray(feats), jnp.asarray(xyz0),
        jnp.asarray(xyz), num_corr=30, use_pallas=False,
    )
    np.testing.assert_allclose(np.asarray(c0), np.asarray(c1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(uv0), np.asarray(uv1), atol=1e-5)


def test_masked_correspondences_respect_validity(rng):
    N, D = 40, 8
    f0 = rng.randn(N, D).astype(np.float32)
    f1 = rng.randn(N, D).astype(np.float32)
    valid0 = np.ones(N, bool)
    valid0[:10] = False
    valid1 = np.ones(N, bool)
    valid1[20:] = False
    i0, i1, w = C.masked_correspondences_ratio_test(
        jnp.asarray(f0), jnp.asarray(f1), jnp.asarray(valid0),
        jnp.asarray(valid1), num_corres=20, use_pallas=False,
    )
    assert np.all(np.asarray(i0) >= 10)  # invalid queries never chosen
    assert np.all(np.asarray(i1) < 20)  # invalid targets never matched


def test_error_auc_matches_reference():
    errors = [0.5, 1.0, 2.0, 3.0]
    # torch-free transcription of correspondence.py:199-215
    errs = [0] + sorted(errors)
    recall = list(np.linspace(0, 1, len(errs)))
    refs = []
    for thr in [1.0, 5.0]:
        last = np.searchsorted(errs, thr)
        y = recall[:last] + [recall[last - 1]]
        x = errs[:last] + [thr]
        refs.append(np.trapezoid(y, x) / thr)
    got = M.error_auc(errors, [1.0, 5.0])
    np.testing.assert_allclose(got, refs, rtol=1e-6)


def test_schedule_clamps_past_max_step():
    """Steps past max_step must hold at min_factor, not go negative
    (latent hazard: an unclamped quarter-cosine turns into gradient
    ascent if the loader yields more batches than the n_steps estimate)."""
    from midvision_probe_tpu.utils import optim as O

    sched = O.cosine_decay_linear_warmup(1.0, 1000, 150)
    np.testing.assert_allclose(float(sched(1000)), 0.01, rtol=1e-4)
    np.testing.assert_allclose(float(sched(1500)), 0.01, rtol=1e-4)
    assert float(sched(10_000)) >= 0.0


def test_sig_loss_negative_invalid_markers():
    """gt pixels <= 0 (e.g. -1 invalid markers) must not NaN the loss."""
    from midvision_probe_tpu.utils.losses import gradient_loss, sig_loss

    pr = jnp.full((1, 8, 8), 2.0)
    gt = jnp.full((1, 8, 8), 2.5).at[0, :4].set(-1.0)
    assert np.isfinite(float(sig_loss(pr, gt)))
    assert np.isfinite(float(gradient_loss(pr, gt)))


def test_make_adamw_matches_torch_default_wd():
    """The engine's AdamW must carry torch.optim.AdamW's default
    weight_decay (0.01), not optax's 1e-4 — a silent 100x gap."""
    import optax

    from midvision_probe_tpu.utils.optim import make_adamw

    tx = make_adamw(optax.constant_schedule(1e-3))
    params = {"w": jnp.ones((4,))}
    state = tx.init(params)
    grads = {"w": jnp.zeros((4,))}
    updates, _ = tx.update(grads, state, params)
    # zero gradient: the update is pure decoupled weight decay = -lr*wd*w
    np.testing.assert_allclose(np.asarray(updates["w"]),
                               -1e-3 * 0.01 * np.ones(4), rtol=1e-4)

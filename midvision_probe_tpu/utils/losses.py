"""Probe losses (reference ``evals/utils/losses.py``) as pure jnp functions.

All tensors are NHWC; validity is handled by masks (sums/num_valid) rather
than boolean indexing so everything stays jittable with static shapes. The
masked formulations are algebraically identical to the reference's indexed
ones.

Documented fix (SURVEY §7 hard part g): the reference ``gradient_loss``
slices ``depth[::2i, ::2i]`` on a 4-D (B, 1, H, W) tensor, i.e. the
*batch/channel* axes (``losses.py:124-129``) — inherited from a 2-D-input
implementation. The intended multi-scale *spatial* gradient loss is
implemented here (slicing H and W).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _masked_mean(x, mask, axis=None, min_count=1.0):
    num = jnp.sum(mask, axis=axis)
    return jnp.sum(x * mask, axis=axis) / jnp.clip(num, min_count, None)


def depth_si_loss(depth_pr, depth_gt, alpha=10.0, lambda_scale=0.85, eps=1e-5):
    """Eigen et al. scale-invariant loss, sqrt per image then mean
    (``losses.py:33-51``). Inputs (B, H, W, 1) or (B, H, W)."""
    if depth_pr.ndim == 4:
        depth_pr, depth_gt = depth_pr[..., 0], depth_gt[..., 0]
    valid = (depth_gt > 0).astype(jnp.float32)
    num_valid = jnp.clip(valid.sum(axis=(-1, -2)), 1, None)
    pr = jnp.log(jnp.clip(depth_pr, eps, None))
    gt = jnp.log(jnp.clip(depth_gt, eps, None))
    diff = (pr - gt) * valid
    diff_mean = jnp.sum(diff**2, axis=(-2, -1)) / num_valid
    diff_var = jnp.sum(diff, axis=(-2, -1)) ** 2 / num_valid**2
    return alpha * jnp.mean(jnp.sqrt(diff_mean - lambda_scale * diff_var))


def sig_loss(depth_pr, depth_gt, sigma=0.85, eps=0.001):
    """AdaBins-style SigLoss over all valid pixels of the batch
    (``losses.py:54-74``)."""
    valid = (depth_gt > 0).astype(jnp.float32)
    # log over VALID pixels only — the reference indexes BOTH tensors with
    # the mask before the log (losses.py:60-63). Guarding only gt is not
    # enough: an unsupervised probe prediction < -eps at a depth hole makes
    # log(pr+eps) NaN, and NaN*0 is NaN (common early in training; the
    # reference stays finite because invalid pixels never enter the log)
    gt_safe = jnp.where(depth_gt > 0, depth_gt, 1.0)
    pr_safe = jnp.where(depth_gt > 0, depth_pr, 1.0)
    g = (jnp.log(pr_safe + eps) - jnp.log(gt_safe + eps)) * valid
    n = jnp.clip(valid.sum(), 1, None)
    mean_g2 = jnp.sum(g**2) / n
    mean_g = jnp.sum(g) / n
    return jnp.sqrt(mean_g2 - sigma * mean_g**2)


def gradient_loss(depth_pr, depth_gt, eps=0.001):
    """Multi-scale log-depth spatial gradient loss (``losses.py:114-154``,
    spatial-axis fix documented in the module docstring).

    Inputs (B, H, W, 1) or (B, H, W); scales: full + strides {2, 4, 6}."""
    if depth_pr.ndim == 4:
        depth_pr, depth_gt = depth_pr[..., 0], depth_gt[..., 0]

    total = 0.0
    for s in [1, 2, 4, 6]:
        pr = depth_pr[:, ::s, ::s]
        gt = depth_gt[:, ::s, ::s]
        valid = (gt > 0).astype(jnp.float32)
        n = jnp.clip(valid.sum(), 1, None)
        gt_safe = jnp.where(gt > 0, gt, 1.0)  # see sig_loss
        pr_safe = jnp.where(gt > 0, pr, 1.0)  # see sig_loss
        diff = (jnp.log(pr_safe + eps) - jnp.log(gt_safe + eps)) * valid

        v_grad = jnp.abs(diff[:, :-2, :] - diff[:, 2:, :])
        v_valid = valid[:, :-2, :] * valid[:, 2:, :]
        h_grad = jnp.abs(diff[:, :, :-2] - diff[:, :, 2:])
        h_valid = valid[:, :, :-2] * valid[:, :, 2:]
        total = total + (jnp.sum(h_grad * h_valid) + jnp.sum(v_grad * v_valid)) / n
    return total


def depth_loss(pred, target, weight_sig=10.0, weight_grad=0.5, max_depth=10.0):
    """``DepthLoss`` (``losses.py:97-111``): targets beyond max_depth are
    zeroed (=> ignored by the valid masks)."""
    target = jnp.where(target > max_depth, 0.0, target)
    return weight_sig * sig_loss(pred, target) + weight_grad * gradient_loss(
        pred, target
    )


def angular_loss(snorm_pr, snorm_gt, mask, uncertainty_aware=False, eps=1e-4):
    """Bae et al. angular (+kappa NLL) loss (``losses.py:157-182``).

    snorm_pr: (B, H, W, 3|4); snorm_gt: (B, H, W, 3); mask: (B, H, W, 1)."""
    m = mask[..., 0].astype(jnp.float32)
    cos = _cosine_similarity(snorm_pr[..., :3], snorm_gt)
    if uncertainty_aware:
        ang = jnp.arccos(jnp.clip(cos, -1 + eps, 1 - eps))
        kappa = jax.nn.elu(snorm_pr[..., 3]) + 1.01
        kappa_reg = jnp.log1p(jnp.exp(-kappa * jnp.pi)) - jnp.log(kappa**2 + 1)
        loss = kappa_reg + kappa * ang
    else:
        loss = jnp.arccos(jnp.clip(cos, -1 + eps, 1 - eps))
    return _masked_mean(loss, m)


def snorm_l1_loss(snorm_pr, snorm_gt, mask):
    """``losses.py:185-200``."""
    m = mask[..., 0].astype(jnp.float32)
    loss = jnp.abs(snorm_pr[..., :3] - snorm_gt).mean(axis=-1)
    return _masked_mean(loss, m)


def masked_l1_loss(preds, target, mask_valid=None):
    """``MaskedL1Loss`` (``losses.py:77-94``)."""
    if mask_valid is None:
        mask_valid = jnp.ones_like(preds, dtype=bool)
    if preds.shape[-1] != mask_valid.shape[-1]:
        mask_valid = jnp.repeat(mask_valid, preds.shape[-1], axis=-1)
    m = mask_valid.astype(preds.dtype)
    return jnp.sum(jnp.abs(preds - target) * m) / jnp.clip(m.sum(), 1, None)


def binary_cross_entropy(pred, target, eps=1e-7):
    """torch ``nn.BCELoss`` equivalent (objectness trainer,
    ``train_generic_objectness.py:575``)."""
    pred = jnp.clip(pred, eps, 1 - eps)
    return -jnp.mean(target * jnp.log(pred) + (1 - target) * jnp.log1p(-pred))


def _cosine_similarity(a, b, axis=-1, eps=1e-8):
    na = jnp.linalg.norm(a, axis=axis)
    nb = jnp.linalg.norm(b, axis=axis)
    dot = jnp.sum(a * b, axis=axis)
    # torch.cosine_similarity clamps each norm to eps
    return dot / (jnp.clip(na, eps, None) * jnp.clip(nb, eps, None))


def _gaussian_window(window_size: int, sigma: float) -> jnp.ndarray:
    x = jnp.arange(window_size, dtype=jnp.float32) - window_size // 2
    g = jnp.exp(-(x**2) / (2 * sigma**2))
    g = g / g.sum()
    return jnp.outer(g, g)


def ssim(img1, img2, window_size=11, size_average=True):
    """SSIM with an 11x11 gaussian window, sigma 1.5
    (``losses.py:203-288``). Inputs NHWC."""
    channel = img1.shape[-1]
    w = _gaussian_window(window_size, 1.5)
    kernel = jnp.zeros((window_size, window_size, 1, channel)).at[:, :, 0, :].set(
        w[..., None]
    )

    def conv(x):
        return jax.lax.conv_general_dilated(
            x, kernel,
            window_strides=(1, 1),
            padding=[(window_size // 2,) * 2] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=channel,
        )

    mu1, mu2 = conv(img1), conv(img2)
    mu1_sq, mu2_sq, mu1_mu2 = mu1**2, mu2**2, mu1 * mu2
    s1 = conv(img1 * img1) - mu1_sq
    s2 = conv(img2 * img2) - mu2_sq
    s12 = conv(img1 * img2) - mu1_mu2
    C1, C2 = 0.01**2, 0.03**2
    m = ((2 * mu1_mu2 + C1) * (2 * s12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (s1 + s2 + C2)
    )
    return m.mean() if size_average else m.mean(axis=(1, 2, 3))

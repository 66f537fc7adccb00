"""SPair-71k PCK evaluation core (reference
``evaluate_spair_correspondence.py:45-123``), batched + jitted.

Per pair: sample source-keypoint features (grid_sample, align_corners=True),
correlate against the dense target map, take the 2D argmax as the predicted
keypoint, and measure normalized error against all target keypoints
(``:76-98``). Invalid keypoints get error 1e3 so they never win the NN
search — the same trick the reference uses, which also makes the padded
keypoint slots free.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from midvision_probe_tpu.ops.image import grid_sample
from midvision_probe_tpu.utils.correspondence import argmax_2d


def patch_masks(segs, patch_size: int = 16, grid_hw=None):
    """(B, S, S) 0/1 segmentation masks → (B, h, w) bool patch masks.

    Reference ``evaluate_spair_correspondence.py:52-53``:
    ``avg_pool2d(mask, 16) > 4/16**2`` — i.e. keep patches with more than 4
    foreground pixels. (The reference actually feeds 0/255-valued masks —
    torchvision ToTensor leaves mode-F PIL images unscaled — making its
    effective threshold ≥ 1 pixel; we feed normalized 0/1 masks and apply
    the intended 4-pixel threshold. Latent-bug policy: fix + document.)

    ``grid_hw`` pins the output grid to the backbone's ACTUAL feature grid.
    The reference derives the grid from image_size/16 only, which crashes
    for fixed-input backbones (BEiT family re-resizes its inputs to
    224/384, ``beit_v2.py:255-257``, so its feature grid is 14/24 — not
    image_size/16). When the image does not tile into ``grid_hw`` exactly,
    foreground fractions are averaged into cells via area resize. The
    threshold stays "more than 4 source pixels per cell" in both paths."""
    b, s, _ = segs.shape
    if grid_hw is None:
        grid_hw = (s // patch_size, s // patch_size)
    h, w = grid_hw
    if (h, w) == (s // patch_size, s // patch_size):
        # the grid comes from a VALID-stride conv over THIS image (true
        # for every non-fixed-input backbone): exact patch pooling. For
        # non-divisible patch sizes (e.g. p=14 at image_size 800 -> grid
        # 57) the conv drops the right/bottom remainder pixels, so the
        # mask crops identically to stay aligned.
        patch = patch_size
        segs = segs[:, : h * patch, : w * patch]
        pooled = segs.reshape(b, h, patch, w, patch).mean(axis=(2, 4))
        cell_area = float(patch * patch)
    else:
        # fixed-input backbones: the image was RESIZED before patching, so
        # cell boundaries don't land on pixel multiples — area-average
        pooled = jax.image.resize(segs.astype(jnp.float32), (b, h, w),
                                  method="linear", antialias=True)
        cell_area = (s / h) * (s / w)
    return pooled > 4.0 / cell_area


def pair_errors(feats_i, feats_j, kps_i, kps_j, thresh_scale, image_size,
                mask_i=None, mask_j=None, return_heatmaps: bool = False):
    """Single pair; vmapped by ``batch_errors``.

    Args:
        feats_i/feats_j: (h, w, C) L2-normalized dense features.
        kps_i/kps_j: (K, 3) padded keypoints in *pixel* coords + valid flag.
        thresh_scale: PCK normalization scale.
        mask_i/mask_j: optional (h, w) bool patch masks — the reference's
            ``mask_feats`` flag zeroes background-patch features AFTER
            normalization (``evaluate_spair_correspondence.py:61-63``).
        return_heatmaps: also return the (K, h, w) similarity heatmaps
            (reference ``:100-103``).

    Returns (error_same (K,), error_nn (K,), in_both (K,), index_nn (K,))
    [+ heatmaps].
    """
    if mask_i is not None:
        feats_i = feats_i * mask_i[..., None].astype(feats_i.dtype)
        feats_j = feats_j * mask_j[..., None].astype(feats_j.dtype)
    K = kps_i.shape[0]
    kps_i_n = kps_i.at[:, :2].set(kps_i[:, :2] / image_size)
    kps_j_n = kps_j.at[:, :2].set(kps_j[:, :2] / image_size)

    ndc = kps_i_n[:, :2] * 2.0 - 1.0  # (K, 2) in (x, y)
    kp_f = grid_sample(feats_i[None], ndc[None, None], align_corners=True)
    kp_f = kp_f[0, 0]  # (K, C)

    # HIGHEST matmul precision: near-tie cosine similarities are common on
    # L2-normalized features and the argmax below must not flip vs the
    # reference's f32 einsum (preferred_element_type only widens the
    # accumulator, not the multiplies)
    heat = jnp.einsum("kc,hwc->khw", kp_f, feats_j,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
    w_feat = feats_j.shape[1]
    pred_kp = argmax_2d(heat).astype(jnp.float32) / w_feat  # (K, 2) in [0,1]

    errors = jnp.linalg.norm(
        pred_kp[:, None, :] - kps_j_n[None, :, :2], axis=-1
    ) / thresh_scale

    valid = (kps_i_n[:, None, 2] * kps_j_n[None, :, 2]) == 1
    in_both = jnp.diagonal(valid)
    errors = jnp.where(valid, errors, 1e3)

    error_same = jnp.diagonal(errors)
    error_nn = errors.min(axis=1)
    index_nn = errors.argmin(axis=1)
    if return_heatmaps:
        return error_same, error_nn, in_both, index_nn, heat
    return error_same, error_nn, in_both, index_nn


@functools.partial(jax.jit,
                   static_argnames=("image_size", "return_heatmaps"))
def batch_errors(feats_i, feats_j, kps_i, kps_j, thresh_scale, image_size,
                 masks_i=None, masks_j=None, return_heatmaps: bool = False):
    """(B, h, w, C) feature batches → per-pair error pytrees. Optional
    (B, h, w) patch masks enable the reference's ``mask_feats`` path."""
    fn = functools.partial(pair_errors, image_size=image_size,
                           return_heatmaps=return_heatmaps)
    if masks_i is None:
        return jax.vmap(fn)(feats_i, feats_j, kps_i, kps_j, thresh_scale)
    return jax.vmap(
        lambda fi, fj, ki, kj, t, mi, mj: fn(fi, fj, ki, kj, t,
                                             mask_i=mi, mask_j=mj)
    )(feats_i, feats_j, kps_i, kps_j, thresh_scale, masks_i, masks_j)


def make_feature_fn(backbone):
    """Jitted: images (B, S, S, 3) → L2-normalized concat-multilayer dense
    features (B, h, w, C) (``evaluate_spair_correspondence.py:55-59``)."""

    @jax.jit
    def fn(variables, images):
        # variables as a jit ARGUMENT — closures inline weights into the
        # serialized HLO and blow the tunnel's compile-RPC size limit
        maps, _ = backbone._apply_fn(variables, images)
        feats = jnp.concatenate(maps, axis=-1) if len(maps) > 1 else maps[0]
        feats = feats.astype(jnp.float32)
        return feats / jnp.clip(
            jnp.linalg.norm(feats, axis=-1, keepdims=True), 1e-12, None
        )

    return lambda images: fn(backbone.device_variables, images)

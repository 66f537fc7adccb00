"""Dense correspondence estimation (reference
``evals/utils/correspondence.py``) — static-shape, fully jittable.

Design delta vs the reference: instead of boolean-indexing valid points out
of the grids (dynamic shapes, ``correspondence.py:247-252``) the full grids
are kept and validity is folded into the search itself — invalid *target*
points are displaced to a far constant (can never be a neighbour), invalid
*query* points get ``-inf`` match weight (can never be selected by top-k).
Everything compiles once per grid shape and runs on the MXU via
``ops.matching.knn2``; there is no host round-trip and no need for the
reference's 0.25x grid downscale.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from midvision_probe_tpu.ops.image import grid_sample, resize
from midvision_probe_tpu.ops.matching import calculate_ratio_test, knn2

# displacement for masked-out TARGET points. Precondition: features are
# unit-normalized before use (the cosine path normalizes; a euclidean
# caller with feature magnitudes approaching ~1e3 could match invalid
# points — no in-repo caller does, but scale _FAR if you add one).
_FAR = 1.0e3


def get_grid(H: int, W: int) -> jnp.ndarray:
    """Pixel-center (u, v, 1) grid, (3, H, W) (``correspondence.py:132-144``)."""
    grid_x = jnp.linspace(0.5, W - 0.5, W)
    grid_y = jnp.linspace(0.5, H - 0.5, H)
    xs = jnp.broadcast_to(grid_x[None, :], (H, W))
    ys = jnp.broadcast_to(grid_y[:, None], (H, W))
    return jnp.stack([xs, ys, jnp.ones_like(xs)], axis=0)


def grid_to_pointcloud(K_inv, depth, grid=None):
    """Unproject a depth map to camera-frame points (H*W, 3)
    (``correspondence.py:147-161``). ``depth``: (H, W)."""
    H, W = depth.shape
    if grid is None:
        grid = get_grid(H, W)
    points = depth[None] * grid
    points = K_inv @ points.reshape(3, H * W)
    return points.T


def project_3dto2d(xyz, K_mat):
    """``correspondence.py:193-196``."""
    uvd = xyz @ K_mat.T
    return uvd[:, :2] / jnp.clip(uvd[:, 2:3], 1e-9, None)


def sample_pointcloud_features(feats_hwc, K, pc, image_shape):
    """grid_sample features at projected 3D points
    (``correspondence.py:164-176``). ``feats_hwc``: (h, w, C)."""
    H, W = image_shape
    uvd = pc @ K.T
    uv = uvd[:, :2] / jnp.clip(uvd[:, 2:3], 1e-9, None)
    u = 2 * uv[:, 0] / W - 1
    v = 2 * uv[:, 1] / H - 1
    grid = jnp.stack([u, v], axis=-1)[None, None]  # (1, 1, N, 2)
    out = grid_sample(feats_hwc[None], grid, align_corners=False)
    return out[0, 0]  # (N, C)


def argmax_2d(x, max_value: bool = True):
    """(…, H, W) → (…, 2) (x, y) argmax coordinates
    (``correspondence.py:179-190``)."""
    h, w = x.shape[-2:]
    flat = x.reshape(*x.shape[:-2], h * w)
    idx = jnp.argmax(flat, axis=-1) if max_value else jnp.argmin(flat, axis=-1)
    return jnp.stack([idx % w, idx // w], axis=-1)


def masked_correspondences_ratio_test(
    feats_0,
    feats_1,
    valid_0,
    valid_1,
    num_corres: int,
    metric: str = "cosine",
    ratio_test: bool = True,
    use_pallas: bool | None = None,
):
    """Ratio-test matching over masked point sets with static shapes.

    Equivalent to filtering invalid points then running
    ``get_correspondences_ratio_test`` (``correspondence.py:63-102``), but
    the selection happens inside the search (see module docstring).

    Returns ``(idx0, idx1, weights)`` — indices into the *full* input arrays;
    matches whose query point is invalid carry ``-inf`` weight (all-valid
    inputs with ≥ num_corres valid points never select them).
    """
    if metric == "cosine":
        feats_0 = feats_0 / jnp.clip(
            jnp.linalg.norm(feats_0, axis=-1, keepdims=True), 1e-12, None
        )
        feats_1 = feats_1 / jnp.clip(
            jnp.linalg.norm(feats_1, axis=-1, keepdims=True), 1e-12, None
        )
    # invalid targets → far constant (cannot be a nearest neighbour)
    feats_1 = jnp.where(valid_1[:, None], feats_1, _FAR)
    dists, idx = knn2(feats_0, feats_1, metric="euclidean", use_pallas=use_pallas)
    # a NEAREST neighbour at _FAR scale means the target view had no (or
    # not enough) valid points at all — without this, the _FAR pad row
    # becomes the 2nd NN, the ratio weight comes out finite (~1.0, i.e.
    # "maximally unique"!) and garbage matches pass the isfinite(w)
    # validity filter downstream. Real features are unit-norm (cosine) or
    # data-scaled, so L2 distances sit far below _FAR/2.
    far_hit = dists[..., 0] > (_FAR / 2.0)
    if metric == "cosine":
        # inputs were pre-normalized: 1 - cos = 0.5 * L2^2
        dists = 0.5 * dists**2
    # ratio_test=False: NEGATED distance so the descending top-k keeps the
    # NEAREST pairs (fixes the reference's distance-as-weight inversion,
    # correspondence.py:74-77 — see ops/matching.py and README non-ports)
    weights = calculate_ratio_test(dists) if ratio_test else -dists[..., 0]
    weights = jnp.where(valid_0 & ~far_hit, weights, -jnp.inf)
    from midvision_probe_tpu.ops.matching import topk_matches

    idx0, idx1, w = topk_matches(weights, idx[..., 0], num_corres)
    return idx0, idx1, w


def estimate_correspondence_xyz(
    feat_0,
    feat_1,
    xyz_grid_0,
    xyz_grid_1,
    num_corr: int = 500,
    ratio_test: bool = True,
    use_pallas: bool | None = None,
):
    """NAVI-style correspondence between two xyz-annotated views
    (``correspondence.py:235-263``).

    Args:
        feat_0 / feat_1: (h, w, C) dense features (any resolution — they are
            bicubic-upsampled to the xyz grid like the reference).
        xyz_grid_0/1: (H, W, 3) per-pixel object-frame coordinates, invalid
            where z <= 0.

    Returns (c_xyz0, c_xyz1, c_weight, c_uv0, c_uv1).
    """
    H, W, _ = xyz_grid_0.shape
    f0 = resize(feat_0, (H, W), mode="bicubic")
    f1 = resize(feat_1, (H, W), mode="bicubic")

    uvd = jnp.transpose(get_grid(H, W), (1, 2, 0)).reshape(-1, 3)
    xyz_0 = xyz_grid_0.reshape(-1, 3)
    xyz_1 = xyz_grid_1.reshape(-1, 3)
    valid_0 = xyz_0[:, 2] > 0
    valid_1 = xyz_1[:, 2] > 0

    idx0, idx1, w = masked_correspondences_ratio_test(
        f0.reshape(-1, f0.shape[-1]),
        f1.reshape(-1, f1.shape[-1]),
        valid_0,
        valid_1,
        num_corr,
        ratio_test=ratio_test,
        use_pallas=use_pallas,
    )
    return (
        xyz_0[idx0],
        xyz_1[idx1],
        w,
        uvd[idx0][:, :2],
        uvd[idx1][:, :2],
    )


def estimate_correspondence_depth(
    feat_0,
    feat_1,
    depth_0,
    depth_1,
    K,
    num_corr: int = 500,
    use_pallas: bool | None = None,
):
    """ScanNet-style correspondence from two depth maps + intrinsics
    (``correspondence.py:218-232``). feats (h, w, C); depths (H, W).

    Returns (corr_xyz0, corr_xyz1, weights)."""
    K_inv = jnp.linalg.inv(K)
    xyz_0 = grid_to_pointcloud(K_inv, depth_0)
    xyz_1 = grid_to_pointcloud(K_inv, depth_1)
    valid_0 = xyz_0[:, 2] > 0
    valid_1 = xyz_1[:, 2] > 0

    f0 = sample_pointcloud_features(feat_0, K, xyz_0, depth_0.shape)
    f1 = sample_pointcloud_features(feat_1, K, xyz_1, depth_1.shape)

    idx0, idx1, w = masked_correspondences_ratio_test(
        f0, f1, valid_0, valid_1, num_corr, use_pallas=use_pallas
    )
    return xyz_0[idx0], xyz_1[idx1], w

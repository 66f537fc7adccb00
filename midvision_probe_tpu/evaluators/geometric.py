"""Geometric correspondence evaluation cores (NAVI + ScanNet), batched/jitted.

Reference: ``evaluate_navi_correspondence.py:143-223`` and
``render_scannet_correspondence.py:188-268``. The per-instance Python loop
becomes a vmapped jit over pair batches; the faiss matching is the Pallas
kNN inside ``utils.correspondence``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from midvision_probe_tpu.utils.correspondence import (
    estimate_correspondence_depth,
    estimate_correspondence_xyz,
    project_3dto2d,
)
from midvision_probe_tpu.utils.transformations import transform_points_Rt


@functools.partial(jax.jit, static_argnames=("num_corr", "use_pallas"))
def navi_batch_errors(
    feats_0, feats_1, xyz_0, xyz_1, Rt_01, intrinsics,
    num_corr: int = 500, use_pallas: bool | None = None,
):
    """Batched NAVI pair errors.

    Args:
        feats_0/1: (B, h, w, C); xyz_0/1: (B, H, W, 3); Rt_01: (B, 4, 4)
        camera-0 → camera-1 transforms; intrinsics: (B, 3, 3) FULL-RES.

    Returns (err_3d (B, N), err_2d (B, N), valid (B, N)) in meters /
    full-resolution pixels: err2d projects 3D points through the full-res
    intrinsics, so it is already in image pixels — the reference rescales
    only the VISUALIZATION uv grids by 1/scale_factor, never the error
    (``evaluate_navi_correspondence.py:183-192``; an earlier revision here
    divided err2d by scale_factor, inflating it 4x at the protocol's 0.25).
    ``valid`` marks real matches: when a pair has fewer
    than ``num_corr`` valid query points, the static-shape selection pads
    with -inf-weight garbage rows — the reference instead returns only the
    real matches (``correspondence.py:69-74`` boolean-filters first), so
    recalls must be computed over ``valid`` rows only.
    """

    def one(f0, f1, x0, x1, Rt, K):
        c_xyz0, c_xyz1, w, c_uv0, c_uv1 = estimate_correspondence_xyz(
            f0, f1, x0, x1, num_corr, use_pallas=use_pallas
        )
        c_xyz0in1 = transform_points_Rt(c_xyz0, Rt[:3, :4])
        err3d = jnp.linalg.norm(c_xyz0in1 - c_xyz1, axis=-1)
        uv1 = project_3dto2d(c_xyz1, K)
        uv0in1 = project_3dto2d(c_xyz0in1, K)
        err2d = jnp.linalg.norm(uv0in1 - uv1, axis=-1)
        return err3d, err2d, jnp.isfinite(w)

    return jax.vmap(one)(feats_0, feats_1, xyz_0, xyz_1, Rt_01, intrinsics)


@functools.partial(jax.jit, static_argnames=("num_corr", "use_pallas"))
def scannet_batch_errors(
    feats_0, feats_1, depth_0, depth_1, K, Rt_01,
    num_corr: int = 500, use_pallas: bool | None = None,
):
    """Batched ScanNet pair errors (depth-unprojection variant,
    ``render_scannet_correspondence.py:188-230``).

    depth_0/1: (B, H, W); K: (B, 3, 3); Rt_01: (B, 4, 4).
    Returns (err_3d (B, N), err_2d (B, N), uv_0in0 (B, N, 2), uv_1in1
    (B, N, 2), valid (B, N)) — the uv points feed the qualitative pair
    renders (``render_scannet_correspondence.py:224-240``); ``valid``
    marks real matches (see ``navi_batch_errors``)."""

    def one(f0, f1, d0, d1, Ki, Rt):
        c_xyz0, c_xyz1, w = estimate_correspondence_depth(
            f0, f1, d0, d1, Ki, num_corr, use_pallas=use_pallas
        )
        c_xyz0in1 = transform_points_Rt(c_xyz0, Rt[:3, :4])
        err3d = jnp.linalg.norm(c_xyz0in1 - c_xyz1, axis=-1)
        uv0in0 = project_3dto2d(c_xyz0, Ki)
        uv1 = project_3dto2d(c_xyz1, Ki)
        uv0in1 = project_3dto2d(c_xyz0in1, Ki)
        err2d = jnp.linalg.norm(uv0in1 - uv1, axis=-1)
        return err3d, err2d, uv0in0, uv1, jnp.isfinite(w)

    return jax.vmap(one)(feats_0, feats_1, depth_0, depth_1, K, Rt_01)

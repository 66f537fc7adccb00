"""SE(3) utilities (reference ``evals/utils/transformations.py``)."""

from __future__ import annotations

import jax.numpy as jnp


def transform_points_Rt(points, viewpoint, inverse: bool = False):
    """Apply (or invert) a (..., 3, 4|4, 4) rigid transform to (..., n, 3)
    points (``transformations.py:27-36``)."""
    R = viewpoint[..., :3, :3]
    t = viewpoint[..., None, :3, 3]
    if inverse:
        return (points - t) @ R
    return points @ jnp.swapaxes(R, -2, -1) + t


def so3_rotation_angle(R, eps: float = 1e-4):
    """Rotation angle of a batch of 3x3 matrices
    (``transformations.py:47-63``)."""
    rot_trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    phi_cos = (rot_trace - 1.0) * 0.5
    return jnp.arccos(jnp.clip(phi_cos, -1.0, 1.0))


def so3_relative_angle(R1, R2, eps: float = 1e-4):
    """``transformations.py:39-44``."""
    R12 = jnp.einsum("...ij,...kj->...ik", R1, R2)
    return so3_rotation_angle(R12, eps=eps)

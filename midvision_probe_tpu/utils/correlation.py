"""Representational-similarity (RSA) utilities (reference
``evals/utils/correlation.py``).

Fixed vs upstream: the reference file is unimportable — it imports from the
stale ``dense_encoders`` module (``correlation.py:30``, SURVEY §1 note).
The distance matrix is computed on device (MXU expansion); the small
correlation statistics stay in scipy.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import scipy.stats


def compute_pw_distances(source_feat, target_feat=None):
    """Pairwise L2 distance matrix (``correlation.py:33-41``). (N, D)."""
    target_feat = source_feat if target_feat is None else target_feat
    s = jnp.asarray(source_feat, jnp.float32)
    t = jnp.asarray(target_feat, jnp.float32)
    sq = (
        jnp.sum(s * s, axis=1)[:, None]
        + jnp.sum(t * t, axis=1)[None, :]
        - 2.0 * jnp.dot(s, t.T, precision="highest")
    )
    return jnp.sqrt(jnp.clip(sq, 0, None))


def compute_row_correlation(mat_a, mat_b, method="pearson"):
    """Mean per-row correlation (``correlation.py:44-55``)."""
    assert method in ("pearson", "spearman")
    mat_a, mat_b = np.asarray(mat_a), np.asarray(mat_b)
    corr_func = getattr(scipy.stats, f"{method}r")
    return float(np.mean([
        corr_func(mat_a[i], mat_b[i])[0] for i in range(mat_a.shape[0])
    ]))


def upper(matrix):
    """Upper triangle (k=1) values (``correlation.py:69-80``)."""
    matrix = np.asarray(matrix)
    n, m = matrix.shape
    return matrix[np.triu_indices(n=n, m=m, k=1)]


def compute_uppertriangle_correlation(mat_a, mat_b, method="pearson"):
    """``correlation.py:58-66``."""
    assert method in ("pearson", "spearman")
    corr_func = getattr(scipy.stats, f"{method}r")
    return float(corr_func(upper(mat_a), upper(mat_b))[0])


def matrix_distance(matrix_a, matrix_b, use_upper=False):
    """``correlation.py:83-91``."""
    if use_upper:
        s = compute_uppertriangle_correlation(matrix_a, matrix_b, "spearman")
        p = compute_uppertriangle_correlation(matrix_a, matrix_b, "pearson")
    else:
        s = compute_row_correlation(matrix_a, matrix_b, "spearman")
        p = compute_row_correlation(matrix_a, matrix_b, "pearson")
    return f"S:{s:.3f} P:{p:.3f}"

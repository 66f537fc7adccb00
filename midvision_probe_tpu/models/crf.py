"""DenseCRF mask refinement (reference ``evals/models/crf.py``).

The reference calls the pydensecrf C++ library (permutohedral-lattice
mean-field, Krähenbühl & Koltun 2011) with constants MAX_ITER=10, Gaussian
pairwise (sxy=3, compat=7) + bilateral (sxy=50, srgb=5, compat=10)
(``crf.py:11-16``).

Here the native path is this repo's own C++ permutohedral implementation
(``native/densecrf``, loaded via ctypes); when the shared library is not
built, a numpy bilateral-grid approximation runs instead (same API, softer
filtering).
"""

from __future__ import annotations

import ctypes
import logging
import os

import numpy as np

log = logging.getLogger(__name__)

MAX_ITER = 10
POS_W = 7.0
POS_XY_STD = 3.0
BI_W = 10.0
BI_XY_STD = 50.0
BI_RGB_STD = 5.0

_LIB = None
_LIB_TRIED = False


def _load_native():
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    for cand in (
        os.path.join(here, "native", "densecrf", "libdensecrf.so"),
        os.path.join(here, "libdensecrf.so"),
    ):
        if os.path.exists(cand):
            lib = ctypes.CDLL(cand)
            lib.dense_crf_inference.argtypes = [
                ctypes.POINTER(ctypes.c_ubyte),  # image HxWx3
                ctypes.POINTER(ctypes.c_float),  # unary probs CxHxW
                ctypes.c_int, ctypes.c_int, ctypes.c_int,  # H, W, C
                ctypes.c_int,  # iters
                ctypes.c_float, ctypes.c_float,  # pos_w, pos_xy_std
                ctypes.c_float, ctypes.c_float, ctypes.c_float,  # bi_w/xy/rgb
                ctypes.POINTER(ctypes.c_float),  # out QxCxHxW
            ]
            lib.dense_crf_inference.restype = ctypes.c_int
            _LIB = lib
            log.info("native densecrf loaded from %s", cand)
            return _LIB
    return None


def _bilinear_resize(mask_chw: np.ndarray, hw) -> np.ndarray:
    import jax.numpy as jnp

    from midvision_probe_tpu.ops.image import resize

    x = jnp.asarray(mask_chw.transpose(1, 2, 0))
    return np.asarray(resize(x, hw, mode="bilinear")).transpose(2, 0, 1)


def _softmax(x, axis=0):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def densecrf(image: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Refine a soft binary mask against the RGB image
    (API of reference ``crf.py:19-49``).

    Args:
        image: (H, W, 3) uint8 (or [0,1]/[0,255] float).
        mask: (h, w) float foreground map (any resolution).

    Returns:
        (H, W) float32 hard MAP labels (0/1).
    """
    if image.dtype != np.uint8:
        img = image.astype(np.float32)
        if img.max() <= 1.5:
            img = img * 255.0
        image = np.clip(img, 0, 255).astype(np.uint8)

    h, w = mask.shape
    fg = mask.astype(np.float32).reshape(1, h, w)
    logits = np.concatenate([1.0 - fg, fg], axis=0)
    H, W = image.shape[:2]
    logits = _bilinear_resize(logits, (H, W))
    probs = _softmax(logits, axis=0)
    C = probs.shape[0]

    lib = _load_native()
    if lib is not None:
        # C-order buffers: the native side reads/writes row-major (zeros_like
        # would inherit the transposed resize view's strides)
        out = np.zeros(probs.shape, dtype=np.float32, order="C")
        img_c = np.ascontiguousarray(image)
        probs_c = np.ascontiguousarray(probs, dtype=np.float32)
        ret = lib.dense_crf_inference(
            img_c.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            probs_c.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            H, W, C, MAX_ITER,
            POS_W, POS_XY_STD, BI_W, BI_XY_STD, BI_RGB_STD,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        if ret == 0:
            return np.argmax(out, axis=0).astype(np.float32)
        log.warning("native densecrf failed (ret=%d); using fallback", ret)

    return _meanfield_fallback(image, probs)


def _meanfield_fallback(image: np.ndarray, probs: np.ndarray) -> np.ndarray:
    """Numpy mean-field with a coarse bilateral-grid message pass."""
    from scipy.ndimage import gaussian_filter

    C, H, W = probs.shape
    unary = -np.log(np.clip(probs, 1e-8, None))
    Q = probs.copy()
    img = image.astype(np.float32)

    # bilateral grid setup (downsampled spatial x coarse color bins)
    sg = max(int(BI_XY_STD // 2), 1)
    cb = 8  # color bins per channel on luminance proxy
    lum = img.mean(axis=-1) / 255.0
    lum_bin = np.clip((lum * (cb - 1)).astype(int), 0, cb - 1)
    ys = np.arange(H) // sg
    xs = np.arange(W) // sg
    gh, gw = ys.max() + 1, xs.max() + 1
    flat_idx = (ys[:, None] * gw + xs[None, :]) * cb + lum_bin

    for _ in range(MAX_ITER):
        # gaussian (spatial) message — neighbourhood average; the center
        # self-weight of a sigma=3 kernel is ~2%, so self-exclusion is
        # skipped (subtracting full Q would cancel the label preference)
        m_gauss = np.stack([gaussian_filter(Q[c], POS_XY_STD) for c in range(C)])
        # bilateral message via grid splat/slice
        m_bi = np.zeros_like(Q)
        for c in range(C):
            grid = np.bincount(
                flat_idx.reshape(-1), Q[c].reshape(-1), minlength=gh * gw * cb
            )
            count = np.bincount(
                flat_idx.reshape(-1), minlength=gh * gw * cb
            ).clip(1)
            avg = (grid / count).reshape(gh, gw, cb)
            avg = gaussian_filter(avg, (1.0, 1.0, 1.0))
            m_bi[c] = avg.reshape(-1)[flat_idx.reshape(-1)].reshape(H, W)

        msg = POS_W * m_gauss + BI_W * m_bi
        # compatibility: Potts — penalize other labels' mass
        pairwise = msg.sum(axis=0, keepdims=True) - msg
        Q = _softmax(-unary - pairwise, axis=0)

    return np.argmax(Q, axis=0).astype(np.float32)

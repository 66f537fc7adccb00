"""Torch-semantics image resampling as static matmuls (TPU-friendly).

The reference leans on ``torch.nn.functional.interpolate`` /
``grid_sample`` with several distinct conventions that all matter for metric
parity:

* DPT fusion blocks: bilinear x2 with ``align_corners=True``
  (reference ``evals/models/probes.py:256-258``),
* probe outputs / features: bilinear or bicubic with ``align_corners=False``
  (``train_depth.py:114``, ``correspondence.py:240``),
* pos-embed resize: bicubic antialiased (``evals/models/utils.py:43-45``),
* keypoint feature sampling: ``grid_sample`` bilinear, zeros padding,
  ``align_corners=False`` (``correspondence.py:173``).

Instead of gathers, each 1-D resample is expressed as a dense
``(out_size, in_size)`` weight matrix applied with einsum — separably over H
then W. The matrices are computed in numpy at trace time (shapes are static
under jit) so XLA sees two clean matmuls that tile onto the MXU.

Layout: this framework is channel-last (NHWC) end-to-end.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _source_coords(out_size: int, in_size: int, align_corners: bool) -> np.ndarray:
    dst = np.arange(out_size, dtype=np.float64)
    if align_corners:
        if out_size == 1:
            return np.zeros(1)
        return dst * (in_size - 1) / (out_size - 1)
    scale = in_size / out_size
    return (dst + 0.5) * scale - 0.5


def _cubic_kernel(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    # torch's bicubic uses the Catmull-Rom-family kernel with a = -0.75
    ax = np.abs(x)
    ax2, ax3 = ax**2, ax**3
    w = np.where(
        ax <= 1,
        (a + 2) * ax3 - (a + 3) * ax2 + 1,
        np.where(ax < 2, a * ax3 - 5 * a * ax2 + 8 * a * ax - 4 * a, 0.0),
    )
    return w


@functools.lru_cache(maxsize=256)
def _resize_matrix(
    in_size: int,
    out_size: int,
    mode: str,
    align_corners: bool,
    antialias: bool,
) -> np.ndarray:
    """Dense (out_size, in_size) resampling matrix with edge clamping."""
    src = _source_coords(out_size, in_size, align_corners)
    W = np.zeros((out_size, in_size), dtype=np.float64)

    if mode == "nearest":
        # same index formula as the gather fast path (_nearest_indices)
        W[np.arange(out_size), _nearest_indices(in_size, out_size)] = 1.0
        return W.astype(np.float32)

    if mode in ("bilinear", "linear"):
        base_support = 1.0
        base_kernel = lambda x: np.clip(1.0 - np.abs(x), 0.0, None)  # noqa: E731
    elif mode in ("bicubic", "cubic"):
        base_support = 2.0
        # torch: plain bicubic uses a=-0.75; the antialias path (PIL-derived)
        # uses a=-0.5 (aten UpSampleKernel HelperInterpCubic::aa_filter).
        a = -0.5 if antialias else -0.75
        base_kernel = functools.partial(_cubic_kernel, a=a)
    else:
        raise ValueError(f"Unsupported resize mode: {mode}")

    if antialias:
        # PIL/torch antialias path: scaled kernel, window truncated at the
        # borders and renormalized (aten UpSample antialias kernels).
        scale = max(in_size / out_size, 1.0)
        support = base_support * scale
        for i in range(out_size):
            center = src[i] + 0.5
            xmin = max(0, int(np.floor(center - support + 0.5)))
            xmax = min(in_size, int(np.floor(center + support + 0.5)))
            taps = np.arange(xmin, xmax)
            w = base_kernel((taps - center + 0.5) / scale)
            s = w.sum()
            if s != 0:
                w = w / s
            W[i, taps] = w
    else:
        support = base_support
        for i in range(out_size):
            lo = int(np.floor(src[i] - support)) + 1
            hi = int(np.ceil(src[i] + support))
            taps = np.arange(lo, hi + 1)
            w = base_kernel(taps - src[i])
            # replicate-pad at borders (torch clamps source indices)
            taps = np.clip(taps, 0, in_size - 1)
            np.add.at(W[i], taps, w)

    return W.astype(np.float32)


@functools.lru_cache(maxsize=256)
def _nearest_indices(in_size: int, out_size: int) -> np.ndarray:
    """Source index per output position — same formula as the 1-hot rows of
    ``_resize_matrix(mode='nearest')`` (torch legacy floor(dst*in/out))."""
    return np.clip(np.arange(out_size) * in_size // out_size,
                   0, in_size - 1).astype(np.int32)


def resize(
    x: jnp.ndarray,
    size: tuple[int, int] | None = None,
    scale_factor: float | tuple[float, float] | None = None,
    mode: str = "bilinear",
    align_corners: bool = False,
    antialias: bool = False,
) -> jnp.ndarray:
    """torch ``F.interpolate`` for NHWC (or HWC) arrays.

    ``resize(x, scale_factor=2, mode='bilinear', align_corners=True)`` matches
    ``F.interpolate(x_nchw, scale_factor=2, mode='bilinear',
    align_corners=True)`` on the permuted tensor.
    """
    if mode == "nearest" and align_corners:
        # torch parity: F.interpolate raises for this combination, and a
        # silent ignore would hide porting mistakes in a module whose whole
        # contract is torch-exact behavior
        raise ValueError(
            "align_corners is not applicable to mode='nearest' "
            "(torch F.interpolate raises for this combination too)")
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    _, h, w, _ = x.shape
    if size is None:
        if scale_factor is None:
            raise ValueError("resize() needs size or scale_factor")
        if isinstance(scale_factor, (int, float)):
            scale_factor = (scale_factor, scale_factor)
        size = (int(h * scale_factor[0]), int(w * scale_factor[1]))
    out_h, out_w = int(size[0]), int(size[1])

    if (out_h, out_w) != (h, w):
        # nearest fast path: a pure jnp.take (bit-identical to the 1-hot
        # matrix rows, no dtype round trip). Bilinear/bicubic stay on the
        # dense-matrix einsum: a 2-tap gather+lerp variant was measured
        # ~2x SLOWER end-to-end on v5e (resnet-DPT probe step 625→1130 ms,
        # linear-probe step 45→140 ms) — TPU gathers serialize where the
        # one-hot matmul rides the MXU.
        if mode == "nearest":
            if out_h != h:
                x = jnp.take(x, jnp.asarray(_nearest_indices(h, out_h)), axis=1)
            if out_w != w:
                x = jnp.take(x, jnp.asarray(_nearest_indices(w, out_w)), axis=2)
            return x[0] if squeeze else x
        dtype = x.dtype
        xf = x.astype(jnp.float32)
        hp = jax.lax.Precision.HIGHEST
        if out_h != h:
            Wh = jnp.asarray(_resize_matrix(h, out_h, mode, align_corners, antialias))
            xf = jnp.einsum("oh,bhwc->bowc", Wh, xf, precision=hp)
        if out_w != w:
            Ww = jnp.asarray(_resize_matrix(w, out_w, mode, align_corners, antialias))
            xf = jnp.einsum("ow,bhwc->bhoc", Ww, xf, precision=hp)
        x = xf.astype(dtype)
    return x[0] if squeeze else x


def center_padding(images: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """Zero-pad NHWC images so H and W are multiples of ``patch_size``.

    Mirrors reference ``evals/models/utils.py:55-72`` (center placement: left
    and top get the smaller half of the padding).
    """
    h, w = images.shape[1], images.shape[2]
    diff_h = h % patch_size
    diff_w = w % patch_size
    if diff_h == 0 and diff_w == 0:
        return images
    pad_h = (patch_size - diff_h) % patch_size
    pad_w = (patch_size - diff_w) % patch_size
    pad_t, pad_l = pad_h // 2, pad_w // 2
    pad_b, pad_r = pad_h - pad_t, pad_w - pad_l
    return jnp.pad(images, ((0, 0), (pad_t, pad_b), (pad_l, pad_r), (0, 0)))


def grid_sample(
    feats: jnp.ndarray,
    grid: jnp.ndarray,
    align_corners: bool = False,
) -> jnp.ndarray:
    """torch ``F.grid_sample`` (bilinear, zeros padding) for NHWC features.

    Args:
        feats: ``(B, H, W, C)`` feature maps.
        grid:  ``(B, Hg, Wg, 2)`` sampling locations in ``[-1, 1]``; the last
            axis is ``(x, y)`` like torch (reference use:
            ``correspondence.py:164-176``, SPair keypoint sampling).

    Returns:
        ``(B, Hg, Wg, C)`` sampled features; out-of-bounds positions are 0.
    """
    B, H, W, C = feats.shape
    gx, gy = grid[..., 0], grid[..., 1]
    if align_corners:
        fx = (gx + 1.0) * 0.5 * (W - 1)
        fy = (gy + 1.0) * 0.5 * (H - 1)
    else:
        fx = (gx + 1.0) * 0.5 * W - 0.5
        fy = (gy + 1.0) * 0.5 * H - 0.5

    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    wx = fx - x0
    wy = fy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def gather(yi, xi):
        valid = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        yc = jnp.clip(yi, 0, H - 1)
        xc = jnp.clip(xi, 0, W - 1)
        vals = jnp.take_along_axis(
            feats.reshape(B, H * W, C),
            (yc * W + xc).reshape(B, -1, 1),
            axis=1,
        ).reshape(*yi.shape, C)
        return vals * valid[..., None].astype(feats.dtype)

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x0i + 1)
    v10 = gather(y0i + 1, x0i)
    v11 = gather(y0i + 1, x0i + 1)

    wx = wx[..., None].astype(feats.dtype)
    wy = wy[..., None].astype(feats.dtype)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy

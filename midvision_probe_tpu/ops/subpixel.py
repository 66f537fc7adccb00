"""Fold a nearest-neighbour upsample into the 3x3 conv that follows it.

The DPT decoder's hottest op is ``out_conv_0``: a 3x3, 512->512 conv applied
AFTER a nearest 4x upsample (reference ``evals/models/probes.py:388-391`` —
the bare ``F.interpolate(scale_factor=4)`` defaults to nearest). At NYU
probing resolution that conv runs at 240x240 and costs ~272 GF/img forward —
the single largest FLOP line item of the whole probe-training suite.

But a nearest-upsampled image is piecewise constant on k x k blocks
(``src = dst * in // out = dst // k`` for integer k — see
``ops/image.py:_nearest_indices``), so the 3x3 window over the upsampled
grid touches at most 2 distinct source pixels per axis. Writing the output
pixel at ``(k*i + a, k*j + b)`` (block ``(i, j)``, phase ``(a, b)``) as a
conv over the BASE grid, the effective kernel per phase is:

* phase ``a = 0``       (1-D view): taps ``(i-1, i)`` with weights
  ``[w0, w1 + w2]``,
* phases ``0 < a < k-1``: a single tap ``i`` with weight ``w0 + w1 + w2``
  (identical for every interior phase),
* phase ``a = k-1``     : taps ``(i, i+1)`` with weights ``[w0 + w1, w2]``.

Composing the two axes gives 9 distinct small convs (4 corner 2x2, 4 edge
1x2/2x1, 1 interior 1x1) whose outputs tile the k x k phase grid — 25
tap-products per base pixel instead of ``9 * k**2`` on the upsampled grid
(k=4: 25/144 ≈ 17% of the FLOPs; k=2: 16/36 ≈ 44%). The result is
mathematically EXACT — only float summation order changes (phase kernels
are sums of the original weights, computed in f32 before the cast to the
conv dtype) — and verified against the resize->conv reference order in
``tests/test_subpixel.py``.

The phase kernels are derived from ONE stored (3, 3, Cin, Cout) parameter,
so the param pytree (and every checkpoint converter) is identical to the
plain ``nn.Conv`` formulation; gradients flow through the weight sums.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


def _collapse(w: jnp.ndarray, axis: int):
    """Collapse one 3-tap axis of an HWIO kernel into the (L, S, R) phase
    kernels: L = [w0, w1+w2] (taps i-1, i), S = [w0+w1+w2] (tap i),
    R = [w0+w1, w2] (taps i, i+1)."""
    w0, w1, w2 = jnp.split(w, 3, axis=axis)
    L = jnp.concatenate([w0, w1 + w2], axis=axis)
    S = w0 + w1 + w2
    R = jnp.concatenate([w0 + w1, w2], axis=axis)
    return L, S, R


def conv3x3_after_nearest_up(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray | None,
    up: int,
    dtype: Any = None,
    precision=None,
) -> jnp.ndarray:
    """``conv3x3(nearest_up(x, up), kernel, SAME)`` computed at base
    resolution. x: (B, H, W, Cin) NHWC; kernel: (3, 3, Cin, Cout) HWIO
    (f32 master copy); returns (B, up*H, up*W, Cout).

    ``dtype``: compute dtype for the convs (phase-kernel sums happen in the
    kernel's own dtype first — more accurate than summing casts)."""
    assert up >= 2 and kernel.shape[:2] == (3, 3), (up, kernel.shape)
    B, H, W, _ = x.shape
    Cout = kernel.shape[-1]
    k = up
    if dtype is not None:
        x = x.astype(dtype)

    rowL, rowS, rowR = _collapse(kernel, 0)
    kern = {}
    for rname, rk in (("L", rowL), ("S", rowS), ("R", rowR)):
        cL, cS, cR = _collapse(rk, 1)
        kern[rname + "L"], kern[rname + "S"], kern[rname + "R"] = cL, cS, cR

    # padding per phase class: L-window = taps (i-1, i)  -> pad 1 before;
    # R-window = taps (i, i+1) -> pad 1 after; S = tap i -> no pad
    pad = {"L": (1, 0), "S": (0, 0), "R": (0, 1)}

    def conv(name):
        kk = kern[name]
        if dtype is not None:
            kk = kk.astype(dtype)
        return jax.lax.conv_general_dilated(
            x, kk,
            window_strides=(1, 1),
            padding=(pad[name[0]], pad[name[1]]),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=precision,
        )

    out = {n: conv(n) for n in kern}
    nin = k - 2  # interior phase count per axis

    def row(rname):
        cells = [out[rname + "L"]] + [out[rname + "S"]] * nin + [out[rname + "R"]]
        return jnp.stack(cells, axis=3)  # (B, H, W, k, Cout)

    top, mid, bot = row("L"), row("S"), row("R")
    grid = jnp.stack([top] + [mid] * nin + [bot], axis=3)  # (B, H, W, k, k, C)
    grid = jnp.transpose(grid, (0, 1, 3, 2, 4, 5))  # (B, H, k, W, k, C)
    y = grid.reshape(B, k * H, k * W, Cout)
    if bias is not None:
        if dtype is not None:
            bias = bias.astype(dtype)
        y = y + bias
    return y


class NearestUpConv(nn.Module):
    """Drop-in for ``resize(x, scale_factor=up, mode='nearest')`` followed by
    ``nn.Conv(features, (3, 3), SAME)`` — identical param pytree
    (``kernel``/``bias`` with nn.Conv default inits), exact math, ~4x fewer
    FLOPs at up=4."""

    features: int
    up: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, cin, self.features),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        return conv3x3_after_nearest_up(x, kernel, bias, self.up,
                                        dtype=self.dtype)

"""Flax ConvNeXt(-v2) with 4 stage taps (reference wrapper
``evals/models/convnext.py``: open_clip laion trunk / timm in22k /
FCMAE-v2, stage outputs bilinear-resized to the /16 grid for ``dense``).

Architecture (timm layout): stem conv4x4/s4 + LN; stages of blocks
[dwconv 7x7 → LN → pw fc1 (4x) → GELU → (GRN for v2) → pw fc2 →
layer-scale gamma (v1) → residual]; LN + conv2x2/s2 downsample between
stages. Channels-last throughout (native for both TPU and ConvNeXt math).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import flax.linen as nn

from midvision_probe_tpu.ops.activations import gelu
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ConvNeXtConfig:
    depths: tuple = (3, 3, 27, 3)
    dims: tuple = (128, 256, 512, 1024)  # ConvNeXt-Base
    use_grn: bool = False  # v2 (FCMAE) replaces layer-scale with GRN
    layernorm_eps: float = 1e-6
    dtype: Any = jnp.float32


class ConvNeXtBlock(nn.Module):
    cfg: ConvNeXtConfig
    dim: int

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        h = nn.Conv(
            self.dim, (7, 7), padding=((3, 3), (3, 3)),
            feature_group_count=self.dim, dtype=c.dtype, name="dwconv",
        )(x)
        h = nn.LayerNorm(epsilon=c.layernorm_eps, dtype=c.dtype, name="norm")(h)
        h = nn.Dense(4 * self.dim, dtype=c.dtype, name="pwconv1")(h)
        h = gelu(h)
        if c.use_grn:
            gx = jnp.sqrt(jnp.sum(h.astype(jnp.float32) ** 2, axis=(1, 2),
                                  keepdims=True))
            nx = gx / (gx.mean(axis=-1, keepdims=True) + 1e-6)
            grn_g = self.param("grn_gamma", nn.initializers.zeros,
                               (4 * self.dim,), jnp.float32)
            grn_b = self.param("grn_beta", nn.initializers.zeros,
                               (4 * self.dim,), jnp.float32)
            h = (grn_g * (h * nx.astype(h.dtype)) + grn_b + h.astype(jnp.float32)
                 ).astype(c.dtype)
        h = nn.Dense(self.dim, dtype=c.dtype, name="pwconv2")(h)
        if not c.use_grn:
            gamma = self.param("gamma", nn.initializers.constant(1e-6),
                               (self.dim,), jnp.float32)
            h = h * gamma.astype(c.dtype)
        return x + h


class ConvNeXt(nn.Module):
    cfg: ConvNeXtConfig

    @nn.compact
    def __call__(self, images: jnp.ndarray, taps: Sequence[int] = (0, 1, 2, 3)):
        c = self.cfg
        x = nn.Conv(c.dims[0], (4, 4), strides=(4, 4), padding="VALID",
                    dtype=c.dtype, name="stem_conv")(images.astype(c.dtype))
        x = nn.LayerNorm(epsilon=c.layernorm_eps, dtype=c.dtype,
                         name="stem_norm")(x)
        outputs = {}
        for s, (depth, dim) in enumerate(zip(c.depths, c.dims)):
            if s > 0:
                x = nn.LayerNorm(epsilon=c.layernorm_eps, dtype=c.dtype,
                                 name=f"downsample_norm_{s}")(x)
                x = nn.Conv(dim, (2, 2), strides=(2, 2), padding="VALID",
                            dtype=c.dtype, name=f"downsample_conv_{s}")(x)
            for b in range(depth):
                x = ConvNeXtBlock(c, dim, name=f"stage{s}_block{b}")(x)
            outputs[s] = x
        return [outputs[i] for i in taps]

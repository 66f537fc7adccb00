"""SD AutoencoderKL *encoder* in Flax (NHWC) — DIFT only needs
``vae.encode(images).latent_dist.mode()`` (``dift_sd.py:205-206``); the
decoder is deleted even in the reference (``dift_sd.py:166``).

Structure (diffusers AutoencoderKL encoder): conv_in(128) → 4 down blocks
(2 ResNets each, channels (128, 256, 512, 512), stride-2 conv between) →
mid (ResNet, single-head attention, ResNet) → GroupNorm+SiLU → conv_out(8)
→ quant_conv(8) → moments; mode = mean = first 4 channels, scaled by
``scaling_factor`` (0.18215).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class VAEEncoderConfig:
    block_out_channels: tuple = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    norm_groups: int = 32
    scaling_factor: float = 0.18215
    dtype: Any = jnp.float32


class VAEResnet(nn.Module):
    cfg: VAEEncoderConfig
    out_ch: int

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        h = nn.GroupNorm(num_groups=c.norm_groups, epsilon=1e-6,
                         dtype=c.dtype, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=c.dtype, name="conv1")(h)
        h = nn.GroupNorm(num_groups=c.norm_groups, epsilon=1e-6,
                         dtype=c.dtype, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=c.dtype, name="conv2")(h)
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), dtype=c.dtype,
                        name="conv_shortcut")(x)
        return x + h


class VAEAttention(nn.Module):
    """Single-head spatial self-attention (diffusers Attention in VAE mid)."""

    cfg: VAEEncoderConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        B, H, W, C = x.shape
        h = nn.GroupNorm(num_groups=c.norm_groups, epsilon=1e-6,
                         dtype=c.dtype, name="group_norm")(x)
        h = h.reshape(B, H * W, C)
        q = nn.Dense(C, dtype=c.dtype, name="to_q")(h)
        k = nn.Dense(C, dtype=c.dtype, name="to_k")(h)
        v = nn.Dense(C, dtype=c.dtype, name="to_v")(h)
        attn = jnp.einsum("bqc,bkc->bqk", q * (C**-0.5), k,
                          preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(c.dtype)
        out = jnp.einsum("bqk,bkc->bqc", attn, v)
        out = nn.Dense(C, dtype=c.dtype, name="to_out")(out)
        return x + out.reshape(B, H, W, C)


class VAEEncoder(nn.Module):
    cfg: VAEEncoderConfig

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        """images (B, H, W, 3) in [-1, 1] → scaled mode latents
        (B, H/8, W/8, 4)."""
        c = self.cfg
        chans = c.block_out_channels
        h = nn.Conv(chans[0], (3, 3), padding=((1, 1), (1, 1)),
                    dtype=c.dtype, name="conv_in")(images.astype(c.dtype))
        for lvl, ch in enumerate(chans):
            for b in range(c.layers_per_block):
                h = VAEResnet(c, ch, name=f"down_{lvl}_res_{b}")(h)
            if lvl < len(chans) - 1:
                # diffusers uses asymmetric (0,1) padding for VAE downsample
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = nn.Conv(ch, (3, 3), strides=(2, 2), padding="VALID",
                            dtype=c.dtype, name=f"down_{lvl}_downsample")(h)
        h = VAEResnet(c, chans[-1], name="mid_res_0")(h)
        h = VAEAttention(c, name="mid_attn")(h)
        h = VAEResnet(c, chans[-1], name="mid_res_1")(h)
        h = nn.GroupNorm(num_groups=c.norm_groups, epsilon=1e-6,
                         dtype=c.dtype, name="conv_norm_out")(h)
        h = nn.silu(h)
        moments = nn.Conv(2 * c.latent_channels, (3, 3),
                          padding=((1, 1), (1, 1)), dtype=c.dtype,
                          name="conv_out")(h)
        moments = nn.Conv(2 * c.latent_channels, (1, 1), dtype=c.dtype,
                          name="quant_conv")(moments)
        mode = moments[..., : c.latent_channels]  # DiagonalGaussian.mode()
        return mode * c.scaling_factor

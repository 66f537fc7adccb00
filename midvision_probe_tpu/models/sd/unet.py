"""SD-2.1 UNet2DConditionModel in Flax (NHWC) with up-block feature taps.

Structure (diffusers ``UNet2DConditionModel`` for stable-diffusion-2-1):
conv_in → time embedding (sinusoidal 320 → SiLU MLP 1280) →
down blocks [CrossAttn(320), CrossAttn(640), CrossAttn(1280), Plain(1280)]
(2 ResNet blocks each + spatial transformer + downsample conv) →
mid (ResNet, transformer, ResNet) →
up blocks [Plain(1280), CrossAttn(1280), CrossAttn(640), CrossAttn(320)]
(3 ResNet blocks each with skip concat + upsample).

The DIFT featurizer taps the output of each up block
(``dift_sd.py:186-214``: feat dims [1280, 1280, 640, 320]).

Transformer blocks use linear projections (SD-2.x
``use_linear_projection=True``), GEGLU feed-forward, and cross-attention
over the 1024-d text context; attention heads have fixed width 64.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Sequence

import flax.linen as nn

from midvision_probe_tpu.ops.activations import gelu
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    block_out_channels: tuple = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    cross_attention_dim: int = 1024
    head_dim: int = 64
    # SD-1.x / LDM UNets (Zero123) fix the head COUNT instead of the width
    num_heads: int | None = None
    norm_groups: int = 32
    dtype: Any = jnp.float32

    @property
    def time_embed_dim(self) -> int:
        return self.block_out_channels[0] * 4


def timestep_embedding(t: jnp.ndarray, dim: int,
                       max_period: float = 10000.0) -> jnp.ndarray:
    """diffusers get_timestep_embedding (flip_sin_to_cos=True, shift=0)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


class ResnetBlock(nn.Module):
    cfg: UNetConfig
    out_ch: int

    @nn.compact
    def __call__(self, x, temb):
        c = self.cfg
        h = nn.GroupNorm(num_groups=c.norm_groups, epsilon=1e-5,
                         dtype=c.dtype, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=c.dtype, name="conv1")(h)
        t = nn.Dense(self.out_ch, dtype=c.dtype, name="time_emb_proj")(
            nn.silu(temb)
        )
        h = h + t[:, None, None, :]
        h = nn.GroupNorm(num_groups=c.norm_groups, epsilon=1e-5,
                         dtype=c.dtype, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=c.dtype, name="conv2")(h)
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), dtype=c.dtype,
                        name="conv_shortcut")(x)
        return x + h


class CrossAttention(nn.Module):
    cfg: UNetConfig
    query_dim: int
    context_dim: int | None = None  # None = self-attention

    @nn.compact
    def __call__(self, x, context=None):
        c = self.cfg
        ctx = x if context is None else context
        if c.num_heads:
            heads = c.num_heads
            head_dim = self.query_dim // heads
        else:
            heads = max(self.query_dim // c.head_dim, 1)
            head_dim = c.head_dim
        inner = heads * head_dim

        q = nn.Dense(inner, use_bias=False, dtype=c.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=c.dtype, name="to_k")(ctx)
        v = nn.Dense(inner, use_bias=False, dtype=c.dtype, name="to_v")(ctx)

        B, N, _ = q.shape
        M = k.shape[1]
        q = q.reshape(B, N, heads, head_dim).transpose(0, 2, 1, 3)
        k = k.reshape(B, M, heads, head_dim).transpose(0, 2, 1, 3)
        v = v.reshape(B, M, heads, head_dim).transpose(0, 2, 1, 3)

        scale = head_dim**-0.5
        attn = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k,
                          preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(c.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, inner)
        return nn.Dense(self.query_dim, dtype=c.dtype, name="to_out")(out)


class TransformerBlock(nn.Module):
    cfg: UNetConfig
    dim: int

    @nn.compact
    def __call__(self, x, context):
        c = self.cfg
        h = nn.LayerNorm(epsilon=1e-5, dtype=c.dtype, name="norm1")(x)
        x = x + CrossAttention(c, self.dim, None, name="attn1")(h)
        h = nn.LayerNorm(epsilon=1e-5, dtype=c.dtype, name="norm2")(x)
        x = x + CrossAttention(c, self.dim, c.cross_attention_dim,
                               name="attn2")(h, context)
        h = nn.LayerNorm(epsilon=1e-5, dtype=c.dtype, name="norm3")(x)
        # GEGLU feed-forward
        g = nn.Dense(self.dim * 8, dtype=c.dtype, name="ff_proj")(h)
        a, b = jnp.split(g, 2, axis=-1)
        h = a * gelu(b)
        x = x + nn.Dense(self.dim, dtype=c.dtype, name="ff_out")(h)
        return x


class SpatialTransformer(nn.Module):
    """Transformer2DModel with linear projections (SD-2.x)."""

    cfg: UNetConfig
    dim: int

    @nn.compact
    def __call__(self, x, context):
        c = self.cfg
        B, H, W, C = x.shape
        res = x
        h = nn.GroupNorm(num_groups=c.norm_groups, epsilon=1e-6,
                         dtype=c.dtype, name="norm")(x)
        h = h.reshape(B, H * W, C)
        h = nn.Dense(self.dim, dtype=c.dtype, name="proj_in")(h)
        h = TransformerBlock(c, self.dim, name="block")(h, context)
        h = nn.Dense(C, dtype=c.dtype, name="proj_out")(h)
        return res + h.reshape(B, H, W, C)


class UNet2DCondition(nn.Module):
    cfg: UNetConfig

    @nn.compact
    def __call__(self, latents: jnp.ndarray, t: jnp.ndarray, context:
                 jnp.ndarray, up_ft_indices: Sequence[int] = (0, 1, 2, 3)):
        """latents (B, H, W, 4); t (B,) int; context (B, 77, 1024).

        Returns {"up_ft": [taps]} — NHWC feature maps of the requested up
        blocks (``dift_sd.py`` MyUNet2DConditionModel behavior)."""
        c = self.cfg
        chans = c.block_out_channels
        n_levels = len(chans)

        temb = timestep_embedding(t, chans[0])
        temb = nn.Dense(c.time_embed_dim, dtype=c.dtype, name="time_fc1")(temb)
        temb = nn.Dense(c.time_embed_dim, dtype=c.dtype, name="time_fc2")(
            nn.silu(temb)
        )

        h = nn.Conv(chans[0], (3, 3), padding=((1, 1), (1, 1)),
                    dtype=c.dtype, name="conv_in")(latents)
        skips = [h]

        # ---- down blocks ----
        for lvl in range(n_levels):
            has_attn = lvl < n_levels - 1
            for b in range(c.layers_per_block):
                h = ResnetBlock(c, chans[lvl],
                                name=f"down_{lvl}_res_{b}")(h, temb)
                if has_attn:
                    h = SpatialTransformer(
                        c, chans[lvl], name=f"down_{lvl}_attn_{b}"
                    )(h, context)
                skips.append(h)
            if lvl < n_levels - 1:
                h = nn.Conv(chans[lvl], (3, 3), strides=(2, 2),
                            padding=((1, 1), (1, 1)), dtype=c.dtype,
                            name=f"down_{lvl}_downsample")(h)
                skips.append(h)

        # ---- mid ----
        h = ResnetBlock(c, chans[-1], name="mid_res_0")(h, temb)
        h = SpatialTransformer(c, chans[-1], name="mid_attn")(h, context)
        h = ResnetBlock(c, chans[-1], name="mid_res_1")(h, temb)

        # ---- up blocks ----
        up_ft = {}
        for i in range(n_levels):
            lvl = n_levels - 1 - i  # channel level of this up block
            has_attn = i > 0
            for b in range(c.layers_per_block + 1):
                skip = skips.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = ResnetBlock(c, chans[lvl], name=f"up_{i}_res_{b}")(h, temb)
                if has_attn:
                    h = SpatialTransformer(
                        c, chans[lvl], name=f"up_{i}_attn_{b}"
                    )(h, context)
            if i < n_levels - 1:
                # upsample to the NEXT skip's spatial size, not a blind 2x
                # (diffusers forward_upsample_size): odd grids truncate on
                # the way down — 60x80 latents reach 8x10 via 15x20, and
                # 2*(8,10) != (15,20) would crash the next concat
                B, H, W, C = h.shape
                th, tw = skips[-1].shape[1:3]
                h = jax.image.resize(h, (B, th, tw, C), "nearest")
                h = nn.Conv(chans[lvl], (3, 3), padding=((1, 1), (1, 1)),
                            dtype=c.dtype, name=f"up_{i}_upsample")(h)
            if i in up_ft_indices:
                up_ft[i] = h

        return {"up_ft": [up_ft[i] for i in sorted(up_ft)]}

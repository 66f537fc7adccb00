"""SAM image encoder (ViTDet-style windowed ViT) in Flax.

Reference wrapper: ``evals/models/sam.py`` — the segment_anything image
encoder tapped at the n/4 block schedule, bicubic pos-embed resize for
non-1024 inputs. Architecture (Kirillov et al. / ViTDet):

* 16x16 patch embed, 2D learned abs pos-embed (no cls token),
* blocks keep the (B, H, W, C) spatial layout; all but
  ``global_attn_indexes`` use 14x14 windowed attention (pad + partition),
* decomposed relative position bias from per-axis tables Rh/Rw
  (``use_rel_pos``), added as q·R terms,
* MLP with exact GELU, pre-LN.

The neck convs exist in checkpoints but the reference taps *block* outputs
(1024-d for ViT-L), so the neck is not part of the feature path.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import flax.linen as nn

from midvision_probe_tpu.ops.activations import gelu
import jax
import jax.numpy as jnp

from midvision_probe_tpu.ops.image import resize

SAM_PRESETS = {
    "vit_b": dict(width=768, depth=12, num_heads=12,
                  global_attn_indexes=(2, 5, 8, 11)),
    "vit_l": dict(width=1024, depth=24, num_heads=16,
                  global_attn_indexes=(5, 11, 17, 23)),
    "vit_h": dict(width=1280, depth=32, num_heads=16,
                  global_attn_indexes=(7, 15, 23, 31)),
}


@dataclasses.dataclass(frozen=True)
class SAMViTConfig:
    width: int = 768
    depth: int = 12
    num_heads: int = 12
    patch_size: int = 16
    window_size: int = 14
    global_attn_indexes: tuple = (2, 5, 8, 11)
    mlp_ratio: float = 4.0
    table_grid: tuple = (64, 64)  # 1024/16 canonical pos-embed grid
    layernorm_eps: float = 1e-6
    dtype: Any = jnp.float32

    @property
    def head_dim(self):
        return self.width // self.num_heads


def _get_rel_pos(q_size: int, k_size: int, rel_pos: jnp.ndarray) -> jnp.ndarray:
    """Interpolate/select the (2*max-1, hd) per-axis table to (q, k, hd)."""
    rel_pos = jnp.asarray(rel_pos)  # params may arrive as raw numpy
    max_rel_dist = 2 * max(q_size, k_size) - 1
    if rel_pos.shape[0] != max_rel_dist:
        rel_pos = resize(rel_pos[None, :, :], (1, max_rel_dist),
                         mode="bilinear")[0]
    q_coords = jnp.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = jnp.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    rel = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel_pos[rel.astype(jnp.int32)]


class SAMAttention(nn.Module):
    cfg: SAMViTConfig
    use_rel_pos: bool = True
    table_hw: tuple = (14, 14)  # static table extent (window or canonical grid)

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, C) spatial tokens."""
        c = self.cfg
        B, H, W, C = x.shape
        N = H * W
        qkv = nn.Dense(3 * C, dtype=c.dtype, name="qkv")(x.reshape(B, N, C))
        qkv = qkv.reshape(B, N, 3, c.num_heads, c.head_dim)
        q, k, v = jnp.moveaxis(qkv, 2, 0)
        q = jnp.transpose(q, (0, 2, 1, 3))  # (B, nH, N, hd)
        k = jnp.transpose(k, (0, 2, 1, 3))
        v = jnp.transpose(v, (0, 2, 1, 3))

        scale = c.head_dim**-0.5
        attn = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k,
                          preferred_element_type=jnp.float32)

        if self.use_rel_pos:
            rel_h = self.param("rel_pos_h", nn.initializers.zeros,
                               (2 * self.table_hw[0] - 1, c.head_dim),
                               jnp.float32)
            rel_w = self.param("rel_pos_w", nn.initializers.zeros,
                               (2 * self.table_hw[1] - 1, c.head_dim),
                               jnp.float32)
            Rh = _get_rel_pos(H, H, rel_h.astype(c.dtype))  # (H, H, hd)
            Rw = _get_rel_pos(W, W, rel_w.astype(c.dtype))
            r_q = q.reshape(B, c.num_heads, H, W, c.head_dim)
            bias_h = jnp.einsum("bnhwc,hkc->bnhwk", r_q, Rh)
            bias_w = jnp.einsum("bnhwc,wkc->bnhwk", r_q, Rw)
            bias = (bias_h[:, :, :, :, :, None]
                    + bias_w[:, :, :, :, None, :]).reshape(
                B, c.num_heads, N, N)
            attn = attn + bias.astype(attn.dtype)

        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(c.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(B, H, W, C)
        return nn.Dense(C, dtype=c.dtype, name="proj")(out)


def _window_partition(x, win):
    B, H, W, C = x.shape
    pad_h = (-H) % win
    pad_w = (-W) % win
    x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    Hp, Wp = H + pad_h, W + pad_w
    x = x.reshape(B, Hp // win, win, Wp // win, win, C)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(-1, win, win, C)
    return x, (Hp, Wp)


def _window_unpartition(x, win, hp_wp, hw):
    Hp, Wp = hp_wp
    H, W = hw
    B = x.shape[0] // ((Hp // win) * (Wp // win))
    x = x.reshape(B, Hp // win, Wp // win, win, win, -1)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(B, Hp, Wp, -1)
    return x[:, :H, :W]


class SAMBlock(nn.Module):
    cfg: SAMViTConfig
    window_size: int

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        shortcut = x
        h = nn.LayerNorm(epsilon=c.layernorm_eps, dtype=c.dtype, name="norm1")(x)
        if self.window_size > 0:
            hw = h.shape[1:3]
            h, hp_wp = _window_partition(h, self.window_size)
            table_hw = (self.window_size, self.window_size)
        else:
            # global blocks store tables at the canonical grid extent and
            # interpolate to the runtime grid inside _get_rel_pos
            table_hw = tuple(c.table_grid)
        h = SAMAttention(c, table_hw=table_hw, name="attn")(h)
        if self.window_size > 0:
            h = _window_unpartition(h, self.window_size, hp_wp, hw)
        x = shortcut + h
        h = nn.LayerNorm(epsilon=c.layernorm_eps, dtype=c.dtype, name="norm2")(x)
        h = nn.Dense(int(c.width * c.mlp_ratio), dtype=c.dtype, name="mlp_lin1")(h)
        h = gelu(h)
        h = nn.Dense(c.width, dtype=c.dtype, name="mlp_lin2")(h)
        return x + h


class SAMViT(nn.Module):
    cfg: SAMViTConfig

    @nn.compact
    def __call__(self, images: jnp.ndarray, taps: Sequence[int]):
        c = self.cfg
        B, H, W, _ = images.shape
        gh, gw = H // c.patch_size, W // c.patch_size
        x = nn.Conv(c.width, (c.patch_size, c.patch_size),
                    strides=(c.patch_size, c.patch_size), padding="VALID",
                    dtype=c.dtype, name="patch_embed")(images.astype(c.dtype))

        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (*c.table_grid, c.width), jnp.float32)
        if (gh, gw) != tuple(c.table_grid):
            pos = resize(pos, (gh, gw), mode="bicubic")
        x = x + pos[None].astype(c.dtype)

        taps = list(taps)
        outputs = {}
        for i in range(c.depth):
            win = 0 if i in c.global_attn_indexes else c.window_size
            x = SAMBlock(c, win, name=f"blocks_{i}")(x)
            if i in taps:
                outputs[i] = x
            if i == max(taps):
                break
        return {"maps": [outputs[i] for i in taps], "grid_hw": (gh, gw)}

"""CLIP text encoder in Flax (SD-2.1 conditioning: OpenCLIP-H text tower,
hidden 1024 / 23 layers / 16 heads, GELU, causal mask, final LayerNorm).

DIFT feeds ``text_encoder(input_ids)[0]`` (the last hidden state) as the
UNet cross-attention context (``dift_sd.py:255-262``).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn

from midvision_probe_tpu.ops.activations import gelu
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 1024
    num_layers: int = 23
    num_heads: int = 16
    max_positions: int = 77
    layernorm_eps: float = 1e-5
    act: str = "gelu"
    dtype: Any = jnp.float32


class _TextBlock(nn.Module):
    cfg: CLIPTextConfig

    @nn.compact
    def __call__(self, x, causal_mask):
        c = self.cfg
        hd = c.hidden_size // c.num_heads
        h = nn.LayerNorm(epsilon=c.layernorm_eps, dtype=c.dtype,
                         name="layer_norm1")(x)
        B, N, C = h.shape
        q = nn.Dense(C, dtype=c.dtype, name="q_proj")(h)
        k = nn.Dense(C, dtype=c.dtype, name="k_proj")(h)
        v = nn.Dense(C, dtype=c.dtype, name="v_proj")(h)
        q = q.reshape(B, N, c.num_heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(B, N, c.num_heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, N, c.num_heads, hd).transpose(0, 2, 1, 3)
        attn = jnp.einsum("bhqd,bhkd->bhqk", q * (hd**-0.5), k,
                          preferred_element_type=jnp.float32)
        attn = attn + causal_mask
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(c.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        o = o.transpose(0, 2, 1, 3).reshape(B, N, C)
        x = x + nn.Dense(C, dtype=c.dtype, name="out_proj")(o)

        h = nn.LayerNorm(epsilon=c.layernorm_eps, dtype=c.dtype,
                         name="layer_norm2")(x)
        h = nn.Dense(C * 4, dtype=c.dtype, name="fc1")(h)
        if c.act == "quickgelu":
            h = h * nn.sigmoid(1.702 * h)
        else:
            h = gelu(h)
        h = nn.Dense(C, dtype=c.dtype, name="fc2")(h)
        return x + h


class CLIPTextEncoder(nn.Module):
    cfg: CLIPTextConfig

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        """(B, 77) int token ids → (B, 77, hidden) last hidden state."""
        c = self.cfg
        tok = nn.Embed(c.vocab_size, c.hidden_size, dtype=c.dtype,
                       name="token_embedding")(input_ids)
        pos = self.param("position_embedding", nn.initializers.zeros,
                         (c.max_positions, c.hidden_size), jnp.float32)
        x = tok + pos[None, : input_ids.shape[1]].astype(c.dtype)

        N = input_ids.shape[1]
        causal = jnp.triu(jnp.full((N, N), -1e9, jnp.float32), k=1)[None, None]
        for i in range(c.num_layers):
            x = _TextBlock(c, name=f"layers_{i}")(x, causal)
        return nn.LayerNorm(epsilon=c.layernorm_eps, dtype=c.dtype,
                            name="final_layer_norm")(x)

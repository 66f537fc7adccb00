"""BEiT-v2 architecture parity: rel-pos-bias attention + q/v-only bias +
LayerScale, vs a literal torch replica of the reference's local BEiT
implementation (``impl_utils/beit_model.py`` structure)."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn

from midvision_probe_tpu.models.convert import convert_vit_timm
from midvision_probe_tpu.models.vit import ViT, ViTConfig

torch.manual_seed(3)


class _BEiTAttention(nn.Module):
    def __init__(self, dim, heads, window):
        super().__init__()
        self.heads = heads
        self.scale = (dim // heads) ** -0.5
        self.qkv = nn.Linear(dim, dim * 3, bias=False)
        self.q_bias = nn.Parameter(torch.randn(dim) * 0.02)
        self.v_bias = nn.Parameter(torch.randn(dim) * 0.02)
        self.proj = nn.Linear(dim, dim)
        h, w = window
        num_rel = (2 * h - 1) * (2 * w - 1) + 3
        self.relative_position_bias_table = nn.Parameter(
            torch.randn(num_rel, heads) * 0.02
        )
        # BEiT relative_position_index construction
        coords = torch.stack(torch.meshgrid(
            torch.arange(h), torch.arange(w), indexing="ij"))
        coords = coords.flatten(1)
        rel = coords[:, :, None] - coords[:, None, :]
        rel = rel.permute(1, 2, 0).contiguous()
        rel[:, :, 0] += h - 1
        rel[:, :, 1] += w - 1
        rel[:, :, 0] *= 2 * w - 1
        idx = torch.zeros((h * w + 1, h * w + 1), dtype=torch.long)
        idx[1:, 1:] = rel.sum(-1)
        idx[0, 0:] = num_rel - 3
        idx[0:, 0] = num_rel - 2
        idx[0, 0] = num_rel - 1
        self.register_buffer("relative_position_index", idx)

    def forward(self, x):
        B, N, C = x.shape
        bias = torch.cat([
            self.q_bias, torch.zeros_like(self.v_bias), self.v_bias
        ])
        qkv = torch.nn.functional.linear(x, self.qkv.weight, bias)
        qkv = qkv.reshape(B, N, 3, self.heads, -1).permute(2, 0, 3, 1, 4)
        q, k, v = qkv.unbind(0)
        attn = (q @ k.transpose(-2, -1)) * self.scale
        rel_bias = self.relative_position_bias_table[
            self.relative_position_index.view(-1)
        ].view(N, N, -1).permute(2, 0, 1)
        attn = attn + rel_bias.unsqueeze(0)
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(B, N, C)
        return self.proj(x)


class _BEiTBlock(nn.Module):
    def __init__(self, dim, heads, window, mlp_ratio=2.0):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = _BEiTAttention(dim, heads, window)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = nn.Sequential()
        self.mlp.fc1 = nn.Linear(dim, int(dim * mlp_ratio))
        self.mlp.fc2 = nn.Linear(int(dim * mlp_ratio), dim)
        self.gamma_1 = nn.Parameter(torch.full((dim,), 0.1))
        self.gamma_2 = nn.Parameter(torch.full((dim,), 0.1))

    def forward(self, x):
        x = x + self.gamma_1 * self.attn(self.norm1(x))
        h = self.mlp.fc2(torch.nn.functional.gelu(self.mlp.fc1(self.norm2(x))))
        return x + self.gamma_2 * h


class _BEiT(nn.Module):
    def __init__(self, dim=32, heads=2, depth=2, patch=8, img=24,
                 mlp_ratio=2.0):
        super().__init__()
        self.patch_embed = nn.Sequential()
        self.patch_embed.proj = nn.Conv2d(3, dim, patch, patch)
        self.cls_token = nn.Parameter(torch.randn(1, 1, dim) * 0.02)
        g = img // patch
        self.blocks = nn.ModuleList(
            [_BEiTBlock(dim, heads, (g, g), mlp_ratio) for _ in range(depth)]
        )

    def forward(self, x):
        B = x.shape[0]
        x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        x = torch.cat([self.cls_token.expand(B, -1, -1), x], dim=1)
        taps = []
        for blk in self.blocks:
            x = blk(x)
            taps.append(x)
        return taps


def test_beit_matches_replica(rng):
    t = _BEiT().eval()
    cfg = ViTConfig(patch_size=8, width=32, depth=2, num_heads=2,
                    mlp_ratio=2.0, pos_embed="none", rel_pos_bias=True,
                    layerscale=True)
    variables = convert_vit_timm(t.state_dict(), cfg)

    x = rng.randn(1, 3, 24, 24).astype(np.float32)
    with torch.no_grad():
        ref_taps = [r.numpy() for r in t(torch.from_numpy(x))]
    res = ViT(cfg).apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                         taps=(0, 1))
    for got, ref in zip(res["tokens"], ref_taps):
        np.testing.assert_allclose(np.asarray(got), ref, atol=3e-5, rtol=1e-3)

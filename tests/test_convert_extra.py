"""Golden parity for the open_clip and ConvNeXt converters (torch replicas)."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn

from midvision_probe_tpu.models.convert.clip_convert import convert_vit_openclip
from midvision_probe_tpu.models.convert.convnext_convert import convert_convnext
from midvision_probe_tpu.models.convnext import ConvNeXt, ConvNeXtConfig
from midvision_probe_tpu.models.vit import ViT, ViTConfig

torch.manual_seed(2)


# ------------------------------------------------------------- open_clip ---
class _QuickGELU(nn.Module):
    def forward(self, x):
        return x * torch.sigmoid(1.702 * x)


class _CLIPBlock(nn.Module):
    """open_clip ResidualAttentionBlock structure."""

    def __init__(self, d, heads):
        super().__init__()
        self.ln_1 = nn.LayerNorm(d, eps=1e-5)
        self.attn = nn.MultiheadAttention(d, heads, batch_first=True)
        self.ln_2 = nn.LayerNorm(d, eps=1e-5)
        self.mlp = nn.Sequential()
        self.mlp.c_fc = nn.Linear(d, d * 4)
        self.mlp.gelu = _QuickGELU()
        self.mlp.c_proj = nn.Linear(d * 4, d)

    def forward(self, x):
        h = self.ln_1(x)
        h, _ = self.attn(h, h, h, need_weights=False)
        x = x + h
        return x + self.mlp.c_proj(self.mlp.gelu(self.mlp.c_fc(self.ln_2(x))))


class _CLIPVisual(nn.Module):
    def __init__(self, d=64, heads=4, depth=2, patch=8, img=32):
        super().__init__()
        self.conv1 = nn.Conv2d(3, d, patch, patch, bias=False)
        n = (img // patch) ** 2
        self.class_embedding = nn.Parameter(torch.randn(d) * 0.02)
        self.positional_embedding = nn.Parameter(torch.randn(n + 1, d) * 0.02)
        self.ln_pre = nn.LayerNorm(d, eps=1e-5)
        self.transformer = nn.Module()
        self.transformer.resblocks = nn.ModuleList(
            [_CLIPBlock(d, heads) for _ in range(depth)]
        )

    def forward(self, x):
        B = x.shape[0]
        x = self.conv1(x).flatten(2).transpose(1, 2)
        cls = self.class_embedding[None, None].expand(B, 1, -1)
        x = torch.cat([cls, x], dim=1) + self.positional_embedding
        x = self.ln_pre(x)
        taps = []
        for blk in self.transformer.resblocks:
            x = blk(x)
            taps.append(x)
        return taps


def test_convert_openclip_matches_replica(rng):
    t = _CLIPVisual().eval()
    sd = {f"visual.{k}": v for k, v in t.state_dict().items()}
    cfg = ViTConfig(patch_size=8, width=64, depth=2, num_heads=4,
                    pre_norm=True, patch_bias=False, act="quickgelu",
                    layernorm_eps=1e-5)
    variables = convert_vit_openclip(sd, cfg)

    x = rng.randn(2, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        ref_taps = [r.numpy() for r in t(torch.from_numpy(x))]
    res = ViT(cfg).apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                         taps=(0, 1))
    for got, ref in zip(res["tokens"], ref_taps):
        np.testing.assert_allclose(np.asarray(got), ref, atol=3e-5, rtol=1e-3)


# -------------------------------------------------------------- ConvNeXt ---
class _TorchConvNeXtBlock(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.conv_dw = nn.Conv2d(dim, dim, 7, padding=3, groups=dim)
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = nn.Sequential()
        self.mlp.fc1 = nn.Linear(dim, dim * 4)
        self.mlp.fc2 = nn.Linear(dim * 4, dim)
        self.gamma = nn.Parameter(torch.full((dim,), 1e-6))

    def forward(self, x):
        h = self.conv_dw(x).permute(0, 2, 3, 1)
        h = self.norm(h)
        h = self.mlp.fc2(torch.nn.functional.gelu(self.mlp.fc1(h)))
        h = (self.gamma * h).permute(0, 3, 1, 2)
        return x + h


class _TorchConvNeXt(nn.Module):
    def __init__(self, depths=(1, 1), dims=(16, 32)):
        super().__init__()
        self.stem = nn.Sequential(
            nn.Conv2d(3, dims[0], 4, 4),
            nn.Identity(),  # placeholder; LN applied channel-last below
        )
        self.stem_norm = nn.LayerNorm(dims[0], eps=1e-6)
        self.stages = nn.ModuleList()
        for s, (dep, dim) in enumerate(zip(depths, dims)):
            stage = nn.Module()
            if s > 0:
                stage.downsample = nn.Sequential(
                    _ChanLN(dims[s - 1]), nn.Conv2d(dims[s - 1], dim, 2, 2)
                )
            stage.blocks = nn.ModuleList(
                [_TorchConvNeXtBlock(dim) for _ in range(dep)]
            )
            self.stages.append(stage)

    def forward(self, x):
        x = self.stem[0](x)
        x = self.stem_norm(x.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)
        taps = []
        for s, stage in enumerate(self.stages):
            if s > 0:
                x = stage.downsample(x)
            for blk in stage.blocks:
                x = blk(x)
            taps.append(x)
        return taps


class _ChanLN(nn.Module):
    """channels-first LayerNorm used in ConvNeXt downsample layers."""

    def __init__(self, dim):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(dim))
        self.bias = nn.Parameter(torch.zeros(dim))

    def forward(self, x):
        x = x.permute(0, 2, 3, 1)
        x = torch.nn.functional.layer_norm(
            x, (x.shape[-1],), self.weight, self.bias, 1e-6
        )
        return x.permute(0, 3, 1, 2)


def test_convert_convnext_matches_replica(rng):
    t = _TorchConvNeXt().eval()
    # map the replica's naming to the timm naming the converter expects
    sd = {}
    for k, v in t.state_dict().items():
        k = k.replace("stem_norm", "stem.1")
        sd[k] = v

    cfg = ConvNeXtConfig(depths=(1, 1), dims=(16, 32))
    variables = convert_convnext(sd, cfg)

    x = rng.randn(1, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        ref_taps = [r.numpy() for r in t(torch.from_numpy(x))]
    got_taps = ConvNeXt(cfg).apply(
        variables, jnp.asarray(x.transpose(0, 2, 3, 1)), taps=(0, 1)
    )
    for got, ref in zip(got_taps, ref_taps):
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 3, 1, 2), ref, atol=1e-4, rtol=1e-3
        )


def test_new_zoo_entries_registered():
    from midvision_probe_tpu.models import zoo

    for n in ["clip_vitb16", "clip_vitb16_laion", "clip_vitl14",
              "siglip_vitb16", "siglip_vitl16", "croco_vitb16",
              "crocov2_vitb16", "cnxt_b_in22k", "cnxt_b_fcmae",
              "cnxt_b_w_laion2b"]:
        assert n in zoo.ZOO, n


def test_crocov2_rope_forward(rng):
    """CroCo-v2 path: no cls, no abs pos-embed, RoPE in attention."""
    from midvision_probe_tpu.models.vit import ViT, ViTConfig

    cfg = ViTConfig(patch_size=8, width=32, depth=2, num_heads=2,
                    class_token=False, pos_embed="none", rope=True)
    import jax

    x = jnp.asarray(rng.randn(1, 32, 24, 3).astype(np.float32))
    v = ViT(cfg).init(jax.random.PRNGKey(0), x, taps=(1,))
    res = ViT(cfg).apply(v, x, taps=(1,))
    assert res["tokens"][0].shape == (1, 12, 32)
    assert res["grid_hw"] == (4, 3)

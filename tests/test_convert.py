"""Golden-activation parity tests for checkpoint conversion (SURVEY §4/§7).

Strategy: build a torch model in the *source layout* with random weights,
convert its state_dict with the library, and require my Flax forward to match
the torch forward activation-for-activation. ``transformers``' ViTModel is an
independent implementation for the HF layout; the timm/torchvision layouts
use literal replicas defined here.
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

from midvision_probe_tpu.models.convert import (
    convert_resnet50,
    convert_vit_hf,
    convert_vit_timm,
    prepare_state_dict,
)
from midvision_probe_tpu.models.resnet import ResNet50
from midvision_probe_tpu.models.vit import ViT, ViTConfig

torch.manual_seed(0)


# --------------------------------------------------------------------------
# HF layout
# --------------------------------------------------------------------------
def test_convert_vit_hf_matches_transformers(rng):
    transformers = pytest.importorskip("transformers")
    hf_cfg = transformers.ViTConfig(
        hidden_size=64,
        num_hidden_layers=4,
        num_attention_heads=4,
        intermediate_size=128,
        image_size=32,
        patch_size=16,
        layer_norm_eps=1e-6,
        hidden_act="gelu",
    )
    hf = transformers.ViTModel(hf_cfg, add_pooling_layer=False).eval()

    cfg = ViTConfig(
        patch_size=16, width=64, depth=4, num_heads=4, mlp_ratio=2.0,
        layernorm_eps=1e-6,
    )
    variables = convert_vit_hf(hf.state_dict(), cfg)

    x = rng.randn(2, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        out = hf(torch.from_numpy(x), output_hidden_states=True)
    # hidden_states[0] is the embedding output; [i+1] is block i's output
    ref_taps = [out.hidden_states[i + 1].numpy() for i in range(4)]

    model = ViT(cfg)
    res = model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                      taps=(0, 1, 2, 3))
    for got, ref in zip(res["tokens"], ref_taps):
        np.testing.assert_allclose(np.asarray(got), ref, atol=2e-5, rtol=1e-4)


# --------------------------------------------------------------------------
# timm/DINO layout — literal replica of the block structure the reference
# taps (dino.py:181-195, ibot_transformers.py)
# --------------------------------------------------------------------------
class _TimmAttention(nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.heads = heads
        self.scale = (dim // heads) ** -0.5
        self.qkv = nn.Linear(dim, dim * 3, bias=True)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x):
        B, N, C = x.shape
        qkv = self.qkv(x).reshape(B, N, 3, self.heads, C // self.heads)
        q, k, v = qkv.permute(2, 0, 3, 1, 4).unbind(0)
        attn = (q @ k.transpose(-2, -1)) * self.scale
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(B, N, C)
        return self.proj(x)


class _TimmBlock(nn.Module):
    def __init__(self, dim, heads, mlp_ratio, layerscale=False):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = _TimmAttention(dim, heads)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = nn.Sequential()
        self.mlp.fc1 = nn.Linear(dim, int(dim * mlp_ratio))
        self.mlp.act = nn.GELU()
        self.mlp.fc2 = nn.Linear(int(dim * mlp_ratio), dim)
        if layerscale:
            self.gamma_1 = nn.Parameter(1e-4 * torch.ones(dim))
            self.gamma_2 = nn.Parameter(1e-4 * torch.ones(dim))
        else:
            self.gamma_1 = self.gamma_2 = None

    def forward(self, x):
        h = self.attn(self.norm1(x))
        x = x + (h if self.gamma_1 is None else self.gamma_1 * h)
        h = self.mlp.fc2(self.mlp.act(self.mlp.fc1(self.norm2(x))))
        return x + (h if self.gamma_2 is None else self.gamma_2 * h)


class _TimmViT(nn.Module):
    def __init__(self, dim=64, depth=3, heads=4, patch=8, img=24, mlp_ratio=2.0,
                 layerscale=False):
        super().__init__()
        self.patch_embed = nn.Sequential()
        self.patch_embed.proj = nn.Conv2d(3, dim, patch, patch)
        n = (img // patch) ** 2
        self.cls_token = nn.Parameter(torch.randn(1, 1, dim) * 0.02)
        self.pos_embed = nn.Parameter(torch.randn(1, n + 1, dim) * 0.02)
        self.blocks = nn.ModuleList(
            [_TimmBlock(dim, heads, mlp_ratio, layerscale) for _ in range(depth)]
        )

    def forward(self, x):
        B = x.shape[0]
        x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        x = torch.cat([self.cls_token.expand(B, -1, -1), x], dim=1)
        x = x + self.pos_embed
        taps = []
        for blk in self.blocks:
            x = blk(x)
            taps.append(x)
        return taps


@pytest.mark.parametrize("layerscale", [False, True])
def test_convert_vit_timm_matches_replica(rng, layerscale):
    t = _TimmViT(layerscale=layerscale).eval()
    cfg = ViTConfig(
        patch_size=8, width=64, depth=3, num_heads=4, mlp_ratio=2.0,
        layerscale=layerscale,
    )
    variables = convert_vit_timm(t.state_dict(), cfg)

    x = rng.randn(2, 3, 24, 24).astype(np.float32)
    with torch.no_grad():
        ref_taps = [r.numpy() for r in t(torch.from_numpy(x))]
    res = ViT(cfg).apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                         taps=(0, 1, 2))
    for got, ref in zip(res["tokens"], ref_taps):
        np.testing.assert_allclose(np.asarray(got), ref, atol=2e-5, rtol=1e-4)


def test_convert_vit_timm_pos_embed_resize(rng):
    """Feed a different resolution: pos-embed must resize bicubic-antialias
    like the reference (utils.py:12-52) and still run."""
    t = _TimmViT().eval()
    cfg = ViTConfig(patch_size=8, width=64, depth=3, num_heads=4, mlp_ratio=2.0,
                    table_grid=(3, 3))
    variables = convert_vit_timm(t.state_dict(), cfg)
    x = rng.randn(1, 40, 32, 3).astype(np.float32)
    res = ViT(cfg).apply(variables, jnp.asarray(x), taps=(2,))
    assert res["tokens"][0].shape == (1, 1 + 5 * 4, 64)
    assert res["grid_hw"] == (5, 4)


# --------------------------------------------------------------------------
# torchvision ResNet-50 layout — literal replica
# --------------------------------------------------------------------------
class _TorchBottleneck(nn.Module):
    def __init__(self, cin, width, stride=1, downsample=False):
        super().__init__()
        cout = width * 4
        self.conv1 = nn.Conv2d(cin, width, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.conv2 = nn.Conv2d(width, width, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(width)
        self.conv3 = nn.Conv2d(width, cout, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(cout)
        self.relu = nn.ReLU()
        self.downsample = (
            nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False), nn.BatchNorm2d(cout)
            )
            if downsample
            else None
        )

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        h = self.relu(self.bn1(self.conv1(x)))
        h = self.relu(self.bn2(self.conv2(h)))
        h = self.bn3(self.conv3(h))
        return self.relu(h + idt)


class _TorchResNet50(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU()
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        cin, width = 64, 64
        for s, blocks in enumerate([3, 4, 6, 3]):
            layers = []
            for b in range(blocks):
                stride = 2 if (s > 0 and b == 0) else 1
                layers.append(
                    _TorchBottleneck(cin, width, stride, downsample=(b == 0))
                )
                cin = width * 4
            setattr(self, f"layer{s + 1}", nn.Sequential(*layers))
            width *= 2

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        taps = [x]
        for s in range(4):
            x = getattr(self, f"layer{s + 1}")(x)
            taps.append(x)
        return taps


def test_convert_resnet50_matches_replica(rng):
    t = _TorchResNet50()
    # randomize running stats so conversion of batch_stats is exercised
    for m in t.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.5)
            m.running_var.uniform_(0.5, 2.0)
    t.eval()

    variables = convert_resnet50(t.state_dict())
    x = rng.randn(2, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        ref_taps = [r.numpy() for r in t(torch.from_numpy(x))]
    got_taps = ResNet50().apply(
        variables, jnp.asarray(x.transpose(0, 2, 3, 1)), taps=(0, 1, 2, 3, 4)
    )
    for got, ref in zip(got_taps, ref_taps):
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 3, 1, 2), ref, atol=1e-4, rtol=1e-3
        )


def test_prepare_state_dict_vissl_style():
    sd = {
        "_feature_blocks.conv1.weight": 1,
        "_feature_blocks.bn1.weight": 2,
        "projection_head.0.weight": 3,
    }
    out = prepare_state_dict(
        sd, remove_prefix="_feature_blocks.",
        delete_prefixes=("projection_head.", "prototypes."),
    )
    assert set(out) == {"conv1.weight", "bn1.weight"}


def test_math_sanity():
    assert math.isclose((64 // 4) ** -0.5, 0.25)

"""Full-size torch replica models + genuine source-layout fabricators.

Round-1 parity tests proved the converters against *small* torch replicas
built inside the test files. This module provides the same replicas at full
checkpoint scale, plus fabricators that wrap a trunk state_dict in each
source's **genuine packaging convention** (VISSL classy_state_dict,
MoCo ``module.encoder_q.``, MoCo-v3 base/momentum/predictor triple,
MMSelfSup ``backbone.`` + mmcls naming, HF ``vit.`` ViTMAE layout, NAVER
CroCo ``model.enc_blocks``) so `unwrap_checkpoint` + the converters are
exercised against real on-disk layouts, not in-test dicts.

Layout citations into /root/reference:
  VISSL      evals/models/simclr.py:17-24
  mocov2     evals/models/mocov2.py:17-19
  mocov3     evals/models/mocov3.py:70-80
  mmselfsup  evals/models/eva.py:15-24 (rename dict implies source naming
             ``layers.N.ln1 / ffn.layers.0.0 / patch_embed.projection``)
  HF MAE     evals/models/mae.py:33 (facebook/vit-mae-base, ``vit.`` prefix)
  CroCo      evals/models/croco.py:9-14 ({'model': {enc_blocks...}})

Torch here is CPU-only and used strictly as the conversion oracle.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn as nn

# --------------------------------------------------------------------------
# full-size timm-naming ViT replica (structure: dino.py:164-210,
# ibot_transformers.py blocks)
# --------------------------------------------------------------------------


class TimmAttention(nn.Module):
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
        attn = ((q @ k.transpose(-2, -1)) * self.scale).softmax(dim=-1)
        return self.proj((attn @ v).transpose(1, 2).reshape(B, N, C))


class _LSGamma(nn.Module):
    """DINOv2 LayerScale submodule naming (``blocks.N.ls1.gamma``)."""

    def __init__(self, dim, init=1e-4):
        super().__init__()
        self.gamma = nn.Parameter(init * torch.ones(dim))


class TimmBlock(nn.Module):
    def __init__(self, dim, heads, mlp_ratio, layerscale=False, eps=1e-6,
                 ls_naming="gamma", act="gelu"):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=eps)
        self.attn = TimmAttention(dim, heads)
        self.norm2 = nn.LayerNorm(dim, eps=eps)
        self.mlp = nn.Sequential()
        self.mlp.fc1 = nn.Linear(dim, int(dim * mlp_ratio))
        # SigLIP trains in big_vision with JAX's default tanh-approx gelu
        self.mlp.act = nn.GELU(approximate="tanh" if act == "gelu_tanh"
                               else "none")
        self.mlp.fc2 = nn.Linear(int(dim * mlp_ratio), dim)
        self._ls = None
        if layerscale and ls_naming == "ls":
            self.ls1 = _LSGamma(dim)
            self.ls2 = _LSGamma(dim)
            self._ls = "ls"
        elif layerscale:
            self.gamma_1 = nn.Parameter(1e-4 * torch.ones(dim))
            self.gamma_2 = nn.Parameter(1e-4 * torch.ones(dim))
            self._ls = "gamma"

    def _g(self, which):
        if self._ls == "ls":
            return (self.ls1 if which == 1 else self.ls2).gamma
        if self._ls == "gamma":
            return self.gamma_1 if which == 1 else self.gamma_2
        return None

    def forward(self, x):
        h = self.attn(self.norm1(x))
        g1 = self._g(1)
        x = x + (h if g1 is None else g1 * h)
        h = self.mlp.fc2(self.mlp.act(self.mlp.fc1(self.norm2(x))))
        g2 = self._g(2)
        return x + (h if g2 is None else g2 * h)


class TimmViT(nn.Module):
    """timm/DINO-naming ViT; forward returns per-block token taps."""

    def __init__(self, dim=768, depth=12, heads=12, patch=16, grid=14,
                 mlp_ratio=4.0, layerscale=False, class_token=True,
                 final_norm=True, eps=1e-6, seed=0, ls_naming="gamma",
                 act="gelu"):
        super().__init__()
        torch.manual_seed(seed)
        self.patch_embed = nn.Sequential()
        self.patch_embed.proj = nn.Conv2d(3, dim, patch, patch)
        n = grid * grid + (1 if class_token else 0)
        if class_token:
            self.cls_token = nn.Parameter(torch.zeros(1, 1, dim))
        self.pos_embed = nn.Parameter(torch.zeros(1, n, dim))
        self.blocks = nn.ModuleList(
            [TimmBlock(dim, heads, mlp_ratio, layerscale, eps, ls_naming, act)
             for _ in range(depth)]
        )
        if final_norm:
            self.norm = nn.LayerNorm(dim, eps=eps)
        self._class_token = class_token
        self._init_realistic()

    def _init_realistic(self):
        """trunc-normal(0.02) like real ViT checkpoints, so a depth-12
        random forward stays numerically tame for golden comparisons."""
        for m in self.modules():
            if isinstance(m, (nn.Linear, nn.Conv2d)):
                nn.init.trunc_normal_(m.weight, std=0.02)
                if m.bias is not None:
                    nn.init.zeros_(m.bias)
        nn.init.trunc_normal_(self.pos_embed, std=0.02)
        if self._class_token:
            nn.init.trunc_normal_(self.cls_token, std=0.02)

    def forward(self, x):
        B = x.shape[0]
        x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        if self._class_token:
            x = torch.cat([self.cls_token.expand(B, -1, -1), x], dim=1)
        x = x + self.pos_embed
        taps = []
        for blk in self.blocks:
            x = blk(x)
            taps.append(x)
        return taps


# --------------------------------------------------------------------------
# full torchvision-naming ResNet-50 replica (simclr.py:53-66 trunk)
# --------------------------------------------------------------------------


class TorchBottleneck(nn.Module):
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
            nn.Sequential(nn.Conv2d(cin, cout, 1, stride, bias=False),
                          nn.BatchNorm2d(cout))
            if downsample else None
        )

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        h = self.relu(self.bn1(self.conv1(x)))
        h = self.relu(self.bn2(self.conv2(h)))
        h = self.bn3(self.conv3(h))
        return self.relu(h + idt)


class TorchResNet50(nn.Module):
    def __init__(self, seed=0):
        super().__init__()
        torch.manual_seed(seed)
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
                    TorchBottleneck(cin, width, stride, downsample=(b == 0)))
                cin = width * 4
            setattr(self, f"layer{s + 1}", nn.Sequential(*layers))
            width *= 2
        # realistic running stats so batch_stats conversion is non-trivial
        for m in self.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 2.0)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        taps = [x]
        for s in range(4):
            x = getattr(self, f"layer{s + 1}")(x)
            taps.append(x)
        return taps


# --------------------------------------------------------------------------
# source-layout fabricators (trunk sd -> genuine on-disk packaging)
# --------------------------------------------------------------------------


def _junk(*shape):
    return torch.zeros(*shape)


def wrap_vissl(trunk_sd: dict) -> dict:
    """VISSL .torch layout (simclr.py:17-24): classy_state_dict nesting,
    ``_feature_blocks.`` trunk prefix, heads stored separately."""
    trunk = {f"_feature_blocks.{k}": v for k, v in trunk_sd.items()}
    return {
        "phase_idx": 999,
        "iteration": 1000,
        "classy_state_dict": {
            "train": True,
            "base_model": {
                "model": {
                    "trunk": trunk,
                    "heads": {
                        "0.clf.0.weight": _junk(128, 2048),
                        "0.clf.0.bias": _junk(128),
                    },
                },
            },
        },
    }


def wrap_mocov2(trunk_sd: dict) -> dict:
    """MoCo v2 .pth.tar (mocov2.py:17-19): ``module.encoder_q.`` prefix and
    an MLP fc head that the default delete_prefixes must drop."""
    sd = {f"module.encoder_q.{k}": v for k, v in trunk_sd.items()}
    sd["module.encoder_q.fc.0.weight"] = _junk(2048, 2048)
    sd["module.encoder_q.fc.0.bias"] = _junk(2048)
    sd["module.encoder_q.fc.2.weight"] = _junk(128, 2048)
    sd["module.encoder_q.fc.2.bias"] = _junk(128)
    for k, v in list(trunk_sd.items())[:4]:  # partial key encoder, genuine
        sd[f"module.encoder_k.{k}"] = v.clone()
    return {"epoch": 800, "arch": "resnet50", "state_dict": sd}


def wrap_mocov3_vit(trunk_sd: dict) -> dict:
    """MoCo v3 ViT .pth.tar (mocov3.py:70-80): base_encoder + momentum_encoder
    + predictor under ``module.``, mlp heads on both encoders."""
    sd = {}
    for k, v in trunk_sd.items():
        sd[f"module.base_encoder.{k}"] = v
        sd[f"module.momentum_encoder.{k}"] = v.clone()
    for enc in ("base_encoder", "momentum_encoder"):
        sd[f"module.{enc}.head.0.weight"] = _junk(4096, 768)
        sd[f"module.{enc}.head.0.bias"] = _junk(4096)
        sd[f"module.{enc}.head.2.weight"] = _junk(256, 4096)
    sd["module.predictor.0.weight"] = _junk(4096, 256)
    sd["module.predictor.2.weight"] = _junk(256, 4096)
    return {"epoch": 300, "state_dict": sd}


def timm_to_mmselfsup(trunk_sd: dict) -> dict:
    """timm naming -> mmselfsup/mmcls source naming (the inverse of the
    reference rename dict, eva.py:15-24): ``blocks.N`` -> ``layers.N``,
    ``norm1/norm2`` -> ``ln1/ln2``, ``mlp.fc1`` -> ``ffn.layers.0.0``,
    ``mlp.fc2`` -> ``ffn.layers.1``, ``patch_embed.proj`` ->
    ``patch_embed.projection``, final ``norm`` -> ``ln1``; all under
    ``backbone.`` in a ``state_dict`` container."""
    out = {}
    for k, v in trunk_sd.items():
        nk = k
        if nk.startswith("blocks."):
            nk = "layers." + nk[len("blocks."):]
            nk = nk.replace(".norm1.", ".ln1.").replace(".norm2.", ".ln2.")
            nk = nk.replace(".mlp.fc1.", ".ffn.layers.0.0.")
            nk = nk.replace(".mlp.fc2.", ".ffn.layers.1.")
        elif nk.startswith("norm."):
            nk = "ln1." + nk[len("norm."):]
        nk = nk.replace("patch_embed.proj.", "patch_embed.projection.")
        out[f"backbone.{nk}"] = v
    out["neck.decoder_embed.weight"] = _junk(512, 768)  # mae-style neck junk
    return {"meta": {"mmselfsup_version": "1.0.0"}, "state_dict": out}


def timm_to_hf_mae(trunk_sd: dict) -> dict:
    """timm naming -> HF facebook/vit-mae-base pytorch_model.bin layout
    (``vit.`` prefix, split q/k/v, ViTMAE decoder junk; mae.py:33)."""
    D = trunk_sd["cls_token"].shape[-1]
    out = {
        "vit.embeddings.cls_token": trunk_sd["cls_token"],
        "vit.embeddings.position_embeddings": trunk_sd["pos_embed"],
        "vit.embeddings.patch_embeddings.projection.weight":
            trunk_sd["patch_embed.proj.weight"],
        "vit.embeddings.patch_embeddings.projection.bias":
            trunk_sd["patch_embed.proj.bias"],
        "vit.layernorm.weight": trunk_sd["norm.weight"],
        "vit.layernorm.bias": trunk_sd["norm.bias"],
        # ViTMAE decoder junk that prefix filtering must ignore
        "decoder.mask_token": _junk(1, 1, 512),
        "decoder.decoder_embed.weight": _junk(512, D),
    }
    i = 0
    while f"blocks.{i}.norm1.weight" in trunk_sd:
        b, h = f"blocks.{i}", f"vit.encoder.layer.{i}"
        qkv_w, qkv_b = trunk_sd[f"{b}.attn.qkv.weight"], trunk_sd[
            f"{b}.attn.qkv.bias"]
        for j, part in enumerate(("query", "key", "value")):
            out[f"{h}.attention.attention.{part}.weight"] = (
                qkv_w[j * D:(j + 1) * D])
            out[f"{h}.attention.attention.{part}.bias"] = (
                qkv_b[j * D:(j + 1) * D])
        out[f"{h}.attention.output.dense.weight"] = trunk_sd[
            f"{b}.attn.proj.weight"]
        out[f"{h}.attention.output.dense.bias"] = trunk_sd[
            f"{b}.attn.proj.bias"]
        out[f"{h}.intermediate.dense.weight"] = trunk_sd[f"{b}.mlp.fc1.weight"]
        out[f"{h}.intermediate.dense.bias"] = trunk_sd[f"{b}.mlp.fc1.bias"]
        out[f"{h}.output.dense.weight"] = trunk_sd[f"{b}.mlp.fc2.weight"]
        out[f"{h}.output.dense.bias"] = trunk_sd[f"{b}.mlp.fc2.bias"]
        out[f"{h}.layernorm_before.weight"] = trunk_sd[f"{b}.norm1.weight"]
        out[f"{h}.layernorm_before.bias"] = trunk_sd[f"{b}.norm1.bias"]
        out[f"{h}.layernorm_after.weight"] = trunk_sd[f"{b}.norm2.weight"]
        out[f"{h}.layernorm_after.bias"] = trunk_sd[f"{b}.norm2.bias"]
        i += 1
    return out


def wrap_croco(trunk_sd: dict) -> dict:
    """NAVER CroCo checkpoint ({'model': {enc_blocks.N..., enc_norm, dec_*}};
    croco.py:9-14, convert/remap.py croco branch)."""
    sd = {}
    for k, v in trunk_sd.items():
        if k.startswith("blocks."):
            sd["enc_blocks." + k[len("blocks."):]] = v
        elif k.startswith("norm."):
            sd["enc_norm." + k[len("norm."):]] = v
        elif k.startswith("pos_embed"):
            continue  # CroCo regenerates sincos at runtime; not stored
        else:
            sd[k] = v
    sd["mask_token"] = _junk(1, 1, 512)
    sd["decoder_embed.weight"] = _junk(512, 768)
    sd["dec_blocks.0.norm1.weight"] = _junk(512)
    sd["prediction_head.weight"] = _junk(768, 512)
    return {"model": sd, "args": {"arch": "crocov1"}}


def sincos2d_pos_embed(dim: int, grid: int, cls_row: bool) -> torch.Tensor:
    """MAE-style fixed 2D sin-cos table (mae.py:74-89 regenerates this);
    generated by this repo's implementation so fabricated MAE/CroCo
    checkpoints carry the table real files store."""
    from midvision_probe_tpu.models.vit import get_2d_sincos_pos_embed

    tab = get_2d_sincos_pos_embed(dim, (grid, grid), add_cls_token=cls_row)
    return torch.from_numpy(np.asarray(tab, np.float32)).unsqueeze(0)


# --------------------------------------------------------------------------
# RADIO trunk replica (radio.py:84-115 semantics: CPE patch generator,
# patch-only pos embed, per-tap final norm)
# --------------------------------------------------------------------------


class RadioViT(nn.Module):
    def __init__(self, dim=1280, depth=32, heads=16, patch=16, grid=16,
                 mlp_ratio=4.0, seed=0):
        super().__init__()
        torch.manual_seed(seed)
        self.patch_generator = nn.Module()
        self.patch_generator.embedder = nn.Linear(3 * patch * patch, dim)
        self.patch_generator.pos_embed = nn.Parameter(
            torch.zeros(1, grid * grid, dim))
        self.patch_generator.cls_token = nn.Module()
        self.patch_generator.cls_token.token = nn.Parameter(
            torch.zeros(1, 1, dim))
        self.blocks = nn.ModuleList(
            [TimmBlock(dim, heads, mlp_ratio) for _ in range(depth)])
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self._patch = patch
        for m in self.modules():
            if isinstance(m, nn.Linear):
                nn.init.trunc_normal_(m.weight, std=0.02)
                if m.bias is not None:
                    nn.init.zeros_(m.bias)
        nn.init.trunc_normal_(self.patch_generator.pos_embed, std=0.02)
        nn.init.trunc_normal_(self.patch_generator.cls_token.token, std=0.02)

    def forward(self, x):
        B, _, H, W = x.shape
        p = self._patch
        # RADIO flattens patches (ph, pw, c): b c (h p1) (w p2) -> b (h w) (p1 p2 c)
        x = x.unfold(2, p, p).unfold(3, p, p)        # B C gh gw p p
        x = x.permute(0, 2, 3, 4, 5, 1).reshape(B, -1, p * p * 3)
        x = self.patch_generator.embedder(x)
        x = x + self.patch_generator.pos_embed       # patches only
        cls = self.patch_generator.cls_token.token.expand(B, -1, -1)
        x = torch.cat([cls, x], dim=1)               # no pos on cls
        taps = []
        for blk in self.blocks:
            x = blk(x)
            taps.append(self.norm(x))                # radio.py:92-95
        return taps


def wrap_radio(trunk_sd: dict, mean=(0.48145466, 0.4578275, 0.40821073),
               std=(0.26862954, 0.26130258, 0.27577711)) -> dict:
    """torch.hub radio checkpoint: trunk under ``base_model.model.``, the
    input conditioner beside it, inside a ``state_dict`` container."""
    sd = {f"base_model.model.{k}": v for k, v in trunk_sd.items()}
    sd["base_model.input_conditioner.norm_mean"] = torch.tensor(mean).view(
        1, 3, 1, 1)
    sd["base_model.input_conditioner.norm_std"] = torch.tensor(std).view(
        1, 3, 1, 1)
    sd["base_model.summary_idxs"] = torch.tensor([0])
    return {"state_dict": sd, "epoch": 0}

#!/usr/bin/env python
"""Fabricate genuine source-layout checkpoint files for conversion testing.

This environment has zero egress, so the real pretrained weights cannot be
downloaded; what CAN be validated end-to-end is the entire checkpoint
plumbing — on-disk packaging -> ``unwrap_checkpoint`` -> converter -> Flax
forward — against files whose **layout byte-for-byte matches the real
sources** (container nesting, key naming, head/decoder junk that must be
dropped). Weights are deterministic trunc-normal; golden activations come
from independent torch forwards (``export_golden.py``).

One file per ``unwrap_checkpoint`` branch (convert/remap.py:60-114):
  raw         dino_vitb16.pth          flat timm naming (hub layout)
  state_dict  ibot_vitb16.pth          {'state_dict': timm} container
  vissl       simclr_resnet50.torch    classy_state_dict nesting
  mocov2      mocov2_resnet50.pth.tar  module.encoder_q. prefix + fc head
  mocov3      mocov3_vitb16.pth.tar    base/momentum/predictor triple
  mmselfsup   eva_vitb16.pth           backbone. prefix + mmcls naming
  hf          mae_vitb16.bin           vit. prefix, split q/k/v, sincos pos
  croco       CroCo.pth                {'model': {enc_blocks...}} + decoder

Usage:
    MVP_CHECKPOINT_DIR=checkpoints python data_processing/make_source_layout_checkpoints.py
"""

from __future__ import annotations

import os
import sys

import torch

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from torch_replicas import (  # noqa: E402
    RadioViT,
    TimmViT,
    TorchResNet50,
    wrap_radio,
    sincos2d_pos_embed,
    timm_to_hf_mae,
    timm_to_mmselfsup,
    wrap_croco,
    wrap_mocov2,
    wrap_mocov3_vit,
    wrap_vissl,
)


def _vitb(seed, **kw):
    return TimmViT(dim=768, depth=12, heads=12, patch=16, grid=14,
                   seed=seed, **kw).state_dict()


def _beit_vitb(seed):
    """Full BEiT-v2 trunk (q/v-only bias, per-block rel-pos tables,
    LayerScale) via the tests replica, init-scaled for golden stability."""
    import sys as _sys

    _sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "..", "tests"))
    from test_beit import _BEiT

    torch.manual_seed(seed)
    t = _BEiT(dim=768, heads=12, depth=12, patch=16, img=224, mlp_ratio=4.0)
    for m in t.modules():
        if isinstance(m, (torch.nn.Linear, torch.nn.Conv2d)):
            torch.nn.init.trunc_normal_(m.weight, std=0.02)
            if m.bias is not None:
                torch.nn.init.zeros_(m.bias)
    return t.state_dict()


def _beit_large_midas(seed):
    """MiDaS dpt_beit_large_384: flat sd with pretrained.model.* trunk
    (BEiT-L, rel-pos, LayerScale) + scratch.* DPT-head junk
    (midas_final.py:83-87; zoo prefix='pretrained.model.')."""
    import sys as _sys

    _sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "..", "tests"))
    from test_beit import _BEiT

    torch.manual_seed(seed)
    t = _BEiT(dim=1024, heads=16, depth=24, patch=16, img=384, mlp_ratio=4.0)
    for m in t.modules():
        if isinstance(m, (torch.nn.Linear, torch.nn.Conv2d)):
            torch.nn.init.trunc_normal_(m.weight, std=0.02)
            if m.bias is not None:
                torch.nn.init.zeros_(m.bias)
    sd = {f"pretrained.model.{k}": v for k, v in t.state_dict().items()}
    sd["scratch.layer1_rn.weight"] = torch.zeros(256, 1024, 3, 3)
    sd["scratch.output_conv.0.weight"] = torch.zeros(128, 256, 3, 3)
    return sd


def _sam_vit_b(seed):
    """segment_anything sam_vit_b_01ec64.pth: flat sd with image_encoder.*
    (windowed ViTDet naming) + prompt_encoder/mask_decoder junk."""
    import transformers

    torch.manual_seed(seed)
    hf_cfg = transformers.SamVisionConfig(
        hidden_size=768, num_hidden_layers=12, num_attention_heads=12,
        image_size=1024, patch_size=16, window_size=14,
        global_attn_indexes=[2, 5, 8, 11], mlp_dim=3072,
    )
    hf = transformers.SamVisionModel(hf_cfg)
    for m in hf.modules():
        if isinstance(m, (torch.nn.Linear, torch.nn.Conv2d)):
            torch.nn.init.trunc_normal_(m.weight, std=0.02)
            if m.bias is not None:
                torch.nn.init.zeros_(m.bias)
    sd = {}
    for k, v in hf.state_dict().items():
        k = k.replace("vision_encoder.", "image_encoder.")
        k = k.replace("layers.", "blocks.")
        k = k.replace("layer_norm1", "norm1").replace("layer_norm2", "norm2")
        k = k.replace("patch_embed.projection", "patch_embed.proj")
        sd[k] = v
    sd["prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"] = (
        torch.zeros(2, 128))
    sd["mask_decoder.iou_token.weight"] = torch.zeros(1, 256)
    return sd


def _convnext_b(seed):
    """timm convnext_base_in22k: flat timm naming (stem.0 conv + stem.1 LN,
    stages.N.downsample/blocks)."""
    import sys as _sys

    _sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "..", "tests"))
    from test_convert_extra import _TorchConvNeXt

    torch.manual_seed(seed)
    t = _TorchConvNeXt(depths=(3, 3, 27, 3), dims=(128, 256, 512, 1024))
    for m in t.modules():
        if isinstance(m, (torch.nn.Linear, torch.nn.Conv2d)):
            torch.nn.init.trunc_normal_(m.weight, std=0.02)
            if m.bias is not None:
                torch.nn.init.zeros_(m.bias)
    sd = {}
    for k, v in t.state_dict().items():
        sd[k.replace("stem_norm", "stem.1")] = v
    sd["head.fc.weight"] = torch.zeros(21841, 1024)  # in22k classifier junk
    return sd


def _clip_visual(seed):
    """OpenAI CLIP .pt layout: ``visual.*`` open_clip naming + text-tower
    junk the converter's prefix filter must skip."""
    import sys as _sys

    _sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "..", "tests"))
    from test_convert_extra import _CLIPVisual

    torch.manual_seed(seed)
    t = _CLIPVisual(d=768, heads=12, depth=12, patch=16, img=224)
    for m in t.modules():
        if isinstance(m, (torch.nn.Linear, torch.nn.Conv2d)):
            torch.nn.init.trunc_normal_(m.weight, std=0.02)
            if getattr(m, "bias", None) is not None:
                torch.nn.init.zeros_(m.bias)
    sd = {f"visual.{k}": v for k, v in t.state_dict().items()}
    sd["visual.ln_post.weight"] = torch.ones(768)
    sd["visual.ln_post.bias"] = torch.zeros(768)
    sd["visual.proj"] = torch.randn(768, 512) * 0.02
    sd["token_embedding.weight"] = torch.zeros(49408, 512)  # text junk
    sd["transformer.resblocks.0.ln_1.weight"] = torch.ones(512)
    sd["logit_scale"] = torch.tensor(4.6052)
    return sd


def build_all() -> dict[str, object]:
    """filename -> torch-saveable object, all layouts genuine."""
    out = {}

    # raw flat timm (facebookresearch/dino hub file stores the plain sd)
    out["dino_vitb16.pth"] = _vitb(seed=1)

    # DINOv2 hub file: flat timm + ls1/ls2.gamma LayerScale naming, patch 14
    out["dinov2_vitb14.pth"] = TimmViT(
        dim=768, depth=12, heads=12, patch=14, grid=37, layerscale=True,
        ls_naming="ls", seed=20).state_dict()

    # DeiT-III hub file: {'model': ...} with gamma_1/2 LayerScale, 384px
    out["deit_3_base_384_21k.pth"] = {
        "model": TimmViT(dim=768, depth=12, heads=12, patch=16, grid=24,
                         layerscale=True, seed=22).state_dict()}

    # MILAN gdrive file: {'model': plain timm}
    out["milan_vitb16.pth"] = {"model": _vitb(seed=23)}

    # BEiT-v2 gdrive file: {'model': q/v-bias + rel-pos + LayerScale trunk}
    out["beitv2_vitb16.pth"] = {"model": _beit_vitb(seed=24)}

    # open_clip .pt: raw visual.* + text junk
    out["clip_vitb16_openai.pt"] = _clip_visual(seed=26)

    # timm SigLIP: flat, no class token, 384px
    out["siglip_vitb16_384.bin"] = TimmViT(
        dim=768, depth=12, heads=12, patch=16, grid=24, class_token=False,
        seed=27).state_dict()

    # {'state_dict': ...} container with module. prefixes (bytedance iBOT
    # checkpoint_teacher.pth; ibot.py:55-56 strips them)
    sd = {f"module.{k}": v for k, v in _vitb(seed=2).items()}
    sd["module.head.mlp.0.weight"] = torch.zeros(2048, 768)  # head junk
    out["ibot_vitb16.pth"] = {"state_dict": sd, "epoch": 1000}

    # MoCo v3 ViT triple-encoder container
    out["mocov3_vitb16.pth.tar"] = wrap_mocov3_vit(_vitb(seed=3))

    # mmselfsup (EVA) — mmcls naming under backbone.
    out["eva_vitb16.pth"] = timm_to_mmselfsup(_vitb(seed=4))

    # HF ViTMAE — vit. prefix, split qkv, stored sincos pos table
    mae_sd = _vitb(seed=5, eps=1e-12)
    mae_sd["pos_embed"] = sincos2d_pos_embed(768, 14, cls_row=True)
    out["mae_vitb16.bin"] = timm_to_hf_mae(mae_sd)

    # NAVER CroCo v1 — enc_blocks/enc_norm under 'model', no cls token,
    # runtime sincos pos embed (not stored)
    out["CroCo.pth"] = wrap_croco(_vitb(seed=6, class_token=False))

    # NVIDIA RADIO v2 — ViT-H/16 trunk with CPE patch generator + input
    # conditioner under base_model. (radio.py:35, torch.hub layout)
    out["radio_v2.pth.tar"] = wrap_radio(
        RadioViT(dim=1280, depth=32, heads=16, patch=16, grid=16,
                 seed=9).state_dict())

    # MiDaS DPT-BEiT-L/16-384, SAM ViT-B, ConvNeXt-B (timm)
    out["dpt_beit_large_384.pt"] = _beit_large_midas(seed=28)
    out["sam_vit_b_01ec64.pth"] = _sam_vit_b(seed=29)
    out["convnext_base_in22k.pth"] = _convnext_b(seed=30)

    # VISSL .torch (SimCLR) + MoCo v2 containers around a torchvision R50
    out["simclr_resnet50.torch"] = wrap_vissl(TorchResNet50(seed=7).state_dict())
    out["mocov2_resnet50.pth.tar"] = wrap_mocov2(
        TorchResNet50(seed=8).state_dict())
    return out


def main():
    ckpt_dir = os.environ.get("MVP_CHECKPOINT_DIR", "checkpoints")
    os.makedirs(ckpt_dir, exist_ok=True)
    for fname, obj in build_all().items():
        path = os.path.join(ckpt_dir, fname)
        torch.save(obj, path)
        print(f"[fabricated] {path} ({os.path.getsize(path) / 1e6:.0f} MB)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

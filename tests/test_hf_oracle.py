"""Independent-oracle parity: Flax models vs GENUINE HuggingFace
``transformers`` implementations (random-init, eval mode, float32).

The golden-layout tests (`test_source_layouts.py`, `export_golden.py`)
compare against `data_processing/torch_replicas.py`, which was written by
the same author as the Flax side — a shared misreading of, e.g., BEiT's
relative-position indexing would pass every one of them (round-2 verdict,
"What's weak" #5). Here the torch side is upstream HF code: independent
implementations of the same published architectures the reference wraps
(`evals/models/{beit_v2,dino,sam,clip,siglip,convnext}.py`). Where the
genuine released checkpoint layout is not HF-shaped, the HF state_dict is
remapped to the released layout first, so the REAL converter entry point is
exercised as well.

Each oracle covers the architecture feature most at risk of a shared
misreading:

* BEiT      — relative-position-bias table indexing + q/v-only bias
* DINOv2    — register-token insertion order + LayerScale
* SAM       — decomposed rel-pos (Rh/Rw) + windowed attention partition
* CLIP      — quickgelu + pre-LN + bias-free patch embed
* SigLIP    — tanh-approx GELU (big_vision JAX default), no cls token
* ConvNeXt2 — GRN (global response norm) in place of LayerScale
* ResNet-50 — the v1.5 bottleneck trunk behind the 17-model SSL zoo
* MAE       — generated 2D sin-cos position embedding (not converted)
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

transformers = pytest.importorskip("transformers")

from midvision_probe_tpu.models.convert import convert_vit_timm  # noqa: E402
from midvision_probe_tpu.models.convert.clip_convert import (  # noqa: E402
    convert_vit_openclip,
)
from midvision_probe_tpu.models.convert.convnext_convert import (  # noqa: E402
    convert_convnext,
)
from midvision_probe_tpu.models.convert.sam_convert import convert_sam  # noqa: E402
from midvision_probe_tpu.models.convnext import ConvNeXt, ConvNeXtConfig  # noqa: E402
from midvision_probe_tpu.models.vit import ViT, ViTConfig  # noqa: E402
from midvision_probe_tpu.models.vit_sam import SAMViT, SAMViTConfig  # noqa: E402

torch.manual_seed(11)


def _randomize(model):
    """HF zero-inits cls/pos/LayerScale params; give every param a real
    value so a wrong wiring cannot hide behind a zero tensor."""
    g = torch.Generator().manual_seed(5)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(0.02 * torch.randn(p.shape, generator=g))
    return model.eval()


def _assert_close(got, ref, atol=3e-5, rtol=1e-4):
    np.testing.assert_allclose(np.asarray(got), ref, atol=atol, rtol=rtol)


# --------------------------------------------------------------------------
# BEiT: per-layer relative position bias (beit_v2.py via impl_utils/
# beit_model.py), LayerScale, bias on q/v only
# --------------------------------------------------------------------------
def test_beit_rel_pos_matches_hf(rng):
    D, L, H, P, IMG = 32, 2, 2, 16, 48  # 3x3 patch grid
    hf = _randomize(transformers.BeitModel(transformers.BeitConfig(
        hidden_size=D, num_hidden_layers=L, num_attention_heads=H,
        intermediate_size=2 * D, image_size=IMG, patch_size=P,
        use_relative_position_bias=True, layer_scale_init_value=0.1,
        use_absolute_position_embeddings=False, use_mask_token=False,
        layer_norm_eps=1e-6, hidden_act="gelu",
    ), add_pooling_layer=False))

    # HF naming -> the released BEiT-v2 trunk naming convert_vit_timm parses
    sd, hsd = {}, hf.state_dict()
    sd["cls_token"] = hsd["embeddings.cls_token"]
    sd["patch_embed.proj.weight"] = hsd[
        "embeddings.patch_embeddings.projection.weight"]
    sd["patch_embed.proj.bias"] = hsd[
        "embeddings.patch_embeddings.projection.bias"]
    for i in range(L):
        b, t = f"encoder.layer.{i}", f"blocks.{i}"
        a = f"{b}.attention.attention"
        sd[f"{t}.attn.qkv.weight"] = torch.cat(
            [hsd[f"{a}.query.weight"], hsd[f"{a}.key.weight"],
             hsd[f"{a}.value.weight"]])
        sd[f"{t}.attn.q_bias"] = hsd[f"{a}.query.bias"]
        sd[f"{t}.attn.v_bias"] = hsd[f"{a}.value.bias"]
        sd[f"{t}.attn.relative_position_bias_table"] = hsd[
            f"{a}.relative_position_bias.relative_position_bias_table"]
        sd[f"{t}.attn.proj.weight"] = hsd[f"{b}.attention.output.dense.weight"]
        sd[f"{t}.attn.proj.bias"] = hsd[f"{b}.attention.output.dense.bias"]
        sd[f"{t}.gamma_1"] = hsd[f"{b}.lambda_1"]
        sd[f"{t}.gamma_2"] = hsd[f"{b}.lambda_2"]
        sd[f"{t}.norm1.weight"] = hsd[f"{b}.layernorm_before.weight"]
        sd[f"{t}.norm1.bias"] = hsd[f"{b}.layernorm_before.bias"]
        sd[f"{t}.norm2.weight"] = hsd[f"{b}.layernorm_after.weight"]
        sd[f"{t}.norm2.bias"] = hsd[f"{b}.layernorm_after.bias"]
        sd[f"{t}.mlp.fc1.weight"] = hsd[f"{b}.intermediate.dense.weight"]
        sd[f"{t}.mlp.fc1.bias"] = hsd[f"{b}.intermediate.dense.bias"]
        sd[f"{t}.mlp.fc2.weight"] = hsd[f"{b}.output.dense.weight"]
        sd[f"{t}.mlp.fc2.bias"] = hsd[f"{b}.output.dense.bias"]

    cfg = ViTConfig(patch_size=P, width=D, depth=L, num_heads=H,
                    mlp_ratio=2.0, pos_embed="none", rel_pos_bias=True,
                    layerscale=True)
    variables = convert_vit_timm(sd, cfg)

    x = rng.randn(2, 3, IMG, IMG).astype(np.float32)
    with torch.no_grad():
        out = hf(torch.from_numpy(x), output_hidden_states=True)
    res = ViT(cfg).apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                         taps=tuple(range(L)))
    for i, got in enumerate(res["tokens"]):
        _assert_close(got, out.hidden_states[i + 1].numpy())


# --------------------------------------------------------------------------
# DINOv2 w/ registers: [cls, reg, patch] token order, LayerScale (dino.py:203)
# --------------------------------------------------------------------------
def test_dinov2_registers_matches_hf(rng):
    D, L, H, P, IMG, R = 32, 2, 2, 16, 48, 2
    hf = _randomize(transformers.Dinov2WithRegistersModel(
        transformers.Dinov2WithRegistersConfig(
            hidden_size=D, num_hidden_layers=L, num_attention_heads=H,
            mlp_ratio=2, image_size=IMG, patch_size=P,
            num_register_tokens=R, layerscale_value=0.1,
            layer_norm_eps=1e-6, hidden_act="gelu",
        )))

    sd, hsd = {}, hf.state_dict()
    sd["cls_token"] = hsd["embeddings.cls_token"]
    sd["register_tokens"] = hsd["embeddings.register_tokens"]
    sd["pos_embed"] = hsd["embeddings.position_embeddings"]
    sd["patch_embed.proj.weight"] = hsd[
        "embeddings.patch_embeddings.projection.weight"]
    sd["patch_embed.proj.bias"] = hsd[
        "embeddings.patch_embeddings.projection.bias"]
    for i in range(L):
        b, t = f"encoder.layer.{i}", f"blocks.{i}"
        a = f"{b}.attention.attention"
        sd[f"{t}.attn.qkv.weight"] = torch.cat(
            [hsd[f"{a}.query.weight"], hsd[f"{a}.key.weight"],
             hsd[f"{a}.value.weight"]])
        sd[f"{t}.attn.qkv.bias"] = torch.cat(
            [hsd[f"{a}.query.bias"], hsd[f"{a}.key.bias"],
             hsd[f"{a}.value.bias"]])
        sd[f"{t}.attn.proj.weight"] = hsd[f"{b}.attention.output.dense.weight"]
        sd[f"{t}.attn.proj.bias"] = hsd[f"{b}.attention.output.dense.bias"]
        sd[f"{t}.gamma_1"] = hsd[f"{b}.layer_scale1.lambda1"]
        sd[f"{t}.gamma_2"] = hsd[f"{b}.layer_scale2.lambda1"]
        for our, theirs in (("norm1", "norm1"), ("norm2", "norm2")):
            sd[f"{t}.{our}.weight"] = hsd[f"{b}.{theirs}.weight"]
            sd[f"{t}.{our}.bias"] = hsd[f"{b}.{theirs}.bias"]
        for fc in ("fc1", "fc2"):
            sd[f"{t}.mlp.{fc}.weight"] = hsd[f"{b}.mlp.{fc}.weight"]
            sd[f"{t}.mlp.{fc}.bias"] = hsd[f"{b}.mlp.{fc}.bias"]

    cfg = ViTConfig(patch_size=P, width=D, depth=L, num_heads=H,
                    mlp_ratio=2.0, layerscale=True, num_register_tokens=R)
    variables = convert_vit_timm(sd, cfg)

    x = rng.randn(2, 3, IMG, IMG).astype(np.float32)
    with torch.no_grad():
        out = hf(torch.from_numpy(x), output_hidden_states=True)
    res = ViT(cfg).apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                         taps=tuple(range(L)))
    for i, got in enumerate(res["tokens"]):
        _assert_close(got, out.hidden_states[i + 1].numpy())


# --------------------------------------------------------------------------
# SAM: windowed attention + decomposed relative positions (sam.py /
# segment_anything ViTDet encoder)
# --------------------------------------------------------------------------
def test_sam_windowed_rel_pos_matches_hf(rng):
    D, L, H, P, IMG, WIN = 32, 2, 2, 16, 64, 2  # 4x4 grid, 2x2 windows
    hf = _randomize(transformers.SamVisionModel(transformers.SamVisionConfig(
        hidden_size=D, num_hidden_layers=L, num_attention_heads=H,
        mlp_dim=2 * D, image_size=IMG, patch_size=P, window_size=WIN,
        global_attn_indexes=[1], use_rel_pos=True, use_abs_pos=True,
        output_channels=16, layer_norm_eps=1e-6,
    )))

    # HF naming -> segment_anything naming (convert_sam's expected layout)
    sd = {}
    for k, v in hf.state_dict().items():
        k = k.replace("vision_encoder.", "image_encoder.")
        k = k.replace("patch_embed.projection.", "patch_embed.proj.")
        k = k.replace("layers.", "blocks.")
        k = k.replace("layer_norm1.", "norm1.").replace("layer_norm2.", "norm2.")
        sd[k] = v

    cfg = SAMViTConfig(width=D, depth=L, num_heads=H, patch_size=P,
                       window_size=WIN, global_attn_indexes=(1,),
                       mlp_ratio=2.0, table_grid=(IMG // P, IMG // P))
    variables = convert_sam(sd, cfg)

    x = rng.randn(2, 3, IMG, IMG).astype(np.float32)
    with torch.no_grad():
        out = hf(torch.from_numpy(x), output_hidden_states=True)
    res = SAMViT(cfg).apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                            taps=(0, 1))
    for i, got in enumerate(res["maps"]):
        _assert_close(got, out.hidden_states[i + 1].numpy())


# --------------------------------------------------------------------------
# CLIP: quickgelu + pre-LN + bias-free patch conv (clip.py / open_clip)
# --------------------------------------------------------------------------
def test_clip_quickgelu_matches_hf(rng):
    D, L, H, P, IMG = 32, 2, 2, 16, 48
    hf = _randomize(transformers.CLIPVisionModel(transformers.CLIPVisionConfig(
        hidden_size=D, num_hidden_layers=L, num_attention_heads=H,
        intermediate_size=2 * D, image_size=IMG, patch_size=P,
        hidden_act="quick_gelu", layer_norm_eps=1e-5,
    )))

    # HF naming -> open_clip visual trunk naming
    sd, hsd = {}, hf.state_dict()
    e = "vision_model.embeddings"
    sd["visual.class_embedding"] = hsd[f"{e}.class_embedding"]
    sd["visual.positional_embedding"] = hsd[f"{e}.position_embedding.weight"]
    sd["visual.conv1.weight"] = hsd[f"{e}.patch_embedding.weight"]
    sd["visual.ln_pre.weight"] = hsd["vision_model.pre_layrnorm.weight"]
    sd["visual.ln_pre.bias"] = hsd["vision_model.pre_layrnorm.bias"]
    for i in range(L):
        b = f"vision_model.encoder.layers.{i}"
        t = f"visual.transformer.resblocks.{i}"
        a = f"{b}.self_attn"
        sd[f"{t}.attn.in_proj_weight"] = torch.cat(
            [hsd[f"{a}.q_proj.weight"], hsd[f"{a}.k_proj.weight"],
             hsd[f"{a}.v_proj.weight"]])
        sd[f"{t}.attn.in_proj_bias"] = torch.cat(
            [hsd[f"{a}.q_proj.bias"], hsd[f"{a}.k_proj.bias"],
             hsd[f"{a}.v_proj.bias"]])
        sd[f"{t}.attn.out_proj.weight"] = hsd[f"{a}.out_proj.weight"]
        sd[f"{t}.attn.out_proj.bias"] = hsd[f"{a}.out_proj.bias"]
        sd[f"{t}.ln_1.weight"] = hsd[f"{b}.layer_norm1.weight"]
        sd[f"{t}.ln_1.bias"] = hsd[f"{b}.layer_norm1.bias"]
        sd[f"{t}.ln_2.weight"] = hsd[f"{b}.layer_norm2.weight"]
        sd[f"{t}.ln_2.bias"] = hsd[f"{b}.layer_norm2.bias"]
        sd[f"{t}.mlp.c_fc.weight"] = hsd[f"{b}.mlp.fc1.weight"]
        sd[f"{t}.mlp.c_fc.bias"] = hsd[f"{b}.mlp.fc1.bias"]
        sd[f"{t}.mlp.c_proj.weight"] = hsd[f"{b}.mlp.fc2.weight"]
        sd[f"{t}.mlp.c_proj.bias"] = hsd[f"{b}.mlp.fc2.bias"]

    cfg = ViTConfig(patch_size=P, width=D, depth=L, num_heads=H,
                    mlp_ratio=2.0, pre_norm=True, patch_bias=False,
                    act="quickgelu", layernorm_eps=1e-5)
    variables = convert_vit_openclip(sd, cfg)

    x = rng.randn(2, 3, IMG, IMG).astype(np.float32)
    with torch.no_grad():
        out = hf(torch.from_numpy(x), output_hidden_states=True)
    res = ViT(cfg).apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                         taps=tuple(range(L)))
    for i, got in enumerate(res["tokens"]):
        _assert_close(got, out.hidden_states[i + 1].numpy())


# --------------------------------------------------------------------------
# SigLIP: no cls token, tanh-approx GELU (big_vision JAX default; HF mirrors
# as hidden_act="gelu_pytorch_tanh"; siglip.py wraps the timm port)
# --------------------------------------------------------------------------
def test_siglip_tanh_gelu_matches_hf(rng):
    D, L, H, P, IMG = 32, 2, 2, 16, 48
    hf = _randomize(transformers.SiglipVisionModel(
        transformers.SiglipVisionConfig(
            hidden_size=D, num_hidden_layers=L, num_attention_heads=H,
            intermediate_size=2 * D, image_size=IMG, patch_size=P,
        )))
    assert hf.config.hidden_act == "gelu_pytorch_tanh"  # the genuine default

    # HF naming -> timm SigLIP trunk naming
    sd, hsd = {}, hf.state_dict()
    e = "vision_model.embeddings"
    sd["patch_embed.proj.weight"] = hsd[f"{e}.patch_embedding.weight"]
    sd["patch_embed.proj.bias"] = hsd[f"{e}.patch_embedding.bias"]
    sd["pos_embed"] = hsd[f"{e}.position_embedding.weight"]
    for i in range(L):
        b, t = f"vision_model.encoder.layers.{i}", f"blocks.{i}"
        a = f"{b}.self_attn"
        sd[f"{t}.attn.qkv.weight"] = torch.cat(
            [hsd[f"{a}.q_proj.weight"], hsd[f"{a}.k_proj.weight"],
             hsd[f"{a}.v_proj.weight"]])
        sd[f"{t}.attn.qkv.bias"] = torch.cat(
            [hsd[f"{a}.q_proj.bias"], hsd[f"{a}.k_proj.bias"],
             hsd[f"{a}.v_proj.bias"]])
        sd[f"{t}.attn.proj.weight"] = hsd[f"{a}.out_proj.weight"]
        sd[f"{t}.attn.proj.bias"] = hsd[f"{a}.out_proj.bias"]
        sd[f"{t}.norm1.weight"] = hsd[f"{b}.layer_norm1.weight"]
        sd[f"{t}.norm1.bias"] = hsd[f"{b}.layer_norm1.bias"]
        sd[f"{t}.norm2.weight"] = hsd[f"{b}.layer_norm2.weight"]
        sd[f"{t}.norm2.bias"] = hsd[f"{b}.layer_norm2.bias"]
        for fc in ("fc1", "fc2"):
            sd[f"{t}.mlp.{fc}.weight"] = hsd[f"{b}.mlp.{fc}.weight"]
            sd[f"{t}.mlp.{fc}.bias"] = hsd[f"{b}.mlp.{fc}.bias"]

    cfg = ViTConfig(patch_size=P, width=D, depth=L, num_heads=H,
                    mlp_ratio=2.0, class_token=False, pos_embed_cls=False,
                    act="gelu_tanh")
    variables = convert_vit_timm(sd, cfg)

    x = rng.randn(2, 3, IMG, IMG).astype(np.float32)
    with torch.no_grad():
        out = hf(torch.from_numpy(x), output_hidden_states=True)
    res = ViT(cfg).apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                         taps=tuple(range(L)))
    for i, got in enumerate(res["tokens"]):
        _assert_close(got, out.hidden_states[i + 1].numpy())


# --------------------------------------------------------------------------
# ConvNeXt-V2: GRN instead of LayerScale (convnext.py FCMAE variant)
# --------------------------------------------------------------------------
def test_convnextv2_grn_matches_hf(rng):
    dims, depths = (8, 16, 16, 32), (1, 1, 1, 1)
    hf = _randomize(transformers.ConvNextV2Model(transformers.ConvNextV2Config(
        num_channels=3, hidden_sizes=list(dims), depths=list(depths),
        image_size=32,
    )))

    # HF naming -> FB convnext-v2 repo naming (convert_convnext's FB branch)
    sd = {}
    for k, v in hf.state_dict().items():
        if k.startswith("layernorm."):
            continue  # HF's final pooled-output LN: not part of the trunk
        k = k.replace("embeddings.patch_embeddings.",
                      "downsample_layers.0.0.")
        k = k.replace("embeddings.layernorm.", "downsample_layers.0.1.")
        k = k.replace("encoder.stages.", "stages.")
        for s in range(1, 4):
            k = k.replace(f"stages.{s}.downsampling_layer.0.",
                          f"downsample_layers.{s}.0.")
            k = k.replace(f"stages.{s}.downsampling_layer.1.",
                          f"downsample_layers.{s}.1.")
        k = k.replace(".layers.", ".")
        k = k.replace(".layernorm.", ".norm.")
        k = k.replace(".grn.weight", ".grn.gamma")
        k = k.replace(".grn.bias", ".grn.beta")
        sd[k] = v

    cfg = ConvNeXtConfig(depths=depths, dims=dims, use_grn=True)
    variables = convert_convnext(sd, cfg)

    x = rng.randn(2, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        out = hf(torch.from_numpy(x), output_hidden_states=True)
    got_taps = ConvNeXt(cfg).apply(
        variables, jnp.asarray(x.transpose(0, 2, 3, 1)), taps=(0, 1, 2, 3))
    for i, got in enumerate(got_taps):
        # HF hidden states are channels-first
        _assert_close(np.asarray(got).transpose(0, 3, 1, 2),
                      out.hidden_states[i + 1].numpy(), atol=1e-4, rtol=1e-3)


# --------------------------------------------------------------------------
# ResNet-50: the trunk behind the 17-model SSL zoo (simclr.py:29-115).
# HF ResNetModel is an independent v1.5 implementation (stride in the 3x3,
# torchvision-equivalent); remap to the torchvision naming every VISSL/
# MoCo/MMSelfSup checkpoint is normalized to (util.py:106).
# --------------------------------------------------------------------------
def test_resnet50_matches_hf(rng):
    from midvision_probe_tpu.models.convert import convert_resnet50
    from midvision_probe_tpu.models.resnet import STAGE_BLOCKS, ResNet50

    hf = _randomize(transformers.ResNetModel(transformers.ResNetConfig(
        embedding_size=64, hidden_sizes=[256, 512, 1024, 2048],
        depths=list(STAGE_BLOCKS), layer_type="bottleneck",
        downsample_in_first_stage=False,
    )))
    assert not hf.config.downsample_in_bottleneck  # v1.5 = torchvision

    sd = {}
    for k, v in hf.state_dict().items():
        if "num_batches_tracked" in k:
            continue
        k = k.replace("embedder.embedder.", "")
        for s in range(4):
            k = k.replace(f"encoder.stages.{s}.layers.", f"layer{s + 1}.")
        if k.startswith("convolution."):
            k = k.replace("convolution.", "conv1.")
        elif k.startswith("normalization."):
            k = k.replace("normalization.", "bn1.")
        k = k.replace(".shortcut.convolution.", ".downsample.0.")
        k = k.replace(".shortcut.normalization.", ".downsample.1.")
        for c in range(3):
            k = k.replace(f".layer.{c}.convolution.", f".conv{c + 1}.")
            k = k.replace(f".layer.{c}.normalization.", f".bn{c + 1}.")
        sd[k] = v

    variables = convert_resnet50(sd)
    x = rng.randn(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        out = hf(torch.from_numpy(x), output_hidden_states=True)
    got = ResNet50().apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                           taps=(0, 1, 2, 3, 4))
    # hidden_states[0] = stem (conv7x7+bn+relu+maxpool) = our tap 0;
    # [s+1] = bottleneck stage s (channels-first)
    for i, g in enumerate(got):
        _assert_close(np.asarray(g).transpose(0, 3, 1, 2),
                      out.hidden_states[i].numpy(), atol=2e-4, rtol=1e-3)


# --------------------------------------------------------------------------
# MAE: fixed 2D sin-cos position embedding (mae.py:74-104). ViTMAEModel with
# mask_ratio=0 and identity noise keeps all patches in order, so the oracle
# exercises OUR sincos2d generation (vit.py:77-97) against HF's — the table
# is generated, not converted, on our side.
# --------------------------------------------------------------------------
def test_mae_sincos_matches_hf(rng):
    from midvision_probe_tpu.models.convert import convert_vit_hf

    D, L, H, P, IMG = 32, 2, 2, 16, 48
    hf = transformers.ViTMAEModel(transformers.ViTMAEConfig(
        hidden_size=D, num_hidden_layers=L, num_attention_heads=H,
        intermediate_size=2 * D, image_size=IMG, patch_size=P,
        mask_ratio=0.0, layer_norm_eps=1e-6, hidden_act="gelu",
    ))
    # randomize weights but PRESERVE the fixed sincos table (the oracle)
    g = torch.Generator().manual_seed(5)
    with torch.no_grad():
        for n, p in hf.named_parameters():
            if "position_embeddings" not in n:
                p.copy_(0.02 * torch.randn(p.shape, generator=g))
    hf.eval()

    cfg = ViTConfig(patch_size=P, width=D, depth=L, num_heads=H,
                    mlp_ratio=2.0, pos_embed="sincos2d")
    variables = convert_vit_hf(hf.state_dict(), cfg)

    x = rng.randn(2, 3, IMG, IMG).astype(np.float32)
    n_patches = (IMG // P) ** 2
    identity_noise = torch.arange(n_patches, dtype=torch.float32)[None]
    identity_noise = identity_noise.expand(2, n_patches)
    with torch.no_grad():
        out = hf(torch.from_numpy(x), noise=identity_noise,
                 output_hidden_states=True)
    assert out.mask.sum() == 0  # nothing masked, order preserved
    res = ViT(cfg).apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                         taps=tuple(range(L)))
    for i, got in enumerate(res["tokens"]):
        _assert_close(got, out.hidden_states[i + 1].numpy())

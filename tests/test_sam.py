"""SAM windowed-ViT parity vs transformers SamVisionModel (independent
torch implementation)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch


def test_sam_vit_matches_transformers(rng):
    transformers = pytest.importorskip("transformers")
    hf_cfg = transformers.SamVisionConfig(
        hidden_size=32, num_hidden_layers=3, num_attention_heads=2,
        image_size=64, patch_size=16, window_size=2,
        global_attn_indexes=[1], mlp_dim=64,
    )
    hf = transformers.SamVisionModel(hf_cfg).eval()

    # rename to segment_anything layout for convert_sam
    sd = {}
    for k, v in hf.state_dict().items():
        k = k.replace("vision_encoder.", "image_encoder.")
        k = k.replace("layers.", "blocks.")
        k = k.replace("layer_norm1", "norm1").replace("layer_norm2", "norm2")
        k = k.replace("patch_embed.projection", "patch_embed.proj")
        sd[k] = v

    from midvision_probe_tpu.models.convert.sam_convert import convert_sam
    from midvision_probe_tpu.models.vit_sam import SAMViT, SAMViTConfig

    cfg = SAMViTConfig(width=32, depth=3, num_heads=2, patch_size=16,
                       window_size=2, global_attn_indexes=(1,),
                       mlp_ratio=2.0, table_grid=(4, 4))
    variables = convert_sam(sd, cfg)

    x = rng.randn(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        out = hf(torch.from_numpy(x), output_hidden_states=True)
    # hidden_states[0] = embeddings; [i+1] = block i output, (B, H, W, C)
    ref_taps = [out.hidden_states[i + 1].numpy() for i in range(3)]

    res = SAMViT(cfg).apply(
        variables, jnp.asarray(x.transpose(0, 2, 3, 1)), taps=(0, 1, 2)
    )
    for got, ref in zip(res["maps"], ref_taps):
        np.testing.assert_allclose(np.asarray(got), ref, atol=3e-5, rtol=1e-3)


def test_sam_extractor_contract(rng):
    from midvision_probe_tpu.models import zoo

    m = zoo.SAM(arch="vit_b", output="dense", return_multilayer=True)
    assert m.feat_dim == [768] * 4
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    outs = m(x)
    assert len(outs) == 4 and outs[0].shape == (1, 4, 4, 768)

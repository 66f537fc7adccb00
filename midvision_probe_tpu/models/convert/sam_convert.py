"""segment_anything image-encoder state_dict → Flax SAMViT params."""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

from midvision_probe_tpu.models.vit_sam import SAMViTConfig


from midvision_probe_tpu.models.convert.common import _np  # noqa: E501


def convert_sam(sd: Mapping[str, Any], cfg: SAMViTConfig,
                prefix: str = "image_encoder.") -> dict:
    sub = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}

    params: dict[str, Any] = {
        "patch_embed": {
            "kernel": _np(sub["patch_embed.proj.weight"]).transpose(2, 3, 1, 0),
            "bias": _np(sub["patch_embed.proj.bias"]),
        },
        "pos_embed": _np(sub["pos_embed"])[0],  # (1, H, W, C) -> (H, W, C)
    }
    for i in range(cfg.depth):
        b = f"blocks.{i}"
        attn = {
            "qkv": {"kernel": _np(sub[f"{b}.attn.qkv.weight"]).T,
                    "bias": _np(sub[f"{b}.attn.qkv.bias"])},
            "proj": {"kernel": _np(sub[f"{b}.attn.proj.weight"]).T,
                     "bias": _np(sub[f"{b}.attn.proj.bias"])},
            "rel_pos_h": _np(sub[f"{b}.attn.rel_pos_h"]),
            "rel_pos_w": _np(sub[f"{b}.attn.rel_pos_w"]),
        }
        params[f"blocks_{i}"] = {
            "norm1": {"scale": _np(sub[f"{b}.norm1.weight"]),
                      "bias": _np(sub[f"{b}.norm1.bias"])},
            "norm2": {"scale": _np(sub[f"{b}.norm2.weight"]),
                      "bias": _np(sub[f"{b}.norm2.bias"])},
            "attn": attn,
            "mlp_lin1": {"kernel": _np(sub[f"{b}.mlp.lin1.weight"]).T,
                         "bias": _np(sub[f"{b}.mlp.lin1.bias"])},
            "mlp_lin2": {"kernel": _np(sub[f"{b}.mlp.lin2.weight"]).T,
                         "bias": _np(sub[f"{b}.mlp.lin2.bias"])},
        }
    return {"params": params}

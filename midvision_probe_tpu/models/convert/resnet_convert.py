"""torchvision-layout ResNet-50 state_dict → Flax params/batch_stats."""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

from midvision_probe_tpu.models.resnet import STAGE_BLOCKS


from midvision_probe_tpu.models.convert.common import _np  # noqa: E501


def _conv(sd: Mapping, key: str) -> dict:
    # torch conv weight (O, I, kh, kw) -> flax (kh, kw, I, O)
    return {"kernel": _np(sd[f"{key}.weight"]).transpose(2, 3, 1, 0)}


def _bn(sd: Mapping, key: str):
    params = {"scale": _np(sd[f"{key}.weight"]), "bias": _np(sd[f"{key}.bias"])}
    stats = {
        "mean": _np(sd[f"{key}.running_mean"]),
        "var": _np(sd[f"{key}.running_var"]),
    }
    return params, stats


def convert_resnet50(sd: Mapping[str, Any], prefix: str = "") -> dict:
    """torchvision ``resnet50`` trunk → variables for ``models.resnet.ResNet50``.

    This is the weight layout every VISSL/MoCo/MMSelfSup R50 checkpoint is
    normalized to by the reference's ``prepare_state_dict`` surgery
    (``evals/models/util.py:106``, ``simclr.py:17-24``).
    """
    sub = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}

    params: dict[str, Any] = {"conv1": _conv(sub, "conv1")}
    stats: dict[str, Any] = {}
    params["bn1"], stats["bn1"] = _bn(sub, "bn1")

    for stage, num_blocks in enumerate(STAGE_BLOCKS):
        for b in range(num_blocks):
            t = f"layer{stage + 1}.{b}"
            name = f"layer{stage + 1}_{b}"
            blk_p: dict[str, Any] = {}
            blk_s: dict[str, Any] = {}
            for c in (1, 2, 3):
                blk_p[f"conv{c}"] = _conv(sub, f"{t}.conv{c}")
                blk_p[f"bn{c}"], blk_s[f"bn{c}"] = _bn(sub, f"{t}.bn{c}")
            if f"{t}.downsample.0.weight" in sub:
                blk_p["downsample_conv"] = _conv(sub, f"{t}.downsample.0")
                blk_p["downsample_bn"], blk_s["downsample_bn"] = _bn(
                    sub, f"{t}.downsample.1"
                )
            params[name] = blk_p
            stats[name] = blk_s

    return {"params": params, "batch_stats": stats}

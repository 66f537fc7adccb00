"""timm/open_clip ConvNeXt state_dict → Flax params.

Handles both naming families: timm convnext/convnextv2
(``stages.N.blocks.M.{conv_dw,norm,mlp.fc1,mlp.fc2,gamma,grn}``) and the
original FB repo naming (``stages.N.M.{dwconv,norm,pwconv1,pwconv2,gamma}``,
``downsample_layers``).
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

from midvision_probe_tpu.models.convnext import ConvNeXtConfig


from midvision_probe_tpu.models.convert.common import _np  # noqa: E402,F401


def _get(sub: Mapping, *names: str):
    for n in names:
        if n in sub:
            return sub[n]
    raise KeyError(names)


def convert_convnext(sd: Mapping[str, Any], cfg: ConvNeXtConfig,
                     prefix: str = "") -> dict:
    sub = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}

    def conv(*names):
        w = _np(_get(sub, *names))
        return w.transpose(2, 3, 1, 0)

    def ln(stem: str) -> dict:
        return {"scale": _np(sub[f"{stem}.weight"]),
                "bias": _np(sub[f"{stem}.bias"])}

    def dense(*names):
        prefix_name = None
        for n in names:
            if f"{n}.weight" in sub:
                prefix_name = n
                break
        if prefix_name is None:
            raise KeyError(names)
        return {"kernel": _np(sub[f"{prefix_name}.weight"]).T,
                "bias": _np(sub[f"{prefix_name}.bias"])}

    params: dict[str, Any] = {}
    # stem: timm 'stem.0/1'; FB 'downsample_layers.0.0/1'
    params["stem_conv"] = {
        "kernel": conv("stem.0.weight", "downsample_layers.0.0.weight"),
        "bias": _np(_get(sub, "stem.0.bias", "downsample_layers.0.0.bias")),
    }
    params["stem_norm"] = (
        ln("stem.1") if "stem.1.weight" in sub else ln("downsample_layers.0.1")
    )

    for s, (depth, dim) in enumerate(zip(cfg.depths, cfg.dims)):
        if s > 0:
            if f"stages.{s}.downsample.0.weight" in sub:
                params[f"downsample_norm_{s}"] = ln(f"stages.{s}.downsample.0")
                dk = f"stages.{s}.downsample.1"
            else:
                params[f"downsample_norm_{s}"] = ln(
                    f"downsample_layers.{s}.0"
                )
                dk = f"downsample_layers.{s}.1"
            params[f"downsample_conv_{s}"] = {
                "kernel": conv(f"{dk}.weight"),
                "bias": _np(sub[f"{dk}.bias"]),
            }
        for b in range(depth):
            timm_b = f"stages.{s}.blocks.{b}"
            fb_b = f"stages.{s}.{b}"
            base = timm_b if f"{timm_b}.norm.weight" in sub else fb_b
            dw_names = (f"{base}.conv_dw.weight", f"{base}.dwconv.weight")
            dw_bias = (f"{base}.conv_dw.bias", f"{base}.dwconv.bias")
            block: dict[str, Any] = {
                "dwconv": {
                    "kernel": conv(*dw_names),
                    "bias": _np(_get(sub, *dw_bias)),
                },
                "norm": ln(f"{base}.norm"),
                "pwconv1": dense(f"{base}.mlp.fc1", f"{base}.pwconv1"),
                "pwconv2": dense(f"{base}.mlp.fc2", f"{base}.pwconv2"),
            }
            if cfg.use_grn:
                g = _np(_get(sub, f"{base}.mlp.grn.weight",
                             f"{base}.grn.gamma"))
                bta = _np(_get(sub, f"{base}.mlp.grn.bias",
                               f"{base}.grn.beta"))
                block["grn_gamma"] = g.reshape(-1)
                block["grn_beta"] = bta.reshape(-1)
            else:
                block["gamma"] = _np(_get(sub, f"{base}.gamma"))
            params[f"stage{s}_block{b}"] = block

    return {"params": params}

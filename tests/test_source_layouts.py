"""On-disk source-layout round-trips: fabricate a genuine container file per
checkpoint source, torch.load it back, unwrap + convert, and require Flax
forward parity with the torch replica.

Complements tests/test_convert*.py (which validate converter math against
in-memory dicts): here the **packaging** is under test — VISSL
classy_state_dict nesting, MoCo prefixes, mmselfsup renames, HF vit. prefix,
CroCo model/enc_blocks — exactly what ``unwrap_checkpoint``
(convert/remap.py:60-114) must dig through. Full-size fabrication +
verification lives in data_processing/{make_source_layout_checkpoints,
export_golden}.py; this is the tiny always-on CI version.
"""

import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest
import torch

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "data_processing"))

from torch_replicas import (  # noqa: E402
    TimmViT,
    timm_to_hf_mae,
    timm_to_mmselfsup,
    wrap_croco,
    wrap_mocov3_vit,
)
from midvision_probe_tpu.models.convert import (  # noqa: E402
    convert_vit_hf,
    convert_vit_timm,
)
from midvision_probe_tpu.models.convert.remap import unwrap_checkpoint  # noqa: E402
from midvision_probe_tpu.models.vit import ViT, ViTConfig  # noqa: E402

DIM, DEPTH, HEADS, PATCH, GRID = 64, 4, 4, 8, 3


def _tiny():
    return TimmViT(dim=DIM, depth=DEPTH, heads=HEADS, patch=PATCH, grid=GRID,
                   mlp_ratio=2.0, seed=11)


def _cfg(**kw):
    return ViTConfig(patch_size=PATCH, width=DIM, depth=DEPTH,
                     num_heads=HEADS, mlp_ratio=2.0,
                     table_grid=(GRID, GRID), **kw)


def _roundtrip(tmp_path, obj, source, cfg, converter="timm", prefix=""):
    """save -> load -> unwrap -> convert; return Flax variables."""
    path = os.path.join(tmp_path, "ckpt.bin")
    torch.save(obj, path)
    sd = unwrap_checkpoint(
        torch.load(path, map_location="cpu", weights_only=False), source)
    conv = convert_vit_hf if converter == "hf" else convert_vit_timm
    return conv(sd, cfg, prefix=prefix)


def _assert_parity(t, variables, cfg, rng, class_token=True):
    x = rng.randn(2, 3, GRID * PATCH, GRID * PATCH).astype(np.float32)
    with torch.no_grad():
        ref = [r.numpy() for r in t.eval()(torch.from_numpy(x))]
    res = ViT(cfg).apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                         taps=tuple(range(DEPTH)))
    for got, want in zip(res["tokens"], ref):
        np.testing.assert_allclose(np.asarray(got), want, atol=3e-5, rtol=1e-4)


@pytest.mark.parametrize("container", ["state_dict_box", "mocov3",
                                       "mmselfsup"])
def test_vit_container_roundtrip(tmp_path, rng, container):
    t = _tiny()
    sd = t.state_dict()
    if container == "state_dict_box":
        obj, source = {"state_dict": dict(sd), "epoch": 1}, "state_dict"
        obj["state_dict"]["head.mlp.0.weight"] = torch.zeros(8, DIM)
    elif container == "mocov3":
        obj, source = wrap_mocov3_vit(dict(sd)), "mocov3"
    else:
        obj, source = timm_to_mmselfsup(dict(sd)), "mmselfsup"
    variables = _roundtrip(tmp_path, obj, source, _cfg())
    _assert_parity(t, variables, _cfg(), rng)


def test_hf_mae_layout_roundtrip(tmp_path, rng):
    t = _tiny()
    obj = timm_to_hf_mae(t.state_dict())
    cfg = _cfg()
    variables = _roundtrip(tmp_path, obj, "raw", cfg, converter="hf",
                           prefix="vit.")
    _assert_parity(t, variables, cfg, rng)


def test_croco_layout_roundtrip(tmp_path, rng):
    t = TimmViT(dim=DIM, depth=DEPTH, heads=HEADS, patch=PATCH, grid=GRID,
                mlp_ratio=2.0, class_token=False, seed=12)
    obj = wrap_croco(t.state_dict())
    # croco keeps its stored-pos-embed-free layout; use learned-from-sd absent
    # -> the converter simply has no pos_embed key, the module adds sincos.
    cfg = _cfg(class_token=False, pos_embed="sincos2d")
    variables = _roundtrip(tmp_path, obj, "croco", cfg)
    # replica must match the module's sincos table
    from torch_replicas import sincos2d_pos_embed

    t.pos_embed.data = sincos2d_pos_embed(DIM, GRID, cls_row=False)
    _assert_parity(t, variables, cfg, rng, class_token=False)


def test_vissl_and_mocov2_containers_unwrap(tmp_path):
    """Container plumbing for the R50 sources (math parity is covered at
    full scale by export_golden and at small scale by test_convert)."""
    from torch_replicas import wrap_mocov2, wrap_vissl

    trunk = {"conv1.weight": torch.ones(4, 3, 7, 7),
             "bn1.weight": torch.ones(4)}
    for obj, source in [(wrap_vissl(dict(trunk)), "vissl"),
                        (wrap_mocov2(dict(trunk)), "mocov2")]:
        path = os.path.join(tmp_path, f"{source}.bin")
        torch.save(obj, path)
        sd = unwrap_checkpoint(
            torch.load(path, map_location="cpu", weights_only=False), source)
        assert set(sd) == set(trunk), (source, set(sd))


def test_radio_layout_roundtrip(tmp_path, rng):
    """RADIO CPE semantics end-to-end (radio.py:84-115): linear (ph,pw,c)
    patch embedder, patch-only pos embed, per-tap final norm, and the
    input conditioner surfaced through the converter extras."""
    from torch_replicas import RadioViT, wrap_radio

    from midvision_probe_tpu.models.convert.radio_convert import convert_radio

    t = RadioViT(dim=DIM, depth=DEPTH, heads=HEADS, patch=PATCH, grid=GRID,
                 mlp_ratio=2.0, seed=13).eval()
    obj = wrap_radio(t.state_dict(), mean=(0.1, 0.2, 0.3), std=(0.9, 0.8, 0.7))
    path = os.path.join(tmp_path, "radio.pth.tar")
    torch.save(obj, path)
    sd = unwrap_checkpoint(
        torch.load(path, map_location="cpu", weights_only=False),
        "state_dict")
    cfg = _cfg(final_norm=True, pos_embed_cls=False)
    variables, extras = convert_radio(sd, cfg)
    np.testing.assert_allclose(extras["image_mean"], (0.1, 0.2, 0.3))

    x = rng.randn(2, 3, GRID * PATCH, GRID * PATCH).astype(np.float32)
    with torch.no_grad():
        ref = [r.numpy() for r in t(torch.from_numpy(x))]
    res = ViT(cfg).apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                         taps=tuple(range(DEPTH)))
    for got, want in zip(res["tokens"], ref):
        np.testing.assert_allclose(np.asarray(got), want, atol=3e-5,
                                   rtol=1e-4)

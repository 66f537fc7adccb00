"""Declarative backbone zoo + reference-compatible wrapper classes.

The reference implements ~45 torch wrapper classes, one file per checkpoint
family (SURVEY §2.2), each re-stating the same tap/normalize/reshape loop.
Here each checkpoint is a data entry — architecture config + weight source +
converter — and two generic builders produce ``FeatureExtractor``s:

* ``build_vit_extractor``    (covers DINO/DINOv2, MAE, iBOT, MoCo-v3,
  MaskFeat, MILAN, EVA, PixMIM, DeiT-III, BEiT-v2, CroCo, ...)
* ``build_resnet_extractor`` (covers the 17-model SSL ResNet-50 zoo)

Weights: this environment has zero egress, so checkpoints are resolved from
``$MVP_CHECKPOINT_DIR`` (default ``./checkpoints``); a present torch file is
unwrapped (``convert.remap``) and converted; otherwise the extractor is
random-initialized with a loud warning (feature *protocol* stays intact).
The original download URLs are recorded per entry for provenance.

Wrapper classes at the bottom keep the reference ctor surfaces
(``configs/backbone/*.yaml``) working unchanged.
"""

from __future__ import annotations

import dataclasses
import functools
import logging
import os
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from midvision_probe_tpu.models.convert import (
    convert_resnet50,
    convert_vit_hf,
    convert_vit_timm,
)
from midvision_probe_tpu.models.convert.remap import unwrap_checkpoint
from midvision_probe_tpu.models.feature_extractor import (
    FeatureExtractor,
    FeatureSpec,
    default_vit_multilayers,
    make_resnet_feature_fn,
    make_vit_feature_fn,
)
from midvision_probe_tpu.models.resnet import RESNET50_FEAT_DIMS, ResNet50
from midvision_probe_tpu.models.vit import VIT_PRESETS, ViT, ViTConfig

log = logging.getLogger(__name__)

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)
OPENAI_CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
OPENAI_CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


@dataclasses.dataclass(frozen=True)
class ZooEntry:
    name: str  # checkpoint_name in the reference CSVs
    arch: str  # "vit" | "resnet"
    source: str  # unwrap_checkpoint convention
    filename: str  # expected file under $MVP_CHECKPOINT_DIR
    url: str = ""  # original weight source (provenance only)
    vit: dict | None = None  # ViTConfig kwargs
    converter: str = "timm"  # timm | hf | resnet
    prefix: str = ""  # key prefix inside the trunk state_dict
    image_mean: tuple = IMAGENET_MEAN
    image_std: tuple = IMAGENET_STD
    default_size: int = 224
    # rel-pos-bias models can't change their token grid; the reference
    # force-resizes inputs to a fixed size instead (beit_v2.py:255-257,
    # midas_final.py:46-52)
    fixed_input: int | None = None
    fixed_input_mode: str = "bilinear"


def _vit(preset: str, patch: int, table: int | None = None, **kw) -> dict:
    d = dict(VIT_PRESETS[preset])
    d["patch_size"] = patch
    if table is not None:
        d["table_grid"] = (table, table)
    d.update(kw)
    return d


ZOO: dict[str, ZooEntry] = {}


def register(entry: ZooEntry) -> ZooEntry:
    ZOO[entry.name] = entry
    return entry


# --- ViT family (reference files: dino.py, mae.py, ibot.py, mocov3.py,
#     maskfeat.py, milan.py, eva.py, pixmlm.py, deit.py, beit_v2.py) --------
register(ZooEntry(
    "dino_vitb16", "vit", "raw", "dino_vitb16.pth",
    url="facebookresearch/dino:dino_vitb16",
    vit=_vit("vit_base", 16, 14),
))
register(ZooEntry(
    "dino_vitb8", "vit", "raw", "dino_vitb8.pth",
    url="facebookresearch/dino:dino_vitb8",
    vit=_vit("vit_base", 8, 28),
))
register(ZooEntry(
    "dinov2_vitb14", "vit", "raw", "dinov2_vitb14.pth",
    url="facebookresearch/dinov2:dinov2_vitb14",
    vit=_vit("vit_base", 14, 37, layerscale=True),
))
register(ZooEntry(
    "dinov2_vitb14_reg", "vit", "raw", "dinov2_vitb14_reg.pth",
    url="facebookresearch/dinov2:dinov2_vitb14_reg",
    vit=_vit("vit_base", 14, 37, layerscale=True, num_register_tokens=4),
))
register(ZooEntry(
    "dinov2_vitl14", "vit", "raw", "dinov2_vitl14.pth",
    url="facebookresearch/dinov2:dinov2_vitl14",
    vit=_vit("vit_large", 14, 37, layerscale=True),
))
register(ZooEntry(
    "mae_vitb16", "vit", "raw", "mae_vitb16.bin",
    url="hf:facebook/vit-mae-base",
    vit=_vit("vit_base", 16, pos_embed="sincos2d", layernorm_eps=1e-12),
    converter="hf", prefix="vit.",
))
register(ZooEntry(
    "mae_vitl16", "vit", "raw", "mae_vitl16.bin",
    url="hf:facebook/vit-mae-large",
    vit=_vit("vit_large", 16, pos_embed="sincos2d", layernorm_eps=1e-12),
    converter="hf", prefix="vit.",
))
for _name, _preset, _ds in [
    ("ibot_vitb16", "vit_base", "in1k"),
    ("ibot_vitb16_in22k", "vit_base", "in22k"),
    ("ibot_vitl16", "vit_large", "in1k"),
    ("ibot_vitl16_in22k", "vit_large", "in22k"),
]:
    register(ZooEntry(
        _name, "vit", "state_dict", f"{_name}.pth",
        url=f"bytedance/ibot checkpoint_teacher.pth ({_ds})",
        vit=_vit(_preset, 16, 14),
    ))
register(ZooEntry(
    "mocov3_vitb16", "vit", "mocov3", "mocov3_vitb16.pth.tar",
    url="dl.fbaipublicfiles.com/moco-v3/vit-b-300ep",
    vit=_vit("vit_base", 16, 14),
))
register(ZooEntry(
    "maskfeat_vitb16", "vit", "mmselfsup", "maskfeat_vitb16.pth",
    url="openmmlab mmselfsup maskfeat vit-base-p16",
    vit=_vit("vit_base", 16, 14, final_norm=False),
))
register(ZooEntry(
    "milan_vitb16", "vit", "state_dict", "milan_vitb16.pth",
    url="gdrive MILAN ViT-B/16",
    vit=_vit("vit_base", 16, 14),
))
register(ZooEntry(
    "eva_vitb16", "vit", "mmselfsup", "eva_vitb16.pth",
    url="openmmlab mmselfsup eva-mae-style vit-base-p16",
    vit=_vit("vit_base", 16, 14),
))
register(ZooEntry(
    "pixmim_vitb16", "vit", "mmselfsup", "pixmim_vitb16.pth",
    url="openmmlab mmselfsup pixmim vit-base-p16",
    vit=_vit("vit_base", 16, 14),
))
register(ZooEntry(
    "deit3_vitb16", "vit", "state_dict", "deit_3_base_384_21k.pth",
    url="facebookresearch/deit:deit_3_base_384_21k",
    vit=_vit("vit_base", 16, 24, layerscale=True), default_size=384,
))
register(ZooEntry(
    "deit3_vitl16", "vit", "state_dict", "deit_3_large_384_21k.pth",
    url="facebookresearch/deit:deit_3_large_384_21k",
    vit=_vit("vit_large", 16, 24, layerscale=True), default_size=384,
))
register(ZooEntry(
    "beitv2_vitb16", "vit", "state_dict", "beitv2_vitb16.pth",
    url="gdrive BEiT-v2 ViT-B/16 (beit_v2.py:8-13)",
    vit=_vit("vit_base", 16, pos_embed="none", rel_pos_bias=True,
             layerscale=True),
    fixed_input=224,  # reference resizes every input (beit_v2.py:255-257)
))

# --- CLIP / SigLIP (reference clip.py, siglip.py) ------------------------
register(ZooEntry(
    "clip_vitb16", "vit", "openclip", "clip_vitb16_openai.pt",
    url="open_clip ViT-B-16 openai",
    vit=_vit("vit_base", 16, 14, pre_norm=True, patch_bias=False,
             act="quickgelu", layernorm_eps=1e-5),
    converter="openclip",
    image_mean=OPENAI_CLIP_MEAN, image_std=OPENAI_CLIP_STD,
))
register(ZooEntry(
    "clip_vitb16_laion", "vit", "openclip", "clip_vitb16_laion2b.pt",
    url="open_clip ViT-B-16 laion2b_s34b_b88k",
    vit=_vit("vit_base", 16, 14, pre_norm=True, patch_bias=False,
             layernorm_eps=1e-5),
    converter="openclip",
    image_mean=OPENAI_CLIP_MEAN, image_std=OPENAI_CLIP_STD,
))
register(ZooEntry(
    "clip_vitl14", "vit", "openclip", "clip_vitl14_openai.pt",
    url="open_clip ViT-L-14 openai",
    vit=_vit("vit_large", 14, 16, pre_norm=True, patch_bias=False,
             act="quickgelu", layernorm_eps=1e-5),
    converter="openclip",
    image_mean=OPENAI_CLIP_MEAN, image_std=OPENAI_CLIP_STD,
))
register(ZooEntry(
    "siglip_vitb16", "vit", "raw", "siglip_vitb16_384.bin",
    url="timm vit_base_patch16_siglip_384",
    vit=_vit("vit_base", 16, 24, class_token=False, pos_embed_cls=False,
             act="gelu_tanh"),
    default_size=384,
    image_mean=(0.5, 0.5, 0.5), image_std=(0.5, 0.5, 0.5),
))
register(ZooEntry(
    "siglip_vitl16", "vit", "raw", "siglip_vitl16_384.bin",
    url="timm vit_large_patch16_siglip_384",
    vit=_vit("vit_large", 16, 24, class_token=False, pos_embed_cls=False,
             act="gelu_tanh"),
    default_size=384,
    image_mean=(0.5, 0.5, 0.5), image_std=(0.5, 0.5, 0.5),
))

# --- CroCo v1/v2 (reference croco.py / crocov2.py; v2 is the only consumer
#     of the cuRoPE2D kernel -> ops.rope2d here) ---------------------------
register(ZooEntry(
    "croco_vitb16", "vit", "croco", "CroCo.pth",
    url="naver CroCo v1 (croco.py:9-14)",
    vit=_vit("vit_base", 16, pos_embed="sincos2d", class_token=False),
    # the reference wrapper bilinearly resizes EVERY dense-forward input to
    # 224x224 (croco.py:149-153) — the sincos table is built for the 224
    # grid and never resized, so 224 is the only size the reference ever
    # runs. Same latent protocol behavior as the BEiT family.
    fixed_input=224,
))
register(ZooEntry(
    "crocov2_vitb16", "vit", "croco", "CroCo_V2_ViTBase_BaseDecoder.pth",
    url="naver CroCo v2 (crocov2.py:10-15)",
    vit=_vit("vit_base", 16, pos_embed="none", class_token=False, rope=True),
    fixed_input=224,  # crocov2.py:152-154 — same forced resize as v1
))

# --- MiDaS / RADIO (reference midas_final.py, radio.py) -------------------
register(ZooEntry(
    "midas_l16", "vit", "state_dict", "dpt_beit_large_384.pt",
    url="intel-isl/MiDaS dpt_beit_large_384 (midas_final.py:83-87)",
    vit=_vit("vit_large", 16, pos_embed="none", rel_pos_bias=True,
             layerscale=True),
    prefix="pretrained.model.",
    default_size=384,
    fixed_input=384,  # reference resizes to 384 (midas_final.py:46-52)
    fixed_input_mode="bicubic",
    image_mean=(0.5, 0.5, 0.5), image_std=(0.5, 0.5, 0.5),
))
register(ZooEntry(
    "radio_v2", "vit", "state_dict", "radio_v2.pth.tar",
    url="NVlabs RADIO v2 (radio.py:35)",
    # RADIO semantics (radio.py:84-115): CPE patch generator = linear patch
    # embedder + pos embed on patches only (no CLS row) + learned CLS; every
    # tap goes through model.norm (radio.py:92-95). The checkpoint's
    # input_conditioner overrides image_mean/std at load time.
    vit=_vit("vit_huge", 16, 16, final_norm=True, pos_embed_cls=False),
    converter="radio",
))

# --- SAM image encoders (reference sam.py; windowed-attention ViTDet) -----
for _arch, _file in [("vit_b", "sam_vit_b_01ec64.pth"),
                     ("vit_l", "sam_vit_l_0b3195.pth"),
                     ("vit_h", "sam_vit_h_4b8939.pth")]:
    register(ZooEntry(
        f"sam_{_arch}", "sam", "raw", _file,
        url=f"dl.fbaipublicfiles.com/segment_anything/{_file}",
        default_size=1024,
    ))

# --- ConvNeXt family (reference convnext.py) ------------------------------
register(ZooEntry(
    "cnxt_b_in22k", "convnext", "raw", "convnext_base_in22k.pth",
    url="timm convnext_base_in22k",
))
register(ZooEntry(
    "cnxt_b_fcmae", "convnext", "raw", "convnextv2_base_fcmae.pth",
    url="timm convnextv2_base.fcmae_ft_in22k_in1k_384",
))
register(ZooEntry(
    "cnxt_b_w_laion2b", "convnext", "openclip", "convnext_base_w_laion2b.pt",
    url="open_clip convnext_base_w laion2b_s13b_b82k",
    prefix="visual.trunk.",
    image_mean=OPENAI_CLIP_MEAN, image_std=OPENAI_CLIP_STD,
))


# --- ResNet-50 SSL zoo (17 wrappers, template simclr.py:29-115) -----------
_R50 = [
    # (name, source, filename, url)
    ("simclr_resnet50", "vissl", "simclr_resnet50.torch",
     "dl.fbaipublicfiles.com/vissl simclr_rn50_1000ep"),
    ("mocov2_resnet50", "mocov2", "mocov2_resnet50.pth.tar",
     "dl.fbaipublicfiles.com/moco mocov2 800ep"),
    ("simsiam_resnet50", "mocov2", "simsiam_resnet50.pth.tar",
     "dl.fbaipublicfiles.com/simsiam 100ep-256bs"),
    ("byol_resnet50", "state_dict", "byol_resnet50.pth.tar",
     "gdrive byol r50 (byol.py)"),
    ("barlowtwins_resnet50", "vissl", "barlowtwins_resnet50.torch",
     "dl.fbaipublicfiles.com/vissl barlow_twins_32gpus_4node"),
    ("densecl_resnet50", "state_dict", "densecl_resnet50.pth",
     "mmselfsup densecl r50 imagenet 200ep"),
    ("swav_resnet50", "vissl", "swav_resnet50.torch",
     "dl.fbaipublicfiles.com/vissl swav_in1k_rn50_800ep"),
    ("selav2_resnet50", "vissl", "selav2_resnet50.torch",
     "dl.fbaipublicfiles.com/vissl sela-v2 400ep_2x224"),
    ("deepclusterv2_resnet50", "vissl", "deepclusterv2_resnet50.torch",
     "dl.fbaipublicfiles.com/vissl deepclusterv2_800ep"),
    ("clusterfit_resnet50", "vissl", "clusterfit_resnet50.torch",
     "dl.fbaipublicfiles.com/vissl clusterfit_16k_rotnet"),
    ("npid_resnet50", "vissl", "npid_resnet50.torch",
     "dl.fbaipublicfiles.com/vissl npid_1crop_200ep"),
    ("npid_plusplus_resnet50", "vissl", "npid_plusplus_resnet50.torch",
     "dl.fbaipublicfiles.com/vissl npid++ 4node_800ep"),
    ("pirl_resnet50", "vissl", "pirl_resnet50.torch",
     "dl.fbaipublicfiles.com/vissl pirl_jigsaw_4node_800ep"),
    ("jigsaw_resnet50", "vissl", "jigsaw_resnet50.torch",
     "dl.fbaipublicfiles.com/vissl jigsaw_rn50_in22k"),
    ("rotnet_resnet50", "vissl", "rotnet_resnet50.torch",
     "dl.fbaipublicfiles.com/vissl rotnet_rn50_in22k"),
    ("mocov3_resnet50", "mocov3", "mocov3_resnet50.pth.tar",
     "dl.fbaipublicfiles.com/moco-v3 r50 1000ep"),
    ("dino_resnet50", "raw", "dino_resnet50.pth",
     "facebookresearch/dino:dino_resnet50"),
]
for _name, _source, _file, _url in _R50:
    register(ZooEntry(_name, "resnet", _source, _file, url=_url,
                      default_size=480))

# tiny randomly-initialized ViT for smoke tests / CI (no reference analog —
# the reference has no fixtures at all, SURVEY §4)
register(ZooEntry(
    "test_tiny_vit", "vit", "raw", "__never_exists__.pth",
    vit=dict(patch_size=8, width=32, depth=4, num_heads=2, mlp_ratio=2.0),
    default_size=64,
))


# --------------------------------------------------------------------------
# checkpoint resolution
# --------------------------------------------------------------------------
def checkpoint_dir() -> str:
    return os.environ.get("MVP_CHECKPOINT_DIR", "checkpoints")


def _load_torch_file(path: str):
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)


def load_variables(entry: ZooEntry, cfg) -> tuple[dict | None, dict]:
    """Resolve + convert weights → (variables, extras). ``variables`` is
    None if no checkpoint is on disk; ``extras`` may carry converter-side
    spec overrides (e.g. RADIO's input-conditioner mean/std)."""
    path = os.path.join(checkpoint_dir(), entry.filename)
    if not os.path.exists(path):
        return None, {}
    ckpt = _load_torch_file(path)
    sd = unwrap_checkpoint(ckpt, entry.source)
    if entry.arch == "resnet":
        return convert_resnet50(sd, prefix=entry.prefix), {}
    if entry.arch == "convnext":
        from midvision_probe_tpu.models.convert.convnext_convert import (
            convert_convnext,
        )

        return convert_convnext(sd, cfg, prefix=entry.prefix), {}
    if entry.converter == "hf":
        return convert_vit_hf(sd, cfg, prefix=entry.prefix), {}
    if entry.converter == "radio":
        from midvision_probe_tpu.models.convert.radio_convert import (
            convert_radio,
        )

        return convert_radio(sd, cfg, prefix=entry.prefix)
    if entry.converter == "openclip":
        from midvision_probe_tpu.models.convert.clip_convert import (
            convert_vit_openclip,
        )

        return (convert_vit_openclip(sd, cfg, prefix=entry.prefix or "visual."),
                {})
    return convert_vit_timm(sd, cfg, prefix=entry.prefix), {}


_RANDOM_INIT_CACHE: dict = {}


def _random_init(module, size: int, example_kw: dict | None = None) -> dict:
    kw = example_kw or {}
    # deterministic (PRNGKey(0)) → safe to cache across repeated builds of
    # the same module config (tests/sweeps re-instantiate extractors a lot)
    cache_key = (repr(module), size, tuple(sorted(kw.items())))
    if cache_key in _RANDOM_INIT_CACHE:
        return _RANDOM_INIT_CACHE[cache_key]
    # init on the CPU backend: flax init traces the full forward, and
    # compiling that on a (possibly remote) TPU just to draw random params
    # wastes minutes of compile time
    # local_devices, not devices: in a multi-process run jax.devices() is
    # the GLOBAL list, whose first CPU belongs to process 0 — init on a
    # non-addressable device can't be fetched back on the other hosts
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        rng = jax.random.PRNGKey(0)
        dummy = jnp.zeros((1, size, size, 3), jnp.float32)
        variables = jax.jit(functools.partial(module.init, **kw))(rng, dummy)
    variables = jax.tree_util.tree_map(np.asarray, variables)
    _RANDOM_INIT_CACHE[cache_key] = variables
    return variables


# --------------------------------------------------------------------------
# generic builders
# --------------------------------------------------------------------------
def _on_axon_tunnel() -> bool:
    """True when the axon remote-compile tunnel is in the platform
    selection. The tunnel registers its devices AS the "tpu" backend
    (``jax.default_backend()`` returns "tpu", device platform "tpu"), so
    the only reliable markers are the ``jax_platforms`` config (the boot
    shim sets it; AUTHORITATIVE — a script that programmatically switches
    to CPU updates the config without scrubbing the env var) and, when
    the config is unset, the JAX_PLATFORMS env var."""
    plats = getattr(jax.config, "jax_platforms", None)
    if plats:
        return "axon" in plats.lower()
    return "axon" in (os.environ.get("JAX_PLATFORMS") or "").lower()


def _use_scan_blocks(depth: int) -> bool:
    """MVP_SCAN_BLOCKS=1/0 forces the lax.scan block stack on/off —
    ~depth-times smaller HLO, same math (models/vit.py
    ViTConfig.scan_blocks). Unset = auto: L+-deep ViTs overflow the
    axon tunnel's remote-compile request limit unrolled
    (logs/vitl_tunnel_r4.md), so they scan there; everything else keeps
    the unrolled default (taps stop at max_tap)."""
    scan_env = os.environ.get("MVP_SCAN_BLOCKS")
    if scan_env is None:
        return depth >= 24 and _on_axon_tunnel()
    return scan_env == "1"


def build_vit_extractor(
    name: str,
    output: str = "dense",
    layer: int = -1,
    return_multilayer: bool = False,
    add_norm: bool = False,
    return_cls: bool = False,
    dtype: Any = jnp.float32,
    init_size: int | None = None,
    checkpoint_name: str | None = None,  # config-surface nicety; ignored
) -> FeatureExtractor:
    entry = ZOO[name]
    cfg = ViTConfig(dtype=dtype, **entry.vit)
    if _use_scan_blocks(cfg.depth):
        cfg = dataclasses.replace(cfg, scan_blocks=True)
    if cfg.pos_embed == "learned" and cfg.table_grid is None:
        # pin the canonical pos-embed grid to the init resolution so inputs
        # of any other size resize the table instead of re-shaping the param
        g = (init_size or entry.default_size) // cfg.patch_size
        cfg = dataclasses.replace(cfg, table_grid=(g, g))

    multilayers = default_vit_multilayers(cfg.depth)
    if not return_multilayer:
        multilayers = [multilayers[-1] if layer == -1 else layer]

    module = ViT(cfg)
    variables, extras = load_variables(entry, cfg)
    if variables is not None and cfg.scan_blocks:
        # converters emit the per-block (`blocks_i`) layout; adapt once
        from midvision_probe_tpu.models.vit import stack_block_variables

        variables = stack_block_variables(variables, cfg.depth)
    feat_dim = cfg.width * (2 if output == "dense-cls" else 1)
    spec = FeatureSpec(
        feat_dim=[feat_dim] * len(multilayers) if return_multilayer else feat_dim,
        patch_size=cfg.patch_size,
        multilayers=tuple(multilayers),
        arch="vit",
        checkpoint_name=name,
        output=output,
        num_layers=cfg.depth,
        add_norm=add_norm,
        image_mean=extras.get("image_mean", entry.image_mean),
        image_std=extras.get("image_std", entry.image_std),
    )
    if variables is None:
        log.warning(
            "no checkpoint for %s under %s — random init (feature protocol "
            "only; place %s there for real features)",
            name, checkpoint_dir(), entry.filename,
        )
        variables = _random_init(
            module,
            # fixed-input models always run at their own size — init there
            # regardless of the caller's init_size (midas_l16 is 384)
            entry.fixed_input or init_size or entry.default_size,
            {"taps": tuple(multilayers)},
        )
    apply_fn = make_vit_feature_fn(
        module, multilayers, output, cfg.num_prefix_tokens,
        fixed_input=entry.fixed_input,
        fixed_input_mode=entry.fixed_input_mode,
    )
    return FeatureExtractor(
        apply_fn, variables, spec,
        return_multilayer=return_multilayer, return_cls=return_cls,
    )


def build_resnet_extractor(
    name: str,
    output: str = "dense",
    return_layers: Sequence[int] | None = None,
    return_multilayer: bool = False,
    add_norm: bool = False,
    return_cls: bool = False,
    dtype: Any = jnp.float32,
) -> FeatureExtractor:
    entry = ZOO[name]
    return_layers = list(return_layers) if return_layers is not None else [0, 1, 2, 3, 4]
    feat_dims = [RESNET50_FEAT_DIMS[i] for i in return_layers]
    multilayers = return_layers if return_multilayer else [return_layers[-1]]

    spec = FeatureSpec(
        feat_dim=feat_dims if return_multilayer else feat_dims[-1],
        patch_size=0,
        multilayers=tuple(multilayers),
        arch="resnet",
        checkpoint_name=f"{name}_{output}_{return_layers}",
        output=output,
        num_layers=5,
        add_norm=add_norm,
        image_mean=entry.image_mean,
        image_std=entry.image_std,
    )
    module = ResNet50(dtype=dtype)
    variables, _ = load_variables(entry, None)
    if variables is None:
        log.warning(
            "no checkpoint for %s under %s — random init", name, checkpoint_dir()
        )
        variables = _random_init(module, 64, {"taps": tuple(multilayers)})
    apply_fn = make_resnet_feature_fn(module, multilayers)
    return FeatureExtractor(
        apply_fn, variables, spec,
        return_multilayer=return_multilayer, return_cls=return_cls,
    )


# --------------------------------------------------------------------------
# reference-compatible wrapper classes (ctor surfaces from
# configs/backbone/*.yaml; extra legacy kwargs accepted and ignored)
# --------------------------------------------------------------------------
_COMMON_IGNORED = ("return_kqv", "fixed_size", "mode_selected", "return_layers")


def _clean(kwargs: dict) -> dict:
    for k in _COMMON_IGNORED:
        kwargs.pop(k, None)
    return kwargs


def DINO(dino_name="dino", model_name="vitb16", output="dense", layer=-1,
         return_multilayer=False, add_norm=False, return_cls=False,
         checkpoint_name=None, **kw) -> FeatureExtractor:
    """reference ``dino.py:9`` (both dino and dinov2 hubs)."""
    name = checkpoint_name or f"{dino_name}_{model_name}"
    name = {
        "dino_vitb16": "dino_vitb16",
        "dino_vitb8": "dino_vitb8",
        "dinov2_vitb14": "dinov2_vitb14",
        "dinov2_vitb14_reg": "dinov2_vitb14_reg",
        "dinov2_vitl14": "dinov2_vitl14",
        "dinov2_b14": "dinov2_vitb14",
    }.get(name, name)
    return build_vit_extractor(
        name, output=output, layer=layer, return_multilayer=return_multilayer,
        add_norm=add_norm, return_cls=return_cls, **_clean(kw),
    )


def MAE(checkpoint="facebook/vit-mae-base", output="dense", layer=-1,
        return_multilayer=False, add_norm=False, return_cls=False, **kw):
    name = "mae_vitl16" if "large" in checkpoint else "mae_vitb16"
    return build_vit_extractor(
        name, output=output, layer=layer, return_multilayer=return_multilayer,
        add_norm=add_norm, return_cls=return_cls, **_clean(kw),
    )


def iBOT(model_type="base", dataset="in1k", output="dense", layer=-1,
         return_multilayer=False, add_norm=False, return_cls=False, **kw):
    name = f"ibot_vit{'b' if model_type == 'base' else 'l'}16"
    if dataset == "in22k":
        name += "_in22k"
    return build_vit_extractor(
        name, output=output, layer=layer, return_multilayer=return_multilayer,
        add_norm=add_norm, return_cls=return_cls, **_clean(kw),
    )


def MoCoV3(model_name="vitb16", output="dense", layer=-1,
           return_multilayer=False, add_norm=False, return_cls=False, **kw):
    return build_vit_extractor(
        "mocov3_vitb16", output=output, layer=layer,
        return_multilayer=return_multilayer, add_norm=add_norm,
        return_cls=return_cls, **_clean(kw),
    )


def _simple_vit_wrapper(zoo_name: str):
    def ctor(model_name="vitb16", output="dense", layer=-1,
             return_multilayer=False, add_norm=False, return_cls=False, **kw):
        return build_vit_extractor(
            zoo_name, output=output, layer=layer,
            return_multilayer=return_multilayer, add_norm=add_norm,
            return_cls=return_cls, **_clean(kw),
        )

    return ctor


MASKFEAT = _simple_vit_wrapper("maskfeat_vitb16")
MILAN = _simple_vit_wrapper("milan_vitb16")
EVA = _simple_vit_wrapper("eva_vitb16")
PIXMLM = _simple_vit_wrapper("pixmim_vitb16")
BEiTV2 = _simple_vit_wrapper("beitv2_vitb16")


def DeIT(model_size="base", img_size=384, output="dense", layer=-1,
         return_multilayer=False, add_norm=False, return_cls=False, **kw):
    name = "deit3_vitb16" if model_size == "base" else "deit3_vitl16"
    return build_vit_extractor(
        name, output=output, layer=layer, return_multilayer=return_multilayer,
        add_norm=add_norm, return_cls=return_cls, **_clean(kw),
    )


# config-surface spellings that differ from the ZOO registry keys
# (configs/backbone/{deepcluster-v2,sela-v2}_resnet50.yaml)
_RESNET_NAME_ALIASES = {
    "deepcluster_v2_resnet50": "deepclusterv2_resnet50",
    "sela_v2_resnet50": "selav2_resnet50",
}


def _resnet_wrapper(zoo_name: str):
    def ctor(arch="resnet50", return_layers=None, output="dense",
             return_multilayer=False, add_norm=False, return_cls=False,
             checkpoint_name=None, **kw):
        kw.pop("dino_name", None)
        kw.pop("model_name", None)
        _clean(kw)
        # every backbone YAML carries checkpoint_name; honor it (it can
        # retarget the wrapper like DINO's) but fail loudly on a name that
        # resolves to nothing — silent fallback would train against the
        # wrong frozen features
        name = _RESNET_NAME_ALIASES.get(checkpoint_name,
                                        checkpoint_name) or zoo_name
        if name not in ZOO:
            raise KeyError(
                f"checkpoint_name={checkpoint_name!r} is not a zoo entry "
                f"(wrapper default {zoo_name!r}); known resnet entries: "
                + ", ".join(k for k in ZOO if "resnet" in k))
        return build_resnet_extractor(
            name, output=output, return_layers=return_layers,
            return_multilayer=return_multilayer, add_norm=add_norm,
            return_cls=return_cls, **kw,
        )

    return ctor


def build_convnext_extractor(
    name: str,
    output: str = "dense",
    layer: int = -1,
    return_multilayer: bool = False,
    add_norm: bool = False,
    return_cls: bool = False,
    dtype: Any = jnp.float32,
    use_grn: bool | None = None,
    checkpoint_name: str | None = None,
) -> FeatureExtractor:
    """ConvNeXt stage taps; ``dense`` output resizes every stage map to the
    /16 grid like the reference (``convnext.py:99-105``)."""
    from midvision_probe_tpu.models.convnext import ConvNeXt, ConvNeXtConfig
    from midvision_probe_tpu.ops.image import resize as _resize

    entry = ZOO[name]
    grn = use_grn if use_grn is not None else ("fcmae" in name)
    cfg = ConvNeXtConfig(use_grn=grn, dtype=dtype)
    feat_dims = list(cfg.dims)
    multilayers = [0, 1, 2, 3]
    if not return_multilayer:
        multilayers = [multilayers[-1] if layer == -1 else layer]

    spec = FeatureSpec(
        feat_dim=[feat_dims[i] for i in multilayers] if return_multilayer
        else feat_dims[multilayers[-1]],
        patch_size=16,
        multilayers=tuple(multilayers),
        arch="convnext",
        checkpoint_name=name,
        output=output,
        num_layers=4,
        add_norm=add_norm,
        image_mean=entry.image_mean,
        image_std=entry.image_std,
    )
    module = ConvNeXt(cfg)
    variables, _ = load_variables(entry, cfg)
    if variables is None:
        log.warning("no checkpoint for %s under %s — random init", name,
                    checkpoint_dir())
        variables = _random_init(module, 64, {"taps": tuple(multilayers)})

    def apply_fn(vs, images):
        maps = module.apply(vs, images, taps=tuple(multilayers))
        out_hw = (images.shape[1] // 16, images.shape[2] // 16)
        if output == "dense":
            maps = [_resize(m.astype(jnp.float32), out_hw, mode="bilinear")
                    for m in maps]
        elif output == "gap":
            maps = [m.mean(axis=(1, 2)) for m in maps]
        # output == "raw": native stage resolutions (converter validation)
        return maps, None

    return FeatureExtractor(
        apply_fn, variables, spec,
        return_multilayer=return_multilayer, return_cls=return_cls,
    )


def build_sam_extractor(
    name: str,
    output: str = "dense",
    layer: int = -1,
    return_multilayer: bool = False,
    add_norm: bool = False,
    return_cls: bool = False,
    dtype: Any = jnp.float32,
    init_size: int | None = None,
    checkpoint_name: str | None = None,
) -> FeatureExtractor:
    from midvision_probe_tpu.models.vit_sam import (
        SAM_PRESETS,
        SAMViT,
        SAMViTConfig,
    )

    entry = ZOO[name]
    arch = name.replace("sam_", "")
    cfg = SAMViTConfig(dtype=dtype, **SAM_PRESETS[arch])
    multilayers = default_vit_multilayers(cfg.depth)
    if not return_multilayer:
        multilayers = [multilayers[-1] if layer == -1 else layer]

    spec = FeatureSpec(
        feat_dim=[cfg.width] * len(multilayers) if return_multilayer
        else cfg.width,
        patch_size=cfg.patch_size,
        multilayers=tuple(multilayers),
        arch="sam",
        checkpoint_name=name,
        output=output,
        num_layers=cfg.depth,
        add_norm=add_norm,
        image_mean=entry.image_mean,
        image_std=entry.image_std,
    )
    module = SAMViT(cfg)
    path = os.path.join(checkpoint_dir(), entry.filename)
    variables = None
    if os.path.exists(path):
        from midvision_probe_tpu.models.convert.sam_convert import convert_sam

        variables = convert_sam(_load_torch_file(path), cfg)
    if variables is None:
        log.warning("no checkpoint for %s under %s — random init", name,
                    checkpoint_dir())
        variables = _random_init(
            module, init_size or 224, {"taps": tuple(multilayers)}
        )

    def apply_fn(vs, images):
        res = module.apply(vs, images, taps=tuple(multilayers))
        maps = [m.astype(jnp.float32) for m in res["maps"]]
        if output == "gap":
            maps = [m.mean(axis=(1, 2)) for m in maps]
        return maps, None

    return FeatureExtractor(
        apply_fn, variables, spec,
        return_multilayer=return_multilayer, return_cls=return_cls,
    )


def SAM(arch="vit_b", output="dense", layer=-1, return_multilayer=False,
        add_norm=False, **kw):
    """reference ``sam.py:11-113``."""
    kw.pop("return_cls", None)
    return build_sam_extractor(
        f"sam_{arch}", output=output, layer=layer,
        return_multilayer=return_multilayer, add_norm=add_norm, **_clean(kw),
    )


def CLIP(arch="ViT-B-16", checkpoint="openai", output="dense", layer=-1,
         return_multilayer=False, add_norm=False, return_cls=False, **kw):
    """reference ``clip.py:27-101`` (open_clip visual towers)."""
    name = {
        ("ViT-B-16", "openai"): "clip_vitb16",
        ("ViT-B-16", "laion2b_s34b_b88k"): "clip_vitb16_laion",
        ("ViT-L-14", "openai"): "clip_vitl14",
    }.get((arch, checkpoint), "clip_vitb16")
    return build_vit_extractor(
        name, output=output, layer=layer, return_multilayer=return_multilayer,
        add_norm=add_norm, return_cls=return_cls, **_clean(kw),
    )


def SigLIP(checkpoint="vit_base_patch16_siglip_384", output="dense", layer=-1,
           return_multilayer=False, add_norm=False, return_cls=False, **kw):
    name = "siglip_vitl16" if "large" in checkpoint else "siglip_vitb16"
    return build_vit_extractor(
        name, output=output, layer=layer, return_multilayer=return_multilayer,
        add_norm=add_norm, return_cls=return_cls, **_clean(kw),
    )


def CROCO(model_name="vitb16", output="dense", layer=-1,
          return_multilayer=False, add_norm=False, return_cls=False, **kw):
    return build_vit_extractor(
        "croco_vitb16", output=output, layer=layer,
        return_multilayer=return_multilayer, add_norm=add_norm,
        return_cls=return_cls, **_clean(kw),
    )


def CROCOV2(model_name="vitb16", output="dense", layer=-1,
            return_multilayer=False, add_norm=False, return_cls=False, **kw):
    return build_vit_extractor(
        "crocov2_vitb16", output=output, layer=layer,
        return_multilayer=return_multilayer, add_norm=add_norm,
        return_cls=return_cls, **_clean(kw),
    )


def ConvNext(arch="convnext_base", checkpoint="in22k", output="dense",
             layer=-1, return_multilayer=False, add_norm=False, **kw):
    name = {
        "in22k": "cnxt_b_in22k",
        "fcmae_ft_in22k_in1k_384": "cnxt_b_fcmae",
    }.get(checkpoint, "cnxt_b_w_laion2b" if "laion" in str(checkpoint)
          else "cnxt_b_in22k")
    kw.pop("return_cls", None)
    return build_convnext_extractor(
        name, output=output, layer=layer, return_multilayer=return_multilayer,
        add_norm=add_norm, **_clean(kw),
    )


def make_beit_backbone(output="dense", layer=-1, midas=True,
                       return_multilayer=False, add_norm=False, **kw):
    """reference ``midas_final.py:83-119`` (MiDaS DPT-BEiT-L/16-384 trunk)."""
    kw.pop("return_cls", None)
    return build_vit_extractor(
        "midas_l16", output=output, layer=layer,
        return_multilayer=return_multilayer, add_norm=add_norm, **_clean(kw),
    )


def RADIO(version="radio_v2", output="dense", layer=-1,
          return_multilayer=False, add_norm=False, **kw):
    """reference ``radio.py:35`` (NVIDIA agglomerative ViT).

    Faithful trunk semantics (radio.py:84-115): CPE patch generator (linear
    embedder, patch-only pos embed, learned CLS), per-tap final norm, and
    the checkpoint's input_conditioner folded into the preprocessing spec;
    weights expected under $MVP_CHECKPOINT_DIR/radio_v2.pth.tar."""
    kw.pop("return_cls", None)
    return build_vit_extractor(
        "radio_v2", output=output, layer=layer,
        return_multilayer=return_multilayer, add_norm=add_norm, **_clean(kw),
    )


def DIFT(model_id="stabilityai/stable-diffusion-2-1", time_step=1, layer=1,
         output="dense", return_multilayer=False, add_norm=False, **kw):
    """reference ``stablediffusion.py`` / ``dift_sd.py`` — one-step noised
    SD-2.1 UNet up-block featurizer (Flax SD stack in ``models/sd/``).
    Weights: ``$MVP_CHECKPOINT_DIR/sd21/{unet,vae,text_encoder}.bin``."""
    from midvision_probe_tpu.models.sd.featurizer import DIFT as _DIFT

    return _DIFT(model_id=model_id, time_step=time_step, output=output,
                 layer=layer, return_multilayer=return_multilayer,
                 add_norm=add_norm)


def Zero123(time_step=1, output="dense", layer=1, return_multilayer=False,
            add_norm=False, **kw):
    """reference ``zero123.py`` — CLIP-image-conditioned SD featurizer with
    guidance-combined up-block features (LDM-naming converters; weights:
    ``$MVP_CHECKPOINT_DIR/zero123/105000.ckpt``)."""
    from midvision_probe_tpu.models.sd.featurizer import Zero123 as _Z

    return _Z(time_step=time_step, output=output, layer=layer,
              return_multilayer=return_multilayer, add_norm=add_norm)


SIMCLR = _resnet_wrapper("simclr_resnet50")
MOCOV2 = _resnet_wrapper("mocov2_resnet50")
SIMSIAM = _resnet_wrapper("simsiam_resnet50")
BYOL = _resnet_wrapper("byol_resnet50")
BARLOWTWINS = _resnet_wrapper("barlowtwins_resnet50")
DENSECL = _resnet_wrapper("densecl_resnet50")
SWAV = _resnet_wrapper("swav_resnet50")
SELAV2 = _resnet_wrapper("selav2_resnet50")
DEEPCLUSTERV2 = _resnet_wrapper("deepclusterv2_resnet50")
CLUSTERFIT = _resnet_wrapper("clusterfit_resnet50")
NPID = _resnet_wrapper("npid_resnet50")
NPID_PLUSPLUS = _resnet_wrapper("npid_plusplus_resnet50")
PIRL = _resnet_wrapper("pirl_resnet50")
JIGSAW = _resnet_wrapper("jigsaw_resnet50")
ROTNET = _resnet_wrapper("rotnet_resnet50")
MoCoV3_RES = _resnet_wrapper("mocov3_resnet50")
DINO_RESNET = _resnet_wrapper("dino_resnet50")

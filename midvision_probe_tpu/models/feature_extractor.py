"""The uniform frozen-feature contract.

Every backbone in the reference exposes the same interface (template
``dino.py:9-210``, ``simclr.py:29-115``): ctor kwargs ``output`` in
{cls, gap, dense, dense-cls}, ``layer``, ``return_multilayer``,
``add_norm``, ``return_cls``; attributes ``feat_dim``, ``patch_size``,
``checkpoint_name``, ``layer``, ``output``, ``arch``; and
``forward(images) -> map | list[map]``.

This module reproduces that contract functionally:

* ``FeatureSpec`` — static metadata (what probes need to build heads),
* ``FeatureExtractor`` — a frozen, jit-compiled feature function bundling a
  Flax core + converted params,
* ``tokens_to_output`` — token→map conversion (``evals/models/utils.py:105``).

Design delta vs the reference: the optional per-tap BatchNorm (``add_norm``,
``dino.py:73-75``) *trains with the probe*, so it lives in the probe-side
``TapNorms`` module (see ``models/probes.py``) instead of inside the frozen
backbone — the extractor stays a pure function.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp

OUTPUTS = ("cls", "gap", "dense", "dense-cls")


def tokens_to_output(
    output_type: str,
    dense_tokens: jnp.ndarray,
    cls_token: jnp.ndarray | None,
    feat_hw: tuple[int, int],
) -> jnp.ndarray:
    """(B, h*w, C) tokens → requested output (NHWC for dense modes).

    Mirrors ``evals/models/utils.py:105-124`` (channel-last here).
    """
    h, w = feat_hw
    B, _, C = dense_tokens.shape
    if output_type == "cls":
        assert cls_token is not None
        return cls_token
    if output_type == "gap":
        return dense_tokens.mean(axis=1)
    if output_type == "dense":
        return dense_tokens.reshape(B, h, w, C)
    if output_type == "dense-cls":
        assert cls_token is not None
        dense = dense_tokens.reshape(B, h, w, C)
        cls = jnp.broadcast_to(cls_token[:, None, None, :], (B, h, w, C))
        return jnp.concatenate([dense, cls], axis=-1)
    raise ValueError(f"unknown output type {output_type!r}")


@dataclasses.dataclass(frozen=True)
class FeatureSpec:
    """Static backbone metadata (the reference's wrapper attributes)."""

    feat_dim: Any  # int, or list[int], or list[(C, hw)] for resnet
    patch_size: int
    multilayers: tuple[int, ...]
    arch: str  # "vit" | "resnet" | "convnext" | ...
    checkpoint_name: str
    output: str
    num_layers: int
    add_norm: bool = False
    image_mean: tuple[float, float, float] = (0.485, 0.456, 0.406)
    image_std: tuple[float, float, float] = (0.229, 0.224, 0.225)

    @property
    def layer(self) -> str:
        return "-".join(str(x) for x in self.multilayers)


def default_vit_multilayers(num_layers: int) -> list[int]:
    """The canonical 4-tap schedule (reference ``dino.py:51-57``)."""
    return [
        num_layers // 4 - 1,
        num_layers // 2 - 1,
        num_layers // 4 * 3 - 1,
        num_layers - 1,
    ]


class FeatureExtractor:
    """A frozen backbone as a pure jitted function.

    Args:
        apply_fn: ``(variables, images_nhwc) -> (tokens_or_maps, aux)`` where
            for ViTs ``aux`` carries grid_hw and prefix-token split.
        variables: frozen param pytree.
        spec: FeatureSpec.
        return_multilayer / layer / output / return_cls: reference contract.
    """

    def __init__(
        self,
        apply_fn: Callable,
        variables: Any,
        spec: FeatureSpec,
        return_multilayer: bool = False,
        return_cls: bool = False,
    ):
        self._apply_fn = apply_fn
        self.variables = variables
        self.spec = spec
        self.return_multilayer = return_multilayer
        self.return_cls = return_cls
        # contract attributes
        self.arch = spec.arch
        self.patch_size = spec.patch_size
        self.checkpoint_name = spec.checkpoint_name
        self.output = spec.output
        self.multilayers = list(spec.multilayers)
        self.layer = spec.layer
        self.feat_dim = spec.feat_dim if return_multilayer else (
            spec.feat_dim[-1] if isinstance(spec.feat_dim, (list, tuple))
            and spec.arch != "resnet" else spec.feat_dim
        )
        # variables are passed to the jit as ARGUMENTS, not captured in the
        # closure: numpy leaves captured by a jit are inlined into the HLO
        # as literals, and through the axon tunnel that makes the compile
        # RPC carry every weight (ViT-B ≈ 345 MB — rejected with HTTP 413
        # by some tunnel instances). As arguments they are runtime inputs;
        # device_variables commits them to the device once.
        self._jitted = jax.jit(self._apply_fn)
        self._device_vars = None

    @property
    def device_variables(self):
        """``variables`` as device-committed jax.Arrays (cached)."""
        if self._device_vars is None:
            self._device_vars = jax.device_put(self.variables)
        return self._device_vars

    def __call__(self, images: jnp.ndarray):
        """images NHWC (normalized) → feature map(s) per the contract."""
        outputs, cls_tokens = self._jitted(self.device_variables, images)
        if self.return_cls and len(outputs) == 1 and cls_tokens is not None:
            return cls_tokens[0]
        return outputs if self.return_multilayer else outputs[-1]

    def features(self, images: jnp.ndarray):
        """Always-multilayer call used by probe training."""
        outputs, _ = self._jitted(self.device_variables, images)
        return outputs

    def extract_kqv(self, images: jnp.ndarray, mode: str = "k"):
        """Dense features from the last tapped attention's k/q/v
        (reference ``return_kqv`` / ``extract_kqv``, ``dino.py:82-138``).

        Returns (B, h, w, C) for mode in {k, q, v} or (B, h, w, 3C) for
        'kqv'. ViT extractors only."""
        assert self.arch == "vit", "kqv extraction is a ViT feature"
        module = getattr(self._apply_fn, "_module", None)
        taps = getattr(self._apply_fn, "_taps", None)
        if module is None:
            raise NotImplementedError("extractor lacks module metadata")
        fixed = getattr(self._apply_fn, "_fixed_input", None)
        if fixed is not None and images.shape[1:3] != (fixed, fixed):
            # mirror the forward path: rel-pos-bias backbones only run at
            # their fixed grid (make_vit_feature_fn; beit_v2.py:255-257)
            from midvision_probe_tpu.ops.image import resize as _resize

            images = _resize(
                images, (fixed, fixed), align_corners=False,
                mode=getattr(self._apply_fn, "_fixed_input_mode",
                             "bilinear"))
        res, state = module.apply(
            self.variables, images, taps=tuple(taps),
            mutable=["intermediates"],
        )
        gh, gw = res["grid_hw"]
        inter = state["intermediates"]
        if "blocks_scan" in inter:
            # scan mode: sown values are stacked along a leading depth
            # axis under blocks_scan/block — index the tapped layer
            q, k, v = (t[max(taps)] for t in
                       inter["blocks_scan"]["block"]["attn"]["qkv_heads"][0])
        else:
            last = f"blocks_{max(taps)}"
            q, k, v = inter[last]["attn"]["qkv_heads"][0]

        def to_map(t):  # (B, H, N, hd) -> (B, h, w, C), patch tokens only
            B, H, N, hd = t.shape
            t = jnp.transpose(t, (0, 2, 1, 3)).reshape(B, N, H * hd)
            return t[:, -gh * gw:].reshape(B, gh, gw, H * hd)

        if mode == "kqv":
            return jnp.concatenate([to_map(k), to_map(q), to_map(v)], axis=-1)
        return to_map({"k": k, "q": q, "v": v}[mode])


def make_vit_feature_fn(
    module,
    taps: Sequence[int],
    output: str,
    num_prefix_tokens: int,
    fixed_input: int | None = None,
    fixed_input_mode: str = "bilinear",
):
    """Build the (variables, images) -> (list[map], list[cls]) fn for a ViT.

    ``fixed_input``: relative-position-bias models cannot change their
    token grid (the bias table is sized for the training grid), so the
    reference force-resizes every input — BEiT-v2 to 224 bilinear
    (``beit_v2.py:255-257``), MiDaS to its 384 native size bicubic
    (``midas_final.py:46-52``; the reference additionally asserts square
    inputs there — we resize non-square inputs too rather than crash).
    Features come out at the fixed grid regardless of input size, exactly
    as in the reference."""

    def apply_fn(variables, images):
        if fixed_input is not None and images.shape[1:3] != (fixed_input,
                                                            fixed_input):
            from midvision_probe_tpu.ops.image import resize

            images = resize(images, (fixed_input, fixed_input),
                            mode=fixed_input_mode, align_corners=False)
        res = module.apply(variables, images, taps=tuple(taps))
        gh, gw = res["grid_hw"]
        num_spatial = gh * gw
        maps, clss = [], []
        for tokens in res["tokens"]:
            cls_tok = tokens[:, 0] if num_prefix_tokens > 0 else None
            spatial = tokens[:, -num_spatial:]
            maps.append(tokens_to_output(output, spatial, cls_tok, (gh, gw)))
            clss.append(cls_tok)
        return maps, clss

    apply_fn._module = module  # metadata for extract_kqv
    apply_fn._taps = tuple(taps)
    apply_fn._fixed_input = fixed_input
    apply_fn._fixed_input_mode = fixed_input_mode
    return apply_fn


def make_resnet_feature_fn(module, taps: Sequence[int]):
    """(variables, images) -> (list[NHWC map], None) for the ResNet trunk.

    CNN features are already spatial; ``output`` modes other than dense are
    computed by callers via pooling (reference percepture eval does
    ``adaptive_avg_pool2d``, ``evaluate_model_percepture.py:105-114``).
    """

    def apply_fn(variables, images):
        maps = module.apply(variables, images, taps=tuple(taps))
        return maps, None

    return apply_fn

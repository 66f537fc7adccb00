"""Probe heads and decoders in Flax (NHWC), trained on frozen features.

Re-implements ``evals/models/probes.py``:

* heads:   ``DepthHead`` (bin-depth linspace expectation / sigmoid depth),
  ``SurfaceNormalHead`` (3 or 4-ch with kappa uncertainty), ``BinaryHead``
  (BatchNorm2d→sigmoid), ``TaskonomyHead``
* decoders: ``Linear`` (``probes.py:417-432``), ``MultiscaleHead``
  (``:435-458``), ``DPT`` 4-level fusion pyramid (``:309-399``) with the
  transformer vs ResNet branch split at ``:315``.

Interpolation semantics are preserved exactly: the bare
``F.interpolate(scale_factor=...)`` calls inside DPT default to *nearest*
(``probes.py:388,396,398``), the CNN-branch fusion upsample is bilinear with
``align_corners=True`` (``:256-258``), and Linear/Multiscale use bilinear
``align_corners=False``.

Also here: ``TapNorms`` — the trainable per-tap BatchNorm the reference
buries inside each frozen wrapper (``add_norm``, ``dino.py:73-75``). It
trains with the probe, so architecturally it belongs probe-side. Delta vs
reference: norms act on the NHWC feature maps (per-channel over batch x
space) rather than on the raw token sequence; for ``dense-cls`` features the
cls half gets its own statistics instead of sharing the patch-token ones.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from midvision_probe_tpu.ops.image import resize
from midvision_probe_tpu.ops.subpixel import NearestUpConv


def _conv(features: int, kernel_size: int, use_bias: bool = True,
          dtype=jnp.float32, name: str | None = None) -> nn.Conv:
    pad = kernel_size // 2
    return nn.Conv(
        features,
        (kernel_size, kernel_size),
        padding=((pad, pad), (pad, pad)),
        use_bias=use_bias,
        dtype=dtype,
        name=name,
    )


class TapNorms(nn.Module):
    """Trainable BatchNorm over each tapped feature map (``add_norm``)."""

    num_taps: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        out = []
        for i, f in enumerate(feats[: self.num_taps]):
            f = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=self.dtype,
                name=f"tap_norm_{i}",
            )(f)
            out.append(f)
        return out


class Linear(nn.Module):
    """Concat multilayer maps → 4x bilinear upsample → 1 conv
    (``probes.py:417-432``)."""

    output_dim: int
    kernel_size: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats):
        if isinstance(feats, (list, tuple)):
            feats = list(feats)
            # ViT taps share one grid; CNN stage taps do not (480² resnet:
            # 120²/60²/30²/15²). The reference Linear head (probes.py:431)
            # only ever sees same-grid inputs; for hetero grids mirror
            # MultiscaleHead (probes.py:446-449): bilinear-resize every tap
            # to the LAST tap's grid before the channel concat. Param tree
            # is unchanged either way (one "conv").
            hw = feats[-1].shape[1:3]
            feats = [f if f.shape[1:3] == hw
                     else resize(f, size=hw, mode="bilinear") for f in feats]
            feats = jnp.concatenate(feats, axis=-1)
        if self.kernel_size == 1:
            # a 1x1 conv is a per-pixel linear map, so it commutes EXACTLY
            # with the (separable, linear) bilinear upsample — run the conv
            # at feature resolution and upsample output_dim channels instead
            # of the 16x-larger concat (e.g. 3072ch at 120² -> 256ch).
            # Mathematically identical to the reference order
            # (``probes.py:431-432``); only float summation order changes.
            feats = _conv(self.output_dim, 1, dtype=self.dtype,
                          name="conv")(feats)
            return resize(feats, scale_factor=4, mode="bilinear")
        feats = resize(feats, scale_factor=4, mode="bilinear")
        return _conv(self.output_dim, self.kernel_size, dtype=self.dtype,
                     name="conv")(feats)


class MultiscaleHead(nn.Module):
    """Per-layer conv → concat at last-layer res → 2-stage conv with 2x/4x
    upsampling (``probes.py:435-458``)."""

    output_dim: int
    hidden_dim: int = 512
    kernel_size: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        k, hd = self.kernel_size, self.hidden_dim
        feats = [
            _conv(hd, k, dtype=self.dtype, name=f"convs_{i}")(f)
            for i, f in enumerate(feats)
        ]
        h, w = feats[-1].shape[1:3]
        feats = [resize(f, (h, w), mode="bilinear") for f in feats]
        x = nn.relu(jnp.concatenate(feats, axis=-1))

        x = resize(x, scale_factor=2, mode="bilinear")
        # conv_mid: 3 layers conv-relu-conv-relu-conv (make_conv num_layers=3)
        x = _conv(hd, k, dtype=self.dtype, name="conv_mid_0")(x)
        x = nn.relu(x)
        x = _conv(hd, k, dtype=self.dtype, name="conv_mid_1")(x)
        x = nn.relu(x)
        x = _conv(hd, k, dtype=self.dtype, name="conv_mid_2")(x)
        x = nn.relu(x)
        x = resize(x, scale_factor=4, mode="bilinear")
        # conv_out: 2 layers conv-relu-conv
        x = _conv(hd, k, dtype=self.dtype, name="conv_out_0")(x)
        x = nn.relu(x)
        return _conv(self.output_dim, k, dtype=self.dtype, name="conv_out_1")(x)


class ResidualConvUnit(nn.Module):
    """``probes.py:263-306``. Transformer branch: conv-relu-conv-relu + x;
    CNN branch: relu-conv-relu-conv + x.

    ``input_up``: the caller hands ``x`` at 1/input_up resolution and this
    unit computes ``RCU(nearest_up(x, input_up))`` exactly — conv1 runs as
    the folded phase conv (``ops/subpixel``, k=3 only) and the residual adds
    the (cheap) upsampled input. Only valid on the transformer branch, where
    the DPT taps are nearest-2x upsamples of the patch grid."""

    features: int
    kernel_size: int = 3
    is_transformer: bool = False
    input_up: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        f, k = self.features, self.kernel_size
        if self.is_transformer:
            if self.input_up > 1 and k == 3:
                h = NearestUpConv(f, up=self.input_up, dtype=self.dtype,
                                  name="conv1")(x)
                x = resize(x, scale_factor=self.input_up, mode="nearest")
            else:
                if self.input_up > 1:  # non-3x3: fold unsupported, upsample
                    x = resize(x, scale_factor=self.input_up, mode="nearest")
                h = _conv(f, k, dtype=self.dtype, name="conv1")(x)
            h = nn.relu(h)
            h = _conv(f, k, dtype=self.dtype, name="conv2")(h)
            h = nn.relu(h)
            return h + x
        assert self.input_up == 1
        # CNN branch residual is relu(x), NOT x: the reference's (and
        # original MiDaS') ``nn.ReLU(inplace=True)`` mutates x in
        # ``out = self.relu(x)``, so ``out + x`` adds the rectified input
        # (probes.py:291-306). Runtime behavior, so replicated — found by
        # the reference-as-oracle test (tests/test_reference_oracle.py).
        x = nn.relu(x)
        h = _conv(f, 3, dtype=self.dtype, name="conv1")(x)
        h = nn.relu(h)
        h = _conv(f, 3, dtype=self.dtype, name="conv2")(h)
        return h + x


class FeatureFusionBlock(nn.Module):
    """``probes.py:215-260``.

    ``input_up``: ``x`` arrives at 1/input_up resolution (the DPT taps'
    nearest-2x upsample is deferred into the first RCU conv — exact, see
    ``ResidualConvUnit.input_up``); ``skip_x`` is always full resolution."""

    features: int
    kernel_size: int = 3
    with_skip: bool = True
    is_transformer: bool = False
    input_up: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, skip_x=None):
        if skip_x is not None and self.with_skip:
            x = ResidualConvUnit(
                self.features, self.kernel_size, self.is_transformer,
                input_up=self.input_up, dtype=self.dtype, name="resConfUnit1",
            )(x) + skip_x
            x = ResidualConvUnit(
                self.features, self.kernel_size, self.is_transformer,
                dtype=self.dtype, name="resConfUnit2",
            )(x)
        else:
            x = ResidualConvUnit(
                self.features, self.kernel_size, self.is_transformer,
                input_up=self.input_up, dtype=self.dtype, name="resConfUnit2",
            )(x)
        if not self.is_transformer:
            x = resize(x, scale_factor=2, mode="bilinear", align_corners=True)
        return x


class DPT(nn.Module):
    """4-level DPT fusion decoder (``probes.py:309-399``).

    ``resnet_mode`` selects the CNN branch (3x3 no-bias input convs, fusion
    upsampling) vs the transformer branch (1x1 convs, nearest 2x/4x/2x)."""

    output_dim: int
    hidden_dim: int = 512
    kernel_size: int = 3
    resnet_mode: bool = False
    # callers that apply a per-pixel reduction to the decoder output (e.g.
    # bindepth's 256-bin expectation) can skip the trailing nearest 2x here
    # and upsample their (cheap, low-channel) result instead — nearest
    # resize commutes exactly with per-pixel ops, and upsampling 256
    # channels at 480² costs ~4 GB of HBM traffic per batch-32 step
    final_resize: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        assert len(feats) == 4
        hd, k = self.hidden_dim, self.kernel_size
        rn = self.resnet_mode
        if rn:
            feats = [
                _conv(hd, 3, use_bias=False, dtype=self.dtype, name=f"conv_{i}")(f)
                for i, f in enumerate(feats)
            ]
        else:
            feats = [
                _conv(hd, 1, dtype=self.dtype, name=f"conv_{i}")(f)
                for i, f in enumerate(feats)
            ]
            # bare F.interpolate(scale_factor=2) == nearest (probes.py:388).
            # The upsample is NOT materialized here: each fusion block's
            # first RCU conv reads the piecewise-constant map via the folded
            # phase conv (exact, 16/36 of the FLOPs — see ops/subpixel) and
            # reconstitutes the 2x residual internally (input_up=2 below).

        up = 1 if rn else 2
        fuse = lambda i, with_skip: FeatureFusionBlock(  # noqa: E731
            hd, k, with_skip=with_skip, is_transformer=not rn,
            input_up=up, dtype=self.dtype, name=f"ref_{i}",
        )
        out = fuse(3, False)(feats[3], None)
        out = fuse(2, True)(feats[2], out)
        out = fuse(1, True)(feats[1], out)
        out = fuse(0, True)(feats[0], out)

        if not rn:
            # fold the nearest 4x into out_conv_0 (exact — see ops/subpixel):
            # the 3x3 conv on the piecewise-constant upsampled map costs
            # ~272 GF/img at 240²; the folded form runs 9 small convs at 60²
            # for ~17% of the FLOPs with an identical param pytree.
            out = NearestUpConv(hd, up=4, dtype=self.dtype,
                                name="out_conv_0")(out)
        else:
            out = _conv(hd, 3, dtype=self.dtype, name="out_conv_0")(out)
        out = nn.relu(out)
        out = _conv(self.output_dim, 3, dtype=self.dtype, name="out_conv_1")(out)
        if self.final_resize:
            out = resize(out, scale_factor=2, mode="nearest")
        return out


def make_decoder(head_type: str, feat_dim, output_dim: int, hidden_dim: int,
                 kernel_size: int, dtype=jnp.float32,
                 final_resize: bool = True) -> nn.Module:
    """feat_dim: int | list[int] | list[(C, hw)] (resnet).

    ``final_resize=False`` (DPT only) lets per-pixel prediction heads defer
    the decoder's trailing nearest 2x until after their channel reduction."""
    resnet_mode = isinstance(feat_dim, (list, tuple)) and feat_dim and isinstance(
        feat_dim[0], (list, tuple)
    )
    if head_type == "linear":
        return Linear(output_dim, kernel_size, dtype=dtype)
    if head_type == "multiscale":
        return MultiscaleHead(output_dim, hidden_dim, kernel_size, dtype=dtype)
    if head_type == "dpt":
        return DPT(output_dim, hidden_dim, kernel_size, resnet_mode=resnet_mode,
                   final_resize=final_resize, dtype=dtype)
    raise ValueError(f"Unknown head type: {head_type}")


class DepthHead(nn.Module):
    """``probes.py:119-157`` + bin/sigmoid prediction (``:160-212``)."""

    feat_dim: Any
    head_type: str = "multiscale"
    min_depth: float = 0.001
    max_depth: float = 10.0
    prediction_type: str = "sigdepth"
    hidden_dim: int = 512
    kernel_size: int = 1
    dtype: Any = jnp.float32

    @property
    def name_tag(self) -> str:
        return f"{self.prediction_type}_{self.head_type}_k{self.kernel_size}"

    @nn.compact
    def __call__(self, feats):
        output_dim = 256 if self.prediction_type == "bindepth" else 1
        # Depth prediction is per-pixel (bin expectation / sigmoid), so it
        # commutes EXACTLY with the DPT decoder's trailing nearest 2x
        # upsample. Reduce at the decoder resolution and upsample the
        # 1-channel result instead — bit-identical to the reference order
        # (conv → resize → binning, reference probes.py:160-212) but skips
        # a 256-channel 480² materialization (~4 GB HBM/step at batch 32).
        defer = self.head_type == "dpt"
        head = make_decoder(self.head_type, self.feat_dim, output_dim,
                            self.hidden_dim, self.kernel_size, self.dtype,
                            final_resize=not defer)
        x = head(feats)
        if self.prediction_type == "bindepth":
            bins = jnp.linspace(self.min_depth, self.max_depth, 256)
            prob = nn.relu(x) + 0.1
            prob = prob / prob.sum(axis=-1, keepdims=True)
            depth = jnp.einsum("bhwk,k->bhw", prob, bins,
                               precision=jax.lax.Precision.HIGHEST,
                               )[..., None]  # parity-sensitive reduce
        elif self.prediction_type == "sigdepth":
            depth = nn.sigmoid(x)
            depth = self.min_depth + depth * (self.max_depth - self.min_depth)
        else:
            raise ValueError(self.prediction_type)
        if defer:
            depth = resize(depth, scale_factor=2, mode="nearest")
        return depth  # NHWC with C=1


class SurfaceNormalHead(nn.Module):
    """``probes.py:86-116``."""

    feat_dim: Any
    head_type: str = "multiscale"
    uncertainty_aware: bool = False
    hidden_dim: int = 512
    kernel_size: int = 1
    dtype: Any = jnp.float32

    @property
    def name_tag(self) -> str:
        name = f"snorm_{self.head_type}_k{self.kernel_size}"
        return f"{name}_UA" if self.uncertainty_aware else name

    @nn.compact
    def __call__(self, feats):
        output_dim = 4 if self.uncertainty_aware else 3
        head = make_decoder(self.head_type, self.feat_dim, output_dim,
                            self.hidden_dim, self.kernel_size, self.dtype)
        return head(feats)


class _SigmoidHead(nn.Module):
    """Shared body of BinaryHead / TaskonomyHead (``probes.py:7-84``)."""

    feat_dim: Any
    head_type: str = "dpt"
    output_dim: int = 1
    pred_type: str = "sigmoid"
    hidden_dim: int = 512
    kernel_size: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        head = make_decoder(self.head_type, self.feat_dim, self.output_dim,
                            self.hidden_dim, self.kernel_size, self.dtype)
        x = head(feats)
        if self.pred_type == "sigmoid":
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name="batch_norm",
            )(x)
            return nn.sigmoid(x)
        if self.pred_type == "tanh":
            return nn.tanh(x)
        return x


class BinaryHead(_SigmoidHead):
    """``probes.py:7-44`` (objectness probe). Default ``output_dim=2``
    matches the reference ctor (``probes.py:15``); the objectness config
    pins 1 on both sides (``configs/probe/binaryhead.yaml``)."""

    output_dim: int = 2


class TaskonomyHead(_SigmoidHead):
    """``probes.py:46-84``."""

"""Flax ResNet-50 with 5 stage taps — the SSL ResNet zoo core.

All 17 ResNet-50 SSL wrappers in the reference (SimCLR, MoCo v2, SwAV, BYOL,
Barlow Twins, DenseCL, ..., template ``simclr.py:29-115``) share one
torchvision ``resnet50`` trunk and tap 5 stages:
stem(conv+bn+relu+maxpool), layer1..layer4 (``simclr.py:53-66``). This module
is the torchvision-bottleneck-v1 architecture in NHWC with those taps.

Inference-only: BatchNorm always uses running statistics (backbones are
frozen, ``evals/models/util.py:67``).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

STAGE_BLOCKS = (3, 4, 6, 3)
STAGE_WIDTHS = (256, 512, 1024, 2048)
# (channels, spatial at 480 input) per tap — reference `simclr.py:69-75`
RESNET50_FEAT_DIMS = [(64, 240), (256, 120), (512, 60), (1024, 30), (2048, 15)]


class Bottleneck(nn.Module):
    width: int  # bottleneck (inner) width
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        out_w = self.width * 4
        bn = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=True, momentum=0.9, epsilon=1e-5, dtype=d, name=name
        )
        h = nn.Conv(self.width, (1, 1), use_bias=False, dtype=d, name="conv1")(x)
        h = nn.relu(bn("bn1")(h))
        h = nn.Conv(
            self.width,
            (3, 3),
            strides=(self.stride, self.stride),
            padding=((1, 1), (1, 1)),
            use_bias=False,
            dtype=d,
            name="conv2",
        )(h)
        h = nn.relu(bn("bn2")(h))
        h = nn.Conv(out_w, (1, 1), use_bias=False, dtype=d, name="conv3")(h)
        h = bn("bn3")(h)
        if self.downsample:
            x = nn.Conv(
                out_w,
                (1, 1),
                strides=(self.stride, self.stride),
                use_bias=False,
                dtype=d,
                name="downsample_conv",
            )(x)
            x = bn("downsample_bn")(x)
        return nn.relu(x + h)


class ResNet50(nn.Module):
    """Returns the 5 tapped NHWC stage outputs selected by ``taps``."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray, taps: Sequence[int] = (0, 1, 2, 3, 4)):
        d = self.dtype
        x = images.astype(d)
        x = nn.Conv(
            64,
            (7, 7),
            strides=(2, 2),
            padding=((3, 3), (3, 3)),
            use_bias=False,
            dtype=d,
            name="conv1",
        )(x)
        x = nn.BatchNorm(
            use_running_average=True, momentum=0.9, epsilon=1e-5, dtype=d, name="bn1"
        )(x)
        x = nn.relu(x)
        # torch MaxPool2d(kernel=3, stride=2, padding=1)
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")

        outputs = {0: x}
        width = 64
        for stage, num_blocks in enumerate(STAGE_BLOCKS):
            for b in range(num_blocks):
                stride = 2 if (stage > 0 and b == 0) else 1
                x = Bottleneck(
                    width,
                    stride=stride,
                    downsample=(b == 0),
                    dtype=d,
                    name=f"layer{stage + 1}_{b}",
                )(x)
            outputs[stage + 1] = x
            width *= 2

        return [outputs[i] for i in taps]

"""Stable-Diffusion 2.1 feature stack (reference ``evals/models/dift_sd.py``
+ ``stablediffusion.py``): VAE encoder → DDPM one-step noising → UNet with
up-block feature taps, conditioned on CLIP text embeddings.

Flax implementations with converters from the diffusers checkpoint layout;
the reference's live ``breakpoint()`` at ``dift_sd.py:161`` is, naturally,
not reproduced."""

from midvision_probe_tpu.models.sd.unet import UNetConfig, UNet2DCondition  # noqa: F401
from midvision_probe_tpu.models.sd.vae import VAEEncoder, VAEEncoderConfig  # noqa: F401
from midvision_probe_tpu.models.sd.text_encoder import (  # noqa: F401
    CLIPTextConfig,
    CLIPTextEncoder,
)

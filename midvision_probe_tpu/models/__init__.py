"""Model layer: backbone cores, the uniform feature contract, probes, zoo.

Replaces the reference's ~45 per-checkpoint torch wrapper classes
(``evals/models/*.py``) with:

* one generic Flax ``ViT`` covering cls/register tokens, learned/sincos
  pos-embeds with bicubic resize, LayerScale, relative-position bias,
  windowed attention and 2D RoPE variants,
* one Flax ``ResNet50`` with 5 stage taps,
* ``FeatureExtractor`` — the uniform ``output/layer/return_multilayer/
  add_norm`` contract (reference template: ``dino.py:9-210``),
* ``probes`` — DepthHead / SurfaceNormalHead / BinaryHead / TaskonomyHead
  over Linear / Multiscale / DPT decoders (``evals/models/probes.py``),
* ``zoo`` — the declarative registry of checkpoint entries + converters.
"""

from midvision_probe_tpu.models.feature_extractor import (  # noqa: F401
    FeatureExtractor,
    FeatureSpec,
    tokens_to_output,
)
from midvision_probe_tpu.models.resnet import ResNet50  # noqa: F401
from midvision_probe_tpu.models.vit import ViT, ViTConfig  # noqa: F401

"""PyTorch state_dict → Flax pytree checkpoint conversion.

The reference ports each SSL checkpoint by hand in scratch notebooks
(``evals/models/models_jupyter_notebook/`` — SURVEY §2.5) and per-wrapper
state-dict surgery (VISSL prefix stripping ``simclr.py:17-24``, EVA/PixMIM
remap ``eva.py:13-21``, BEiT key remapping ``impl_utils/beit_state_dict.py``).
Here conversion is a first-class library:

* ``convert_vit_timm`` — timm/DINO/iBOT/DeiT-layout ViTs (fused qkv),
* ``convert_vit_hf``   — HuggingFace ViT/ViTMAE layout (split q/k/v),
* ``convert_resnet50`` — torchvision-layout ResNet-50 trunks,
* ``remap``            — source-specific key remap tables (VISSL, MMSelfSup,
  MoCo momentum-encoder surgery, ...).

Golden-activation parity tests live in ``tests/test_convert.py``.
"""

from midvision_probe_tpu.models.convert.vit_convert import (  # noqa: F401
    convert_vit_hf,
    convert_vit_timm,
)
from midvision_probe_tpu.models.convert.resnet_convert import (  # noqa: F401
    convert_resnet50,
)
from midvision_probe_tpu.models.convert.remap import (  # noqa: F401
    prepare_state_dict,
)

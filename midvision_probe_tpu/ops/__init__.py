"""TPU compute primitives: Pallas kernels + XLA-friendly tensor ops.

Replaces the reference's native/kernel layer:

* ``matching`` — Pallas tiled L2/cosine similarity + top-2 kNN, replacing
  faiss ``GpuIndexFlatL2`` (reference ``evals/utils/correspondence.py:14-23``).
* ``rope2d``  — Pallas fused 2D rotary embedding, replacing the cuRoPE2D CUDA
  extension (reference ``evals/models/croco_models/curope/``).
* ``image``   — torch-semantics resize / grid_sample expressed as separable
  weight-matrix matmuls (MXU-friendly, statically shaped).
"""

from midvision_probe_tpu.ops.image import (  # noqa: F401
    center_padding,
    grid_sample,
    resize,
)
from midvision_probe_tpu.ops.matching import knn2, topk_matches  # noqa: F401
from midvision_probe_tpu.ops.rope2d import rope_2d  # noqa: F401

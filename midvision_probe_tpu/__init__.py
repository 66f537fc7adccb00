"""midvision_probe_tpu — a TPU-native (JAX/Flax/XLA/Pallas) probing harness.

A from-scratch rebuild of the capabilities of
``UVA-Computer-Vision-Lab/midvision-probe`` (arXiv 2411.17474): a zoo of frozen
self-supervised vision backbones behind one uniform feature-extraction
contract, dense probes (depth / surface normals / generic objectness) trained
on frozen features, and correspondence / perceptual / object-discovery
evaluations — all redesigned for TPU:

* single-controller JAX over a ``jax.sharding.Mesh`` instead of
  ``mp.spawn`` + DDP/NCCL (reference ``train_depth.py:64-73``),
* one generic Flax ViT / ResNet-50 with multilayer taps instead of ~45
  copy-pasted torch wrappers (reference ``evals/models/*.py``),
* a Pallas tiled similarity/top-2 kernel instead of faiss GpuIndexFlatL2
  (reference ``evals/utils/correspondence.py:14-23``),
* a Pallas fused 2D-RoPE kernel instead of the cuRoPE2D CUDA extension
  (reference ``evals/models/croco_models/curope/``).
"""

__version__ = "0.1.0"

from midvision_probe_tpu.config import compose, instantiate  # noqa: F401

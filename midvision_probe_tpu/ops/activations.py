"""Dtype-aware activations.

The reference's torch ``nn.GELU()`` default is the erf-exact form; every
parity test here therefore compares against exact GELU in float32. But on
TPU the erf lowering is a long VPU transcendental chain that XLA cannot
fuse away: on the ViT-B/16 @ 480x640 bf16 bench the exact GELU costs
25 ms/step (161 → 136 ms with it removed) while the tanh approximation is
measurably *free* (identical step time to an identity activation — it
fuses into the surrounding matmul pipeline).

The tanh form's max absolute error vs exact GELU is ~3e-4 (at |x| ≈ 2),
far below bfloat16's own rounding step (~8e-3 at magnitude 1). So: erf
when computing in float32 (parity), tanh when computing in half precision
(speed at no representable accuracy cost).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    """GELU matching torch ``nn.GELU()`` semantics at the compute dtype.

    float32/float64 inputs use the erf-exact form; bfloat16/float16 use
    the tanh approximation, whose error is below half-precision rounding.
    """
    approximate = x.dtype in (jnp.bfloat16, jnp.float16)
    return jax.nn.gelu(x, approximate=approximate)

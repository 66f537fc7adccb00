"""Task utilities: losses, metrics, correspondence, SE(3), schedules.

Functional jnp re-implementations of ``evals/utils/`` — pure, jittable,
mask-based (no boolean indexing / dynamic shapes)."""

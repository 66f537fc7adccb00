"""Optimizer schedules and param grouping (reference ``evals/utils/optim.py``)
built on optax."""

from __future__ import annotations

import math

import optax


def cosine_decay_linear_warmup_factor(
    current_step: float, max_step: float, warmup_step: float,
    min_factor: float = 0.01,
) -> float:
    """LR *factor* schedule (``optim.py:124-133``): linear warmup from
    ``min_factor`` to 1, then ``cos(0.5 * rel * pi)`` decay down to
    ``min_factor`` at the end (note: cos over a quarter period, not the
    usual half — preserved exactly). Delegates to the optax schedule so
    the transcription-parity test covers the code training actually
    runs."""
    assert max_step > warmup_step
    return float(cosine_decay_linear_warmup(
        1.0, max_step, warmup_step, min_factor)(current_step))


def cosine_decay_linear_warmup(
    base_lr: float, max_step: int, warmup_step: float, min_factor: float = 0.01
) -> optax.Schedule:
    """optax form of the factor schedule above, scaled by ``base_lr``.

    ``rel`` is clamped at 1: the reference's LambdaLR steps exactly
    ``max_step`` times so its unclamped cosine never runs past the
    quarter period, but here a caller whose loader yields more batches
    than the ``n_steps`` estimate would otherwise push the factor
    NEGATIVE (silent gradient ascent) — latent-hazard policy: clamp and
    document."""

    def schedule(count):
        import jax.numpy as jnp

        range_factor = 1 - min_factor
        warm = range_factor * (count / jnp.maximum(warmup_step, 1e-8)) + min_factor
        rel = (count - warmup_step) / (max_step - warmup_step)
        rel = jnp.minimum(rel, 1.0)
        decay = range_factor * jnp.cos(0.5 * rel * jnp.pi) + min_factor
        return base_lr * jnp.where(count <= warmup_step, warm, decay)

    return schedule


def get_linear_scaled_lr(base_lr, batch_size, base_batch_size):
    """Linear LR scaling rule (``optim.py:105-121``)."""
    return base_lr * batch_size / base_batch_size


def make_adamw(
    lr_schedule: optax.Schedule, weight_decay: float = 0.01,
    b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
) -> optax.GradientTransformation:
    """AdamW matching the reference trainer's bare ``torch.optim.AdamW``
    (``train_depth.py:624-634``) — torch's DEFAULT weight_decay is 0.01
    (optax's is 1e-4, a silent 100x regularization gap if used raw)."""
    return optax.adamw(lr_schedule, b1=b1, b2=b2, eps=eps,
                       weight_decay=weight_decay)

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
    usual half — preserved exactly)."""
    assert max_step > warmup_step
    range_factor = 1 - min_factor
    if current_step <= warmup_step:
        return range_factor * (current_step / warmup_step) + min_factor
    rel = (current_step - warmup_step) / (max_step - warmup_step)
    return range_factor * math.cos(0.5 * rel * math.pi) + min_factor


def cosine_decay_linear_warmup(
    base_lr: float, max_step: int, warmup_step: float, min_factor: float = 0.01
) -> optax.Schedule:
    """optax schedule applying the factor above to ``base_lr``."""

    def schedule(count):
        import jax.numpy as jnp

        range_factor = 1 - min_factor
        warm = range_factor * (count / jnp.maximum(warmup_step, 1e-8)) + min_factor
        rel = (count - warmup_step) / (max_step - warmup_step)
        decay = range_factor * jnp.cos(0.5 * rel * jnp.pi) + min_factor
        return base_lr * jnp.where(count <= warmup_step, warm, decay)

    return schedule


def get_linear_scaled_lr(base_lr, batch_size, base_batch_size):
    """Linear LR scaling rule (``optim.py:105-121``)."""
    return base_lr * batch_size / base_batch_size


def make_adamw(
    lr_schedule: optax.Schedule, weight_decay: float = 0.0,
    b1: float = 0.9, b2: float = 0.999,
) -> optax.GradientTransformation:
    """AdamW matching the reference trainer's torch.optim.AdamW defaults
    (``train_depth.py:624-634``)."""
    return optax.adamw(lr_schedule, b1=b1, b2=b2, weight_decay=weight_decay)

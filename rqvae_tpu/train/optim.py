"""Optimizers and LR schedules.

Parity: AdamW with the reference's defaults (train_rqvae.py:95-99,
train_decoder.py:151-155: torch AdamW -> betas (0.9, 0.999), eps 1e-8,
decoupled weight decay) and the inverse-square-root schedule
(modules/scheduler/inv_sqrt.py:5-15: constant for ``warmup_steps`` then
lr * sqrt(warmup / step)).
"""
from __future__ import annotations

import jax.numpy as jnp
import optax


def inv_sqrt_schedule(base_lr: float, warmup_steps: int) -> optax.Schedule:
    """Constant LR through warmup, then base_lr * sqrt(warmup/step).

    The reference scheduler steps AFTER each optimizer step with
    step = last_epoch + 1, so optimizer step s (0-based) uses scale for
    s; we mirror that: scale(s) = 1 for s <= warmup else sqrt(warmup/s).
    """

    def schedule(count):
        step = jnp.maximum(count, 1)
        scale = jnp.where(
            count <= warmup_steps,
            1.0,
            jnp.sqrt(warmup_steps / step),
        )
        return base_lr * scale

    return schedule


def adamw(
    learning_rate,
    weight_decay: float = 0.01,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    return optax.adamw(
        learning_rate=learning_rate, b1=b1, b2=b2, eps=eps,
        weight_decay=weight_decay,
    )

"""LR schedule + optimizer factory (spec: utils/scheduler.py:8-67,
training/lightning_module.py:494-511, train.py:288).
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def cosine_warmup_schedule(
    base_lr: float,
    warmup: int,
    max_iters: int,
    min_lr_factor: float = 0.001,
) -> optax.Schedule:
    """Cosine decay × linear warmup with a relative floor.

    Matches CosineWarmupScheduler.get_lr_factor exactly, including the
    +1 step offset and the warmup *multiplying* the cosine (not preceding
    it) and the floor applied after both.
    """

    warmup = max(int(warmup), 1)
    max_iters = max(int(max_iters), 1)

    def schedule(step):
        e = jnp.asarray(step, jnp.float32) + 1.0
        factor = 0.5 * (1.0 + jnp.cos(jnp.pi * e / max_iters))
        factor = jnp.where(e <= warmup, factor * e / warmup, factor)
        factor = jnp.maximum(factor, min_lr_factor)
        return base_lr * factor

    return schedule


def make_optimizer(
    learning_rate: float,
    warmup: int,
    num_steps: int,
    weight_decay: float = 1e-4,
    b1: float = 0.9,
    b2: float = 0.95,
    grad_clip: float = 1.0,
    accumulate_grad_batches: int = 1,
) -> optax.GradientTransformation:
    """AdamW(wd 1e-4, betas .9/.95) + global-norm clip 1.0 + cosine warmup.

    ``accumulate_grad_batches`` wraps the chain in optax.MultiSteps —
    the reference's Trainer(accumulate_grad_batches=...) (train.py:289,
    README.md:508: preserve effective batch under memory limits).
    """
    opt = optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(
            learning_rate=cosine_warmup_schedule(learning_rate, warmup, num_steps),
            b1=b1,
            b2=b2,
            weight_decay=weight_decay,
        ),
    )
    if accumulate_grad_batches > 1:
        opt = optax.MultiSteps(opt, every_k_schedule=accumulate_grad_batches)
    return opt

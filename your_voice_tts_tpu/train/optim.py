"""Optimizer stack (reference utils/radam.py + utils/training.py).

RAdam + Noam warmup + global-norm clipping + nonfinite-step skipping
(the reference's `check_update` skips steps with inf/NaN grad norms),
composed from optax transforms.
"""

from __future__ import annotations

import optax

from ..config import TrainingConfig


def noam_schedule(lr: float, warmup_steps: int = 4000) -> optax.Schedule:
    """Noam LR: lr * warmup^0.5 * min(step * warmup^-1.5, step^-0.5)."""
    import jax.numpy as jnp

    def schedule(step):
        s = step + 1.0
        return lr * warmup_steps ** 0.5 * jnp.minimum(
            s * warmup_steps ** -1.5, s ** -0.5)

    return schedule


def build_optimizer(cfg: TrainingConfig) -> optax.GradientTransformation:
    if cfg.noam_schedule:
        lr = noam_schedule(cfg.lr, cfg.warmup_steps)
    else:
        lr = cfg.lr
    chain = []
    if cfg.grad_clip and cfg.grad_clip > 0:
        chain.append(optax.clip_by_global_norm(cfg.grad_clip))
    chain.append(optax.scale_by_radam())
    if cfg.wd and cfg.wd > 0:
        chain.append(optax.add_decayed_weights(cfg.wd))
    chain.append(optax.scale_by_learning_rate(lr))
    opt = optax.chain(*chain)
    # reference check_update: skip the update entirely on inf/NaN grads
    return optax.apply_if_finite(opt, max_consecutive_errors=10_000)

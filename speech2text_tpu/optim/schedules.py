"""LR schedules as optax-style callables step → scale factor.

Parity with reference optimizer/optim_setup.py:
- WarmupLR (:39-80): lr · warmup^0.5 · min(step^-0.5, step·warmup^-1.5)
- Eden (:83-135): icefall's (step, epoch)-indexed schedule; here epoch is
  derived from steps_per_epoch so everything stays step-indexed
- CosineWarmup (:20-36), CosineAnnealing, NoamHoldAnnealing (:138-361)

All return the absolute LR at `step` (not a multiplier), matching how the
reference schedulers wrap a base lr.
"""

from __future__ import annotations

import jax.numpy as jnp


def WarmupLRSchedule(lr: float, warmup_steps: int = 25000):
    def schedule(step):
        s = jnp.maximum(jnp.asarray(step, jnp.float32), 1.0)
        return (lr * warmup_steps ** 0.5
                * jnp.minimum(s ** -0.5, s * warmup_steps ** -1.5))
    return schedule


def EdenSchedule(lr: float, lr_batches: float = 5000.0,
                 lr_epochs: float = 6.0, steps_per_epoch: int = 10000,
                 warmup_batches: float = 500.0):
    """Eden: lr · ((step²+B²)/B²)^-0.25 · ((epoch²+E²)/E²)^-0.25 · warmup."""
    def schedule(step):
        s = jnp.asarray(step, jnp.float32)
        epoch = s / steps_per_epoch
        f_step = ((s ** 2 + lr_batches ** 2) / lr_batches ** 2) ** -0.25
        f_epoch = ((epoch ** 2 + lr_epochs ** 2) / lr_epochs ** 2) ** -0.25
        warmup = jnp.minimum(s / warmup_batches, 1.0) * 0.5 + 0.5
        return lr * f_step * f_epoch * warmup
    return schedule


def CosineWarmupSchedule(lr: float, warmup_steps: int, total_steps: int,
                         min_lr: float = 0.0):
    def schedule(step):
        s = jnp.asarray(step, jnp.float32)
        warm = lr * s / jnp.maximum(warmup_steps, 1)
        progress = jnp.clip((s - warmup_steps)
                            / jnp.maximum(total_steps - warmup_steps, 1),
                            0.0, 1.0)
        cos = min_lr + 0.5 * (lr - min_lr) * (1 + jnp.cos(jnp.pi * progress))
        return jnp.where(s < warmup_steps, warm, cos)
    return schedule


def CosineAnnealingSchedule(lr: float, total_steps: int, min_lr: float = 0.0):
    return CosineWarmupSchedule(lr, 0, total_steps, min_lr)


def NoamHoldAnnealingSchedule(lr: float, warmup_steps: int, hold_steps: int,
                              total_steps: int, decay_rate: float = 0.5,
                              min_lr: float = 0.0):
    """SqueezeFormer Noam-Hold-Annealing (reference optim_setup.py:138-361):
    linear warmup → hold → polynomial decay with exponent decay_rate."""
    def schedule(step):
        s = jnp.asarray(step, jnp.float32)
        warm = lr * s / jnp.maximum(warmup_steps, 1)
        hold_end = warmup_steps + hold_steps
        decay_span = jnp.maximum(total_steps - hold_end, 1)
        progress = jnp.clip((s - hold_end) / decay_span, 0.0, 1.0)
        decayed = (lr - min_lr) * (1.0 - progress) ** (1.0 / decay_rate) \
            + min_lr
        out = jnp.where(s < warmup_steps, warm,
                        jnp.where(s < hold_end, lr, decayed))
        return out
    return schedule

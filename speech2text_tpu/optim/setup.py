"""OptimSetup: (optimizer, schedule) factory from the YAML `optim_setup`
section (reference optimizer/optim_setup.py:364-386 enum parity:
OptimizerPool{Adam, AdamW, ScaledAdam} × LrSchedulerPool{Warmup,
Cosine_Annealing, Cosine_Warmup, Noam_Hold_Annealing, Eden})."""

from __future__ import annotations

from typing import Callable, Tuple

import optax

from .scaled_adam import scaled_adam
from .schedules import (CosineAnnealingSchedule, CosineWarmupSchedule,
                        EdenSchedule, NoamHoldAnnealingSchedule,
                        WarmupLRSchedule)


def _build_schedule(kind: str, lr: float, cfg: dict) -> Callable:
    if kind == "Warmup":
        return WarmupLRSchedule(lr, warmup_steps=cfg.get("warmup_steps",
                                                         25000))
    if kind == "Eden":
        return EdenSchedule(
            lr, lr_batches=cfg.get("lr_batches", 5000.0),
            lr_epochs=cfg.get("lr_epochs", 6.0),
            steps_per_epoch=cfg.get("steps_per_epoch", 10000),
            warmup_batches=cfg.get("warmup_batches", 500.0))
    if kind == "Cosine_Warmup":
        return CosineWarmupSchedule(
            lr, warmup_steps=cfg.get("warmup_steps", 1000),
            total_steps=cfg.get("total_steps", 100000),
            min_lr=cfg.get("min_lr", 0.0))
    if kind == "Cosine_Annealing":
        return CosineAnnealingSchedule(
            lr, total_steps=cfg.get("total_steps", cfg.get("T_max", 100000)),
            min_lr=cfg.get("min_lr", cfg.get("eta_min", 0.0)))
    if kind == "Noam_Hold_Annealing":
        return NoamHoldAnnealingSchedule(
            lr, warmup_steps=cfg.get("warmup_steps", 1000),
            hold_steps=cfg.get("hold_steps", 0),
            total_steps=cfg.get("total_steps", 100000),
            decay_rate=cfg.get("decay_rate", 0.5),
            min_lr=cfg.get("min_lr", 0.0))
    raise ValueError(f"unknown lr scheduler {kind}")


def OptimSetup(config: dict) -> Tuple[optax.GradientTransformation, Callable]:
    """config = the YAML `optim_setup` section. Returns (optax tx, schedule).

    The schedule is returned separately so the train loop can log LR
    (reference uses a LearningRateMonitor callback, build_task.py:105).
    """
    opt_cfg = config["optimizer"]
    opt_type = opt_cfg["type"]
    opt_kwargs = dict(opt_cfg.get("config", {}))
    lr = float(opt_kwargs.pop("lr", 1e-3))

    sched_cfg = config.get("lr_scheduler", {})
    sched_type = sched_cfg.get("type", "Warmup")
    schedule = _build_schedule(sched_type, lr, sched_cfg.get("config", {}))

    if opt_type == "Adam":
        tx = optax.adam(learning_rate=schedule,
                        b1=opt_kwargs.get("betas", (0.9, 0.999))[0],
                        b2=opt_kwargs.get("betas", (0.9, 0.999))[1],
                        eps=opt_kwargs.get("eps", 1e-8))
    elif opt_type == "AdamW":
        tx = optax.adamw(learning_rate=schedule,
                         b1=opt_kwargs.get("betas", (0.9, 0.999))[0],
                         b2=opt_kwargs.get("betas", (0.9, 0.999))[1],
                         eps=opt_kwargs.get("eps", 1e-8),
                         weight_decay=opt_kwargs.get("weight_decay", 1e-2))
    elif opt_type == "ScaledAdam":
        tx = scaled_adam(
            learning_rate=schedule,
            betas=tuple(opt_kwargs.get("betas", (0.9, 0.98))),
            clipping_scale=opt_kwargs.get("clipping_scale", 2.0),
            param_min_rms=opt_kwargs.get("param_min_rms", 1e-5),
            param_max_rms=opt_kwargs.get("param_max_rms", 3.0),
            scalar_lr_scale=opt_kwargs.get("scalar_lr_scale", 0.1))
    else:
        raise ValueError(f"unknown optimizer {opt_type}")
    return tx, schedule

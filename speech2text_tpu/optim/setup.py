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


def _build_tx(opt_type: str, opt_kwargs: dict,
              schedule: Callable) -> optax.GradientTransformation:
    if opt_type == "Adam":
        return optax.adam(learning_rate=schedule,
                          b1=opt_kwargs.get("betas", (0.9, 0.999))[0],
                          b2=opt_kwargs.get("betas", (0.9, 0.999))[1],
                          eps=opt_kwargs.get("eps", 1e-8))
    if opt_type == "AdamW":
        return optax.adamw(learning_rate=schedule,
                           b1=opt_kwargs.get("betas", (0.9, 0.999))[0],
                           b2=opt_kwargs.get("betas", (0.9, 0.999))[1],
                           eps=opt_kwargs.get("eps", 1e-8),
                           weight_decay=opt_kwargs.get("weight_decay", 1e-2))
    if opt_type == "ScaledAdam":
        return scaled_adam(
            learning_rate=schedule,
            betas=tuple(opt_kwargs.get("betas", (0.9, 0.98))),
            clipping_scale=opt_kwargs.get("clipping_scale", 2.0),
            param_min_rms=opt_kwargs.get("param_min_rms", 1e-5),
            param_max_rms=opt_kwargs.get("param_max_rms", 3.0),
            scalar_lr_scale=opt_kwargs.get("scalar_lr_scale", 0.1))
    raise ValueError(f"unknown optimizer {opt_type}")


def OptimSetup(config: dict) -> Tuple[optax.GradientTransformation, Callable]:
    """config = the YAML `optim_setup` section. Returns (optax tx, schedule).

    The schedule is returned separately so the train loop can log LR
    (reference uses a LearningRateMonitor callback, build_task.py:105).

    Per-module LR groups (reference `seperate_lr`, task_factory/
    rnnt_task.py:150-188 — reference spelling kept for YAML parity): when
    `seperate_lr.apply` is true, each top-level module named in
    `seperate_lr.config` as `<module>_lr` gets its own optimizer instance
    whose schedule uses that base LR; everything else uses the default LR.
    Implemented as `optax.multi_transform` keyed on the first path segment
    of each parameter.
    """
    opt_cfg = config["optimizer"]
    opt_type = opt_cfg["type"]
    opt_kwargs = dict(opt_cfg.get("config", {}))
    lr = float(opt_kwargs.pop("lr", 1e-3))

    sched_cfg = config.get("lr_scheduler", {})
    sched_type = sched_cfg.get("type", "Warmup")
    schedule = _build_schedule(sched_type, lr, sched_cfg.get("config", {}))

    sep = config.get("seperate_lr", {}) or {}
    if not sep.get("apply"):
        return _build_tx(opt_type, opt_kwargs, schedule), schedule

    group_lrs = {k[:-len("_lr")]: float(v)
                 for k, v in (sep.get("config", {}) or {}).items()
                 if k.endswith("_lr")}
    transforms = {"default": _build_tx(opt_type, opt_kwargs, schedule)}
    for name, group_lr in group_lrs.items():
        group_sched = _build_schedule(sched_type, group_lr,
                                      sched_cfg.get("config", {}))
        transforms[name] = _build_tx(opt_type, opt_kwargs, group_sched)

    def label_fn(params):
        import jax
        return {k: jax.tree.map(
                    lambda _: k if k in group_lrs else "default", v)
                for k, v in params.items()}

    return optax.multi_transform(transforms, label_fn), schedule

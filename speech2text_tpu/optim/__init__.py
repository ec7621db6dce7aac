"""Optimizer layer: OptimSetup factory (reference optimizer/optim_setup.py
parity) returning optax transforms + schedules."""

from .schedules import (CosineAnnealingSchedule, CosineWarmupSchedule,  # noqa
                        EdenSchedule, NoamHoldAnnealingSchedule,
                        WarmupLRSchedule)
from .setup import OptimSetup  # noqa: F401
from .scaled_adam import scaled_adam  # noqa: F401

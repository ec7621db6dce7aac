"""Loss factory — string-keyed dispatch matching reference model/loss/loss.py.

Each loss exposes `__call__(batch: dict) -> loss` and `predict(logits)`
(log-softmax for decoding), mirroring the reference's forward/predict
surface (model/loss/loss.py:26-53) while staying functional/jit-friendly.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..ops.ctc import ctc_loss
from ..ops.pruned_rnnt import rnnt_loss_pruned
from ..ops.rnnt import rnnt_loss


@dataclasses.dataclass
class CtcLossConfig:
    blank_label: int = 0
    reduction: str = "mean"
    zero_infinity: bool = True


class CtcLoss:
    """Parity: reference model/loss/ctc_loss.py:20-41 (fp32 lattice,
    log_softmax inside, blank 0)."""

    def __init__(self, config: CtcLossConfig):
        self._cfg = config

    def __call__(self, batch: Dict[str, Any]) -> jnp.ndarray:
        return ctc_loss(batch["logits"], batch["label"],
                        batch["logits_length"], batch["label_length"],
                        blank=self._cfg.blank_label,
                        reduction=self._cfg.reduction)

    def predict(self, logits: jnp.ndarray) -> jnp.ndarray:
        return jax.nn.log_softmax(logits, axis=-1)


@dataclasses.dataclass
class RnntLossConfig:
    blank_label: int = 0
    reduction: str = "mean"
    clamp: float = -1.0  # clip per-utt logits-gradients to ±clamp; <0 off


class RnntLoss:
    """Parity: reference model/loss/rnnt_loss.py:21-45 (incl. `clamp`:
    per-utterance logits-gradient clipping, torchaudio semantics)."""

    def __init__(self, config: RnntLossConfig):
        self._cfg = config

    def __call__(self, batch: Dict[str, Any]) -> jnp.ndarray:
        return rnnt_loss(batch["logits"], batch["label"],
                         batch["logits_length"], batch["label_length"],
                         blank=self._cfg.blank_label,
                         reduction=self._cfg.reduction,
                         clamp=self._cfg.clamp)

    def predict(self, logits: jnp.ndarray) -> jnp.ndarray:
        return jax.nn.log_softmax(logits, axis=-1)


@dataclasses.dataclass
class PrunedRnntLossConfig:
    termination_symbol: int = 0
    reduction: str = "mean"


class PrunedRnntLoss:
    """Parity: reference model/loss/pruned_rnnt_loss.py:23-50 (fp32 forced)."""

    def __init__(self, config: PrunedRnntLossConfig):
        self._cfg = config

    def __call__(self, batch: Dict[str, Any]) -> jnp.ndarray:
        return rnnt_loss_pruned(
            batch["logits"], batch["label"], batch["ranges"],
            batch["logits_length"], batch["label_length"],
            termination_symbol=self._cfg.termination_symbol,
            reduction=self._cfg.reduction)

    def predict(self, logits: jnp.ndarray) -> jnp.ndarray:
        return jax.nn.log_softmax(logits, axis=-1)


@dataclasses.dataclass
class MaskedCeLossConfig:
    num_classes: int = -1  # kept for config parity; inferred from logits
    label_smoothing: float = 0.0


class MaskedCeLoss:
    """Masked cross-entropy (reference model/loss/cross_entropy.py:25-80):
    mask may be (B, T) bool or (B,) lengths; mean over masked positions."""

    def __init__(self, config: MaskedCeLossConfig):
        self._cfg = config

    def __call__(self, batch: Dict[str, Any]) -> jnp.ndarray:
        logits = batch["logits"].astype(jnp.float32)  # (B, T, C)
        labels = batch["label"].astype(jnp.int32)     # (B, T)
        mask = batch["mask"]
        if mask.ndim == 1:  # lengths
            T = logits.shape[1]
            mask = jnp.arange(T)[None, :] < mask[:, None]
        mask = mask.astype(jnp.float32)
        lp = jax.nn.log_softmax(logits, axis=-1)
        C = logits.shape[-1]
        if self._cfg.label_smoothing > 0.0:
            eps = self._cfg.label_smoothing
            onehot = jax.nn.one_hot(labels, C, dtype=jnp.float32)
            tgt = onehot * (1.0 - eps) + eps / C
            nll = -jnp.sum(tgt * lp, axis=-1)
        else:
            nll = -jnp.take_along_axis(lp, labels[..., None], axis=-1)[..., 0]
        return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)

    def predict(self, logits: jnp.ndarray) -> jnp.ndarray:
        return jax.nn.log_softmax(logits, axis=-1)


@dataclasses.dataclass
class MaskedKlDivConfig:
    label_smoothing: float = 0.1


class MaskedKlDivLoss:
    """Label-smoothed one-hot target + masked KL divergence (reference
    model/loss/kl_divergence.py:24-87)."""

    def __init__(self, config: MaskedKlDivConfig):
        self._cfg = config

    def __call__(self, batch: Dict[str, Any]) -> jnp.ndarray:
        logits = batch["logits"].astype(jnp.float32)
        labels = batch["label"].astype(jnp.int32)
        mask = batch["mask"]
        if mask.ndim == 1:
            T = logits.shape[1]
            mask = jnp.arange(T)[None, :] < mask[:, None]
        mask = mask.astype(jnp.float32)
        C = logits.shape[-1]
        eps = self._cfg.label_smoothing
        onehot = jax.nn.one_hot(labels, C, dtype=jnp.float32)
        tgt = onehot * (1.0 - eps) + eps / (C - 1)
        lp = jax.nn.log_softmax(logits, axis=-1)
        # KL(tgt || p) = Σ tgt · (log tgt − log p); log tgt term is constant
        log_tgt = jnp.log(jnp.maximum(tgt, 1e-10))
        kl = jnp.sum(tgt * (log_tgt - lp), axis=-1)
        return jnp.sum(kl * mask) / jnp.maximum(jnp.sum(mask), 1.0)

    def predict(self, logits: jnp.ndarray) -> jnp.ndarray:
        return jax.nn.log_softmax(logits, axis=-1)


@dataclasses.dataclass
class MaeLossConfig:
    normalized: bool = True


class MaeLoss:
    """L1 between predicted/true token counts — CIF quantity loss
    (reference model/loss/mae_loss.py:17-32)."""

    def __init__(self, config: MaeLossConfig):
        self._cfg = config

    def __call__(self, batch: Dict[str, Any]) -> jnp.ndarray:
        pred = batch["pred_token_counts"].astype(jnp.float32)
        true = batch["true_token_counts"].astype(jnp.float32)
        err = jnp.abs(pred - true)
        if self._cfg.normalized:
            return jnp.mean(err / jnp.maximum(true, 1.0))
        return jnp.mean(err)

    def predict(self, logits):
        return logits


_LOSSES = {
    "CTC": (CtcLoss, CtcLossConfig),
    "Rnnt": (RnntLoss, RnntLossConfig),
    "Pruned_Rnnt": (PrunedRnntLoss, PrunedRnntLossConfig),
    "MaskedCELoss": (MaskedCeLoss, MaskedCeLossConfig),
    "MaskedKLDiv": (MaskedKlDivLoss, MaskedKlDivConfig),
    "MaeLoss": (MaeLoss, MaeLossConfig),
}


def Loss(config: dict):
    """Factory (reference model/loss/loss.py:26-41): config = {"model": key,
    "config": {...}}."""
    key = config["model"]
    if key not in _LOSSES:
        raise ValueError(f"unknown loss {key}; have {sorted(_LOSSES)}")
    cls, cfg_cls = _LOSSES[key]
    kwargs = dict(config.get("config", {}))
    valid = {f.name for f in dataclasses.fields(cfg_cls)}
    kwargs = {k: v for k, v in kwargs.items() if k in valid}
    return cls(cfg_cls(**kwargs))

"""Transducer joiner with optional k2-style pruning hookup.

Parity with reference model/joiner/joiner.py:16-310:
- enc_proj/pre_proj Linears to vocab dim, broadcast add, activation
  (relu/tanh), optional 2-layer out-projection
- prune_range > 0 routes through the pruned-RNN-T trio
  (ops/pruned_rnnt.py): smoothed simple loss on the projected am/lm →
  prune ranges from occupancy grads → gathered (B, T, r, V) joint
- streaming_step: single-frame log-softmax join for decode loops

The joint over (B, T, r) stays a broadcast-add + elementwise chain, which
XLA fuses into the surrounding matmuls — no bespoke kernel needed.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.pruned_rnnt import (do_rnnt_pruning, get_rnnt_prune_ranges,
                               rnnt_loss_smoothed)


@dataclasses.dataclass
class JoinerConfig:
    input_dim: int              # encoder/predictor output dim
    output_dim: int             # vocab size
    inner_dim: int = 256
    activation: str = "relu"    # "relu" | "tanh"
    prune_range: int = 5        # -1 → full (unpruned) joint
    lm_scale: float = 0.0       # simple-loss smoothing scales
    am_scale: float = 0.0
    use_out_project: bool = True
    dtype: str = "float32"


def _dt(name):
    return jnp.bfloat16 if name == "bfloat16" else jnp.float32


class Joiner(nn.Module):
    config: JoinerConfig

    def setup(self):
        cfg = self.config
        self.enc_proj = nn.Dense(cfg.output_dim, dtype=_dt(cfg.dtype))
        self.pre_proj = nn.Dense(cfg.output_dim, dtype=_dt(cfg.dtype))
        if cfg.activation == "relu":
            self.act = nn.relu
        elif cfg.activation == "tanh":
            self.act = jnp.tanh
        else:
            raise ValueError(f"unsupported activation {cfg.activation}")
        self.use_out_project = cfg.use_out_project
        if self.use_out_project:
            self.out_proj_a = nn.Dense(cfg.inner_dim, dtype=_dt(cfg.dtype))
            self.out_proj_b = nn.Dense(cfg.output_dim, dtype=_dt(cfg.dtype))

    @property
    def prune_range(self) -> int:
        return self.config.prune_range

    @property
    def blank_token(self) -> int:
        return 0  # blank strictly 0 for both CTC and RNN-T

    def _join(self, am: jnp.ndarray, lm: jnp.ndarray) -> jnp.ndarray:
        h = self.act(am + lm)
        if self.use_out_project:
            h = self.out_proj_b(self.out_proj_a(h))
        return h.astype(jnp.float32)

    def __call__(
        self,
        encoder_out: jnp.ndarray,        # (B, T, D)
        encoder_out_lengths: jnp.ndarray,
        predict_out: jnp.ndarray,        # (B, U+1, D)
        target_lengths: jnp.ndarray,
        target: Optional[jnp.ndarray] = None,   # (B, U); needed if pruning
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray], Optional[jnp.ndarray]]:
        """Returns (logits, ranges, simple_loss).

        pruned:   logits (B, T, prune_range, V), ranges (B, T), simple_loss
        unpruned: logits (B, T, U+1, V), ranges=None, simple_loss=None
        """
        am = self.enc_proj(encoder_out)
        lm = self.pre_proj(predict_out)
        if self.config.prune_range > 0:
            assert target is not None
            simple_loss, (px_g, py_g) = rnnt_loss_smoothed(
                lm, am, target, encoder_out_lengths, target_lengths,
                termination_symbol=self.blank_token,
                lm_only_scale=self.config.lm_scale,
                am_only_scale=self.config.am_scale,
                reduction="mean")
            ranges = get_rnnt_prune_ranges(px_g, py_g, encoder_out_lengths,
                                           target_lengths,
                                           s_range=self.config.prune_range)
            am_p, lm_p = do_rnnt_pruning(am, lm, ranges,
                                         s_range=self.config.prune_range)
            return self._join(am_p, lm_p), ranges, simple_loss
        logits = self._join(am[:, :, None, :], lm[:, None, :, :])
        return logits, None, None

    def streaming_step(self, encoder_frame: jnp.ndarray,
                       predictor_out: jnp.ndarray) -> jnp.ndarray:
        """encoder_frame (B, D) × predictor_out (B, D) → log-probs (B, V)
        (reference joiner.py:184-207, vectorized over the batch instead of
        the reference's B=1 restriction)."""
        am = self.enc_proj(encoder_frame)
        lm = self.pre_proj(predictor_out)
        logits = self._join(am, lm)
        return jax.nn.log_softmax(logits, axis=-1)

"""Continuous Integrate-and-Fire (CIF) layer for non-autoregressive AED.

Parity with reference model/cif/cif_layer.py:30-219:
- alpha predictor: depthwise conv → linear → sigmoid over encoder frames
- training: alphas rescaled so Σα = target length (:101-104)
- inference: tail frame fired when the residual accumulation exceeds
  `tail_threshold` (:123-155)
- the integrate-and-fire recursion itself (:157-219) — a Python loop over
  time in the reference (flagged as a hot sequential scan in SURVEY §3.5) —
  is one `lax.scan` here, with emissions scattered into a fixed-size
  (B, U_cap, D) output by running fire-count (TPU-friendly: no dynamic
  shapes, one pass).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax


@dataclasses.dataclass
class CifConfig:
    input_dim: int = 256
    conv_kernel: int = 3
    threshold: float = 1.0
    tail_threshold: float = 0.5
    max_tokens: int = 128   # U_cap for fixed-shape emission buffer
    dtype: str = "float32"


def integrate_and_fire(
    hidden: jnp.ndarray,     # (B, T, D) encoder states
    alphas: jnp.ndarray,     # (B, T) firing weights ≥ 0
    u_cap: int,
    threshold: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One lax.scan over T. Returns (embeds (B, u_cap, D), counts (B,)).

    At each frame: accumulate α; on crossing `threshold`, emit the weighted
    running embedding (splitting the frame's α into left/right parts) and
    restart the accumulator with the right part. Multiple fires per frame
    cannot happen when α ≤ 1 (sigmoid), matching the reference.
    """
    B, T, D = hidden.shape
    slots = jnp.arange(u_cap, dtype=jnp.int32)

    def step(carry, xs):
        accum, embed, embeds, count = carry
        h_t, a_t = xs                                     # (B, D), (B,)
        new_accum = accum + a_t
        fired = new_accum >= threshold
        right = jnp.where(fired, new_accum - threshold, 0.0)
        left = a_t - right
        emit_embed = embed + left[:, None] * h_t          # (B, D)
        write = (fired[:, None] & (slots[None, :] == count[:, None])
                 & (count[:, None] < u_cap))
        embeds = jnp.where(write[:, :, None], emit_embed[:, None, :], embeds)
        count = count + (fired & (count < u_cap)).astype(jnp.int32)
        accum = jnp.where(fired, right, new_accum)
        embed = jnp.where(fired[:, None], right[:, None] * h_t,
                          embed + a_t[:, None] * h_t)
        return (accum, embed, embeds, count), None

    init = (jnp.zeros((B,)), jnp.zeros((B, D)),
            jnp.zeros((B, u_cap, D)), jnp.zeros((B,), jnp.int32))
    (accum, embed, embeds, count), _ = lax.scan(
        step, init, (hidden.swapaxes(0, 1), alphas.swapaxes(0, 1).astype(
            jnp.float32)))
    return embeds, count, accum, embed


class CifLayer(nn.Module):
    config: CifConfig

    @nn.compact
    def __call__(
        self,
        hidden: jnp.ndarray,          # (B, T, D)
        lengths: jnp.ndarray,         # (B,)
        target_lengths: Optional[jnp.ndarray] = None,  # train-time scaling
    ):
        """Returns (acoustic_embeds (B, U_cap, D), token_counts (B,) float
        predicted Σα, emit_counts (B,) int)."""
        cfg = self.config
        B, T, D = hidden.shape
        h = jnp.pad(hidden, ((0, 0), (cfg.conv_kernel - 1, 0), (0, 0)))
        h = nn.Conv(D, (cfg.conv_kernel,), padding="VALID",
                    feature_group_count=D, name="alpha_conv")(h)
        a = nn.Dense(1, name="alpha_proj")(jax.nn.relu(h))[..., 0]
        alphas = jax.nn.sigmoid(a)
        valid = jnp.arange(T)[None, :] < lengths[:, None]
        alphas = jnp.where(valid, alphas, 0.0)
        pred_counts = jnp.sum(alphas, axis=1)             # quantity (MAE)

        if target_lengths is not None:
            # train: rescale so Σα = U (reference cif_layer.py:101-104)
            scale = target_lengths.astype(jnp.float32) / jnp.maximum(
                pred_counts, 1e-6)
            alphas = alphas * scale[:, None]
            embeds, count, _, _ = integrate_and_fire(
                hidden, alphas, cfg.max_tokens, cfg.threshold)
            return embeds, pred_counts, count

        # inference: fire the residual tail if it exceeds tail_threshold
        embeds, count, accum, embed = integrate_and_fire(
            hidden, alphas, cfg.max_tokens, cfg.threshold)
        tail_fire = accum >= cfg.tail_threshold
        slots = jnp.arange(cfg.max_tokens, dtype=jnp.int32)
        write = (tail_fire[:, None] & (slots[None, :] == count[:, None])
                 & (count[:, None] < cfg.max_tokens))
        embeds = jnp.where(write[:, :, None], embed[:, None, :], embeds)
        count = count + (tail_fire & (count < cfg.max_tokens)).astype(
            jnp.int32)
        return embeds, pred_counts, count

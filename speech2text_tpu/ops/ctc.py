"""CTC forward-backward loss as a lax.scan lattice kernel.

TPU-native replacement for the reference's cuDNN/ATen `nn.CTCLoss`
(reference model/loss/ctc_loss.py:20-41). The alpha recursion runs as a
single `lax.scan` over time with a vectorized (B, S) state (S = 2U+1
extended labels); gradients flow through the scan via JAX autodiff, which
materializes exactly the beta-pass workspace a handwritten backward would.

Semantics parity: blank id 0, log_softmax inside, zero_infinity (invalid
lattices — e.g. label longer than input — produce 0 loss, not inf/nan),
per-batch mean over label lengths when reduction="mean" matches
torch.nn.CTCLoss(reduction="mean").
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

NEG_INF = -1e30


def _logaddexp(a, b):
    # NaN-safe under autodiff: sanitize both branches before exp so the
    # untaken `where` branch never produces 0/0 in the backward pass.
    mx = jnp.maximum(a, b)
    both_inf = mx <= NEG_INF
    mx_safe = jnp.where(both_inf, 0.0, mx)
    a_s = jnp.where(both_inf, 0.0, a - mx_safe)
    b_s = jnp.where(both_inf, 0.0, b - mx_safe)
    out = mx_safe + jnp.log(jnp.exp(a_s) + jnp.exp(b_s))
    return jnp.where(both_inf, NEG_INF, out)


@partial(jax.jit, static_argnames=("blank",))
def ctc_forward(
    log_probs: jnp.ndarray,      # (B, T, V) log-softmaxed
    labels: jnp.ndarray,         # (B, U) int32, 0-padded
    input_lengths: jnp.ndarray,  # (B,)
    label_lengths: jnp.ndarray,  # (B,)
    blank: int = 0,
) -> jnp.ndarray:
    """Per-utterance negative log-likelihood, shape (B,)."""
    B, T, V = log_probs.shape
    U = labels.shape[1]
    S = 2 * U + 1

    input_lengths = input_lengths.astype(jnp.int32)
    label_lengths = label_lengths.astype(jnp.int32)

    # extended label sequence z: [blank, y1, blank, y2, ..., blank]
    s_idx = jnp.arange(S, dtype=jnp.int32)
    is_label_pos = (s_idx % 2) == 1
    label_idx = jnp.clip(s_idx // 2, 0, U - 1)
    z = jnp.where(is_label_pos[None, :],
                  jnp.take_along_axis(
                      labels.astype(jnp.int32),
                      jnp.broadcast_to(label_idx[None, :], (B, S)), axis=1),
                  blank)                                     # (B, S)

    # skip-transition allowed where z[s] != blank and z[s] != z[s-2]
    z_m2 = jnp.pad(z, ((0, 0), (2, 0)), constant_values=-1)[:, :S]
    can_skip = is_label_pos[None, :] & (z != z_m2)           # (B, S)
    # positions beyond 2*label_len are invalid
    valid_s = s_idx[None, :] < (2 * label_lengths[:, None] + 1)

    # emission scores lp[b,t,z[b,s]] for ALL t as ONE one-hot contraction
    # (z is time-invariant): an MXU matmul forward, a dense matmul
    # backward — the per-step (B,S) gather it replaces made the training
    # backward T sequential scatter-adds into (B,V)
    emit_all = jnp.einsum("btv,bsv->bts", log_probs,
                          jax.nn.one_hot(z, V, dtype=log_probs.dtype))

    alpha0 = jnp.full((B, S), NEG_INF)
    alpha0 = alpha0.at[:, 0].set(log_probs[:, 0, blank])
    alpha0 = alpha0.at[:, 1].set(
        jnp.where(label_lengths > 0, emit_all[:, 0, 1], NEG_INF))
    alpha0 = jnp.where(valid_s, alpha0, NEG_INF)

    def step(alpha, emit_and_t):
        emit, t = emit_and_t                                 # (B, S)
        a_m1 = jnp.pad(alpha, ((0, 0), (1, 0)), constant_values=NEG_INF)[:, :S]
        a_m2 = jnp.pad(alpha, ((0, 0), (2, 0)), constant_values=NEG_INF)[:, :S]
        new = _logaddexp(alpha, a_m1)
        new = jnp.where(can_skip, _logaddexp(new, a_m2), new)
        new = new + emit
        new = jnp.where(valid_s, new, NEG_INF)
        # frames at/after input_length leave alpha unchanged
        active = (t < input_lengths)[:, None]
        return jnp.where(active, new, alpha), None

    ts = jnp.arange(1, T, dtype=jnp.int32)
    alpha_T, _ = lax.scan(step, alpha0,
                          (emit_all[:, 1:].swapaxes(0, 1), ts), unroll=8)

    end1 = 2 * label_lengths          # final blank
    end2 = 2 * label_lengths - 1      # final label
    a1 = jnp.take_along_axis(alpha_T, end1[:, None], axis=1)[:, 0]
    a2 = jnp.where(label_lengths > 0,
                   jnp.take_along_axis(alpha_T, jnp.maximum(end2, 0)[:, None],
                                       axis=1)[:, 0],
                   NEG_INF)
    nll = -_logaddexp(a1, a2)
    # zero_infinity: unreachable lattice (e.g. T too short) → 0 loss
    return jnp.where(nll >= -NEG_INF / 2, 0.0, nll)


def ctc_loss(
    logits: jnp.ndarray,         # (B, T, V) raw logits
    labels: jnp.ndarray,
    input_lengths: jnp.ndarray,
    label_lengths: jnp.ndarray,
    blank: int = 0,
    reduction: str = "mean",
    logits_time_major: bool = False,
) -> jnp.ndarray:
    """CTC loss on raw logits (log_softmax fused here, fp32 lattice)."""
    if logits_time_major:
        logits = logits.swapaxes(0, 1)
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = ctc_forward(log_probs, labels, input_lengths, label_lengths,
                      blank=blank)
    if reduction == "none":
        return nll
    if reduction == "sum":
        return jnp.sum(nll)
    if reduction == "mean":
        # torch semantics: divide each by its target length, then batch-mean
        denom = jnp.maximum(label_lengths.astype(jnp.float32), 1.0)
        return jnp.mean(nll / denom)
    raise ValueError(f"unknown reduction {reduction}")

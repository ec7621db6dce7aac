"""Full-lattice RNN-T (transducer) loss as an anti-diagonal wavefront scan.

TPU-native replacement for torchaudio's C++/CUDA RNNT loss (reference
model/loss/rnnt_loss.py:21-45). The alpha recursion
    alpha[t,u] = logaddexp(alpha[t-1,u] + blank[t-1,u],
                           alpha[t,u-1] + emit[t,u-1])
is evaluated over anti-diagonals d = t+u: every cell on a diagonal depends
only on the previous diagonal, so one `lax.scan` of length T+U-1 with a
fully vectorized (B, U+1) body computes the whole lattice — no per-cell
serialization, no associative-scan transpose blowup, autodiff gives the
beta pass for free.

Conventions (torchaudio parity): logits (B, T, U+1, V); blank id 0; the
u=0 row is the "no label yet" predictor state; reduction "mean" averages
per-utterance NLL over the batch.
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


def _skew_diag(a_u: jnp.ndarray) -> jnp.ndarray:
    """(B, U1, T) row-major → (B, U1, D) diagonal-major, D = T+U1-1:
    out[b, u, d] = a_u[b, u, d-u] when 0 ≤ d-u < T, NEG_INF otherwise.

    Pure pad+reshape (the Transformer-XL skew): pad each row to width
    T+U1 then drop the last column of the flattened view — row u lands
    shifted right by u. Out-of-range slots on BOTH sides fall into the
    NEG_INF pad region (for d-u < 0 the flat index u*(T+U1-1)+d wraps
    into row u-1's pad, which is ≥ T wide)."""
    B, U1, T = a_u.shape
    W = T + U1
    flat = jnp.pad(a_u, ((0, 0), (0, 0), (0, U1)),
                   constant_values=NEG_INF).reshape(B, U1 * W)
    return flat[:, :U1 * (W - 1)].reshape(B, U1, W - 1)


def lattice_forward(px: jnp.ndarray, py: jnp.ndarray, t_lens: jnp.ndarray,
                    u_lens: jnp.ndarray) -> jnp.ndarray:
    """Wavefront forward DP over the (T, U+1) transducer lattice.

    px: (B, T, U)   emit arc (t,u)→(t,u+1) log-prob (label y_{u+1})
    py: (B, T, U+1) blank arc (t,u)→(t+1,u) log-prob
    Returns total path log-prob (B,), path ending with blank at
    (t_lens-1, u_lens). Cells beyond u_lens are excluded via px masking.

    The arc tensors are pre-skewed to diagonal-major layout once
    (`_skew_diag`) so the scan body consumes plain `xs` slices — no
    per-step gathers forward, no scatter-adds backward (the occupancy
    vjp in ops/pruned_rnnt.py runs this backward on EVERY training
    forward, so the bwd scan's cost is on the step critical path).
    Out-of-lattice diagonal slots carry NEG_INF pad; sums of two such
    pads (≈ -2e30) stay finite in f32 and `_logaddexp` clamps anything
    ≤ NEG_INF back to exactly NEG_INF, so junk never reaches valid
    cells (an out-of-range (t≥T, u) cell can only feed further
    out-of-range cells)."""
    B, T, U = px.shape
    U1 = U + 1
    t_lens = t_lens.astype(jnp.int32)
    u_lens = u_lens.astype(jnp.int32)

    u_idx = jnp.arange(U1, dtype=jnp.int32)                    # (U1,)
    px = jnp.where(u_idx[None, None, :U] < u_lens[:, None, None], px, NEG_INF)
    # [b,u,t] = px[t,u-1] (emit INTO state u); u=0 row unreachable
    px_u = jnp.pad(px, ((0, 0), (0, 0), (1, 0)),
                   constant_values=NEG_INF).swapaxes(1, 2)     # (B,U1,T)
    py_u = py.swapaxes(1, 2)                                   # (B,U1,T)
    px_d = _skew_diag(px_u)                                    # (B,U1,D)
    py_d = _skew_diag(py_u)

    alpha = jnp.full((B, U1), NEG_INF).at[:, 0].set(0.0)       # diagonal d=0
    d_end = t_lens - 1 + u_lens
    # capture total for sequences whose final cell is (0, 0)
    total0 = py_u[:, 0, 0]
    total = jnp.where(d_end == 0, total0, NEG_INF)
    fin_onehot = (u_idx[None, :] == u_lens[:, None]).astype(px.dtype)

    def step(carry, xs):
        alpha, total = carry
        py_prev, px_cur, py_cur, d = xs
        # blank arrival from (t-1, u) = diagonal d-1, same u
        a_blank = alpha + py_prev
        # emit arrival from (t, u-1) = diagonal d-1, u-1
        a_shift = jnp.pad(alpha, ((0, 0), (1, 0)),
                          constant_values=NEG_INF)[:, :U1]
        a_emit = a_shift + px_cur
        new = _logaddexp(a_blank, a_emit)
        # capture total at each sequence's final cell (t_lens-1, u_lens)
        cand = jnp.sum((new + py_cur) * fin_onehot, axis=1)
        total = jnp.where(d == d_end, cand, total)
        return (new, total), None

    # diagonals d = 1 .. (T-1)+(U1-1); xs sliced from the skewed tensors
    ds = jnp.arange(1, T + U1 - 1, dtype=jnp.int32)
    xs = (py_d.transpose(2, 0, 1)[:-1], px_d.transpose(2, 0, 1)[1:],
          py_d.transpose(2, 0, 1)[1:], ds)
    (alpha, total), _ = lax.scan(step, (alpha, total), xs, unroll=8)
    return total


@partial(jax.jit, static_argnames=("blank",))
def rnnt_alpha(
    log_probs: jnp.ndarray,       # (B, T, U+1, V) log-softmaxed
    targets: jnp.ndarray,         # (B, U) int32
    logit_lengths: jnp.ndarray,   # (B,)
    target_lengths: jnp.ndarray,  # (B,)
    blank: int = 0,
) -> jnp.ndarray:
    """Per-utterance negative log-likelihood (B,)."""
    B, T, U1, V = log_probs.shape
    U = U1 - 1
    tgt = targets.astype(jnp.int32)
    # px[b,t,u] = lp[b,t,u,y_{u+1}] (emit from state u), u in 0..U-1 —
    # one-hot contraction so the backward is dense, not a scatter-add
    px = jnp.einsum("btuv,buv->btu", log_probs[:, :, :U],
                    jax.nn.one_hot(tgt, V, dtype=log_probs.dtype))
    py = log_probs[..., blank]
    total = lattice_forward(px, py, logit_lengths, target_lengths)
    return -total


def _nll_from_logits(logits, targets, logit_lengths, target_lengths, blank):
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return rnnt_alpha(log_probs, targets, logit_lengths, target_lengths,
                      blank=blank)


@partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _rnnt_nll_clamped(logits, targets, logit_lengths, target_lengths,
                      blank, clamp):
    """Per-utterance NLL whose logits-gradients are clipped to
    [-clamp, clamp] — torchaudio RNNTLoss `clamp` semantics (reference
    model/loss/rnnt_loss.py:17,28): the C++ kernel clamps the gradients of
    the UNREDUCED per-utterance losses w.r.t. the raw logits, and any
    reduction scale (e.g. 1/B for "mean") multiplies in afterwards.
    Since logits[b] only affects nll[b], that is exactly
    clip(d nll_b / d logits_b) · ḡ_b."""
    return _nll_from_logits(logits, targets, logit_lengths, target_lengths,
                            blank)


def _clamped_fwd(logits, targets, logit_lengths, target_lengths, blank,
                 clamp):
    nll = _nll_from_logits(logits, targets, logit_lengths, target_lengths,
                           blank)
    return nll, (logits, targets, logit_lengths, target_lengths)


def _clamped_bwd(blank, clamp, res, g):
    logits, targets, logit_lengths, target_lengths = res
    _, vjp = jax.vjp(
        lambda l: _nll_from_logits(l, targets, logit_lengths,
                                   target_lengths, blank), logits)
    (raw,) = vjp(jnp.ones_like(g))                  # d(Σ nll)/d logits
    raw = jnp.clip(raw, -clamp, clamp)
    g_full = raw * g.reshape(g.shape + (1,) * (logits.ndim - 1))
    return (g_full.astype(logits.dtype), None, None, None)


_rnnt_nll_clamped.defvjp(_clamped_fwd, _clamped_bwd)


def rnnt_loss(
    logits: jnp.ndarray,          # (B, T, U+1, V) raw logits
    targets: jnp.ndarray,
    logit_lengths: jnp.ndarray,
    target_lengths: jnp.ndarray,
    blank: int = 0,
    reduction: str = "mean",
    clamp: float = -1.0,
) -> jnp.ndarray:
    """Transducer loss on raw logits (fp32 lattice, fused log_softmax).

    clamp >= 0 clips the per-utterance logits-gradients to [-clamp, clamp]
    (torchaudio parity; <0 disables — the default)."""
    if clamp is not None and clamp >= 0:
        nll = _rnnt_nll_clamped(logits, targets, logit_lengths,
                                target_lengths, blank, float(clamp))
    else:
        nll = _nll_from_logits(logits, targets, logit_lengths,
                               target_lengths, blank)
    if reduction == "none":
        return nll
    if reduction == "sum":
        return jnp.sum(nll)
    if reduction == "mean":
        return jnp.mean(nll)
    raise ValueError(f"unknown reduction {reduction}")

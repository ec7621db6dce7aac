"""Pruned RNN-T trio: smoothed simple loss → prune ranges → pruned loss.

TPU-native replacement for the k2 CUDA kernels the reference binds to
(reference model/joiner/joiner.py:100-123, model/loss/pruned_rnnt_loss.py:
40-49): `rnnt_loss_smoothed`, `get_rnnt_prune_ranges`, `do_rnnt_pruning`,
`rnnt_loss_pruned`.

Design notes (all fp32, all static shapes):
- The simple-loss joint normalizer log Σ_v exp(am_tv + lm_uv) is computed as
  a batched exp-matmul (MXU) instead of materializing a (B,T,U,V) joint.
- The lattice DP scans over time; the within-frame emit recurrence along the
  label axis uses an associative scan (see ops/rnnt.py). Occupancy gradients
  (px_grad/py_grad — what k2's backward returns) come from one vjp of the
  lattice DP and are wired into a custom_vjp so the simple loss backward
  reuses them instead of re-differentiating.
- Prune-range extraction slides a length-`s_range` window over per-state
  occupancies, then enforces k2's validity constraints (start at u=0,
  monotone non-decreasing, per-frame advance < s_range, final window
  reaching U) with two cheap scans.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from .rnnt import NEG_INF, _logaddexp, lattice_forward


@jax.custom_vjp
def _simple_loss_with_grads(px, py, t_lens, u_lens):
    total, occ = _simple_fwd_impl(px, py, t_lens, u_lens)
    return (-total, occ[0], occ[1])


def _simple_fwd_impl(px, py, t_lens, u_lens):
    total, vjp = jax.vjp(lambda px_, py_: lattice_forward(px_, py_, t_lens,
                                                          u_lens), px, py)
    occ = vjp(jnp.ones_like(total))  # (occ_px, occ_py): posterior occupancies
    return total, occ


def _simple_fwd(px, py, t_lens, u_lens):
    total, occ = _simple_fwd_impl(px, py, t_lens, u_lens)
    return (-total, occ[0], occ[1]), occ


def _simple_bwd(occ, cts):
    g_nll, _, _ = cts  # occupancy outputs are detached (k2 parity)
    occ_px, occ_py = occ
    return (-occ_px * g_nll[:, None, None], -occ_py * g_nll[:, None, None],
            None, None)


_simple_loss_with_grads.defvjp(_simple_fwd, _simple_bwd)


# ----------------------------------------------------------- smoothed loss
@partial(jax.jit, static_argnames=("termination_symbol", "reduction",
                                   "lm_only_scale", "am_only_scale"))
def rnnt_loss_smoothed(
    lm: jnp.ndarray,            # (B, U+1, C) predictor logits (unnormalized)
    am: jnp.ndarray,            # (B, T, C) encoder logits (unnormalized)
    symbols: jnp.ndarray,       # (B, U) int32
    t_lens: jnp.ndarray,        # (B,) encoder lengths
    u_lens: jnp.ndarray,        # (B,) target lengths
    termination_symbol: int = 0,
    lm_only_scale: float = 0.0,
    am_only_scale: float = 0.0,
    reduction: str = "mean",
) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
    """k2.rnnt_loss_smoothed semantics: trivial-joiner (am+lm) transducer
    loss, optionally geometric-smoothed with lm-only / am-only distributions.

    Returns (loss, (px_grad, py_grad)) — the grads are posterior occupancies
    of emit/blank arcs (detached), used for pruning.
    """
    am = am.astype(jnp.float32)
    lm = lm.astype(jnp.float32)
    B, T, C = am.shape
    U1 = lm.shape[1]
    U = U1 - 1
    t_lens = t_lens.astype(jnp.int32)
    u_lens = u_lens.astype(jnp.int32)
    symbols = symbols.astype(jnp.int32)

    # joint normalizer log Σ_v exp(am+lm) via exp-matmul (MXU path)
    am_max = jnp.max(am, axis=-1, keepdims=True)
    lm_max = jnp.max(lm, axis=-1, keepdims=True)
    joint = jnp.einsum("btv,buv->btu", jnp.exp(am - am_max),
                       jnp.exp(lm - lm_max),
                       preferred_element_type=jnp.float32)
    norm = jnp.log(jnp.maximum(joint, 1e-37)) + am_max + lm_max.swapaxes(1, 2)

    # label-logit picks as one-hot contractions (MXU matmul fwd, dense
    # outer-product bwd — a take_along_axis here costs a scatter-add
    # into (B,T,C) on every training backward)
    sym_oh = jax.nn.one_hot(symbols, C, dtype=am.dtype)          # (B,U,C)
    am_y = jnp.einsum("btv,buv->btu", am, sym_oh)                # (B,T,U)
    lm_y = jnp.einsum("buv,buv->bu", lm[:, :U], sym_oh)          # (B,U)
    px_joint = am_y + lm_y[:, None, :] - norm[:, :, :U]          # (B,T,U)
    py_joint = (am[:, :, termination_symbol, None]
                + lm[:, None, :, termination_symbol] - norm)     # (B,T,U+1)

    w = 1.0 - lm_only_scale - am_only_scale
    px, py = w * px_joint, w * py_joint
    if lm_only_scale > 0.0:
        lm_ls = jax.nn.log_softmax(lm, axis=-1)
        px_lm = jnp.einsum("buv,buv->bu", lm_ls[:, :U], sym_oh)
        px = px + lm_only_scale * px_lm[:, None, :]
        py = py + lm_only_scale * lm_ls[:, None, :, termination_symbol]
    if am_only_scale > 0.0:
        am_ls = jax.nn.log_softmax(am, axis=-1)
        px_am = jnp.einsum("btv,buv->btu", am_ls, sym_oh)
        px = px + am_only_scale * px_am
        py = py + am_only_scale * jnp.broadcast_to(
            am_ls[:, :, None, termination_symbol], py.shape)

    nll, occ_px, occ_py = _simple_loss_with_grads(px, py, t_lens, u_lens)
    occ_px = lax.stop_gradient(occ_px)
    occ_py = lax.stop_gradient(occ_py)
    if reduction == "mean":
        loss = jnp.mean(nll)
    elif reduction == "sum":
        loss = jnp.sum(nll)
    else:
        loss = nll
    return loss, (occ_px, occ_py)


# ------------------------------------------------------------ prune ranges
@partial(jax.jit, static_argnames=("s_range",))
def get_rnnt_prune_ranges(
    px_grad: jnp.ndarray,   # (B, T, U) emit occupancies
    py_grad: jnp.ndarray,   # (B, T, U+1) blank occupancies
    t_lens: jnp.ndarray,
    u_lens: jnp.ndarray,
    s_range: int,
) -> jnp.ndarray:
    """Per-frame window starts (B, T) int32 maximizing contained occupancy,
    adjusted to a valid pruning bound (k2.get_rnnt_prune_ranges semantics):
    starts at 0, non-decreasing, advances < s_range per frame, and the last
    real frame's window contains u = u_len (termination state)."""
    B, T, U1 = py_grad.shape
    U = U1 - 1
    t_lens = t_lens.astype(jnp.int32)
    u_lens = u_lens.astype(jnp.int32)
    occ = py_grad + jnp.pad(px_grad, ((0, 0), (0, 0), (0, 1)))
    csum = jnp.pad(jnp.cumsum(occ, axis=2), ((0, 0), (0, 0), (1, 0)))
    n_pos = max(U1 - s_range + 1, 1)
    s_pos = jnp.arange(n_pos, dtype=jnp.int32)
    win = (jnp.take(csum, jnp.minimum(s_pos + s_range, U1), axis=2)
           - jnp.take(csum, s_pos, axis=2))                     # (B,T,n_pos)
    s_begin = jnp.argmax(win, axis=2).astype(jnp.int32)         # (B,T)

    s_ub = jnp.maximum(u_lens + 1 - s_range, 0)                 # (B,)
    s_begin = jnp.minimum(s_begin, s_ub[:, None])
    # force windows at/after each sequence's last frame to reach u_len
    t_idx = jnp.arange(T, dtype=jnp.int32)
    s_begin = jnp.where(t_idx[None, :] >= t_lens[:, None] - 1,
                        s_ub[:, None], s_begin)

    # backward pass: s[t-1] ∈ [s[t] - (s_range-1), s[t]]
    def bwd(s_next, s_t):
        s_t = jnp.clip(s_t, s_next - (s_range - 1), s_next)
        return s_t, s_t

    rev = jnp.flip(s_begin, axis=1).swapaxes(0, 1)              # (T, B)
    _, out = lax.scan(bwd, rev[0], rev[1:], unroll=8)
    s_begin = jnp.flip(
        jnp.concatenate([rev[:1], out], axis=0), axis=0).swapaxes(0, 1)
    # forward pass: start at 0, keep monotone with bounded advance
    def fwd(s_prev, s_t):
        s_t = jnp.clip(s_t, s_prev, s_prev + (s_range - 1))
        return s_t, s_t

    cols = s_begin.swapaxes(0, 1)                               # (T, B)
    first = jnp.zeros_like(cols[0])
    _, out = lax.scan(fwd, first, cols[1:], unroll=8)
    s_begin = jnp.concatenate([first[None], out], axis=0).swapaxes(0, 1)
    return s_begin


def do_rnnt_pruning(
    am: jnp.ndarray,        # (B, T, E)
    lm: jnp.ndarray,        # (B, U+1, E)
    ranges: jnp.ndarray,    # (B, T) window starts
    s_range: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Gather pruned (B, T, s_range, E) am/lm rows (k2.do_rnnt_pruning).

    Note: k2 passes ranges as (B, T, s_range) index tensors; here the window
    is contiguous so (B, T) starts + static s_range carry the same info.
    """
    B, T, E = am.shape
    U1 = lm.shape[1]
    am_pruned = jnp.broadcast_to(am[:, :, None, :], (B, T, s_range, E))
    idx = jnp.minimum(ranges[:, :, None] + jnp.arange(s_range,
                                                      dtype=jnp.int32),
                      U1 - 1)                                   # (B,T,r)
    # one-hot contraction (MXU): a take_along_axis here makes the training
    # backward a scatter-add of the (B,T,r,E) cotangent into (B,U1,E)
    lm_pruned = jnp.einsum("btru,bue->btre",
                           jax.nn.one_hot(idx, U1, dtype=lm.dtype), lm)
    return am_pruned, lm_pruned


# -------------------------------------------------------------- pruned loss
@partial(jax.jit, static_argnames=("termination_symbol", "reduction"))
def rnnt_loss_pruned(
    logits: jnp.ndarray,    # (B, T, s_range, V) joiner output on pruned pairs
    symbols: jnp.ndarray,   # (B, U)
    ranges: jnp.ndarray,    # (B, T)
    t_lens: jnp.ndarray,
    u_lens: jnp.ndarray,
    termination_symbol: int = 0,
    reduction: str = "mean",
) -> jnp.ndarray:
    """Forward DP over the pruned lattice (k2.rnnt_loss_pruned semantics)."""
    B, T, R, V = logits.shape
    U = symbols.shape[1]
    t_lens = t_lens.astype(jnp.int32)
    u_lens = u_lens.astype(jnp.int32)
    ranges = ranges.astype(jnp.int32)
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)

    k_off = jnp.arange(R, dtype=jnp.int32)
    u_abs = ranges[:, :, None] + k_off[None, None, :]           # (B,T,R)
    y_at = jnp.take_along_axis(
        jnp.pad(symbols.astype(jnp.int32), ((0, 0), (0, 1))),
        jnp.minimum(u_abs, U).reshape(B, -1), axis=1).reshape(B, T, R)
    # label log-prob pick as a one-hot contraction: the backward is then
    # a dense outer product instead of a scatter-add into (B,T,R,V)
    px = jnp.einsum("btrv,btrv->btr", lp,
                    jax.nn.one_hot(y_at, V, dtype=lp.dtype))
    px = jnp.where(u_abs < u_lens[:, None, None], px, NEG_INF)  # (B,T,R)
    py = lp[..., termination_symbol]                            # (B,T,R)

    def emit_row(base, px_t):
        cols = [base[:, 0]]
        for k in range(1, R):
            cols.append(_logaddexp(base[:, k], cols[-1] + px_t[:, k - 1]))
        return jnp.stack(cols, axis=1)

    # t = 0: window starts at ranges[:,0] (0 after adjustment) with alpha=0
    base0 = jnp.full((B, R), NEG_INF).at[:, 0].set(0.0)
    alpha = emit_row(base0, px[:, 0])
    k_end = jnp.clip(u_lens - ranges[:, 0], 0, R - 1)[:, None]
    total = jnp.take_along_axis(alpha + py[:, 0], k_end, axis=1)[:, 0]
    total = jnp.where(t_lens == 1, total, NEG_INF)

    def step(carry, xs):
        alpha, total = carry
        px_t, py_prev, py_now, d_oh, end_oh, t = xs
        # blank arcs from frame t-1: prev window position k' = k + d,
        # realized gather-free as a one-hot mix of the R static left
        # shifts of (alpha + py_prev) (d < s_range by range validity)
        x = alpha + py_prev                                     # (B,R)
        shifts = jnp.stack(
            [jnp.concatenate(
                [x[:, j:], jnp.full((B, j), NEG_INF, x.dtype)], axis=1)
             for j in range(R)])                                # (R,B,R)
        base = jnp.einsum("jbk,bj->bk", shifts, d_oh)
        new = emit_row(base, px_t)
        new = jnp.where((t < t_lens)[:, None], new, alpha)
        cand = jnp.sum((new + py_now) * end_oh, axis=1)
        total = jnp.where(t == t_lens - 1, cand, total)
        return (new, total), None

    d = ranges[:, 1:] - ranges[:, :-1]                          # (B, T-1)
    d_oh = jax.nn.one_hot(d, R, dtype=py.dtype)                 # (B,T-1,R)
    end_oh = jax.nn.one_hot(jnp.clip(u_lens[:, None] - ranges[:, 1:],
                                     0, R - 1), R, dtype=py.dtype)
    ts = jnp.arange(1, T, dtype=jnp.int32)
    xs = (px[:, 1:].swapaxes(0, 1), py[:, :-1].swapaxes(0, 1),
          py[:, 1:].swapaxes(0, 1), d_oh.swapaxes(0, 1),
          end_oh.swapaxes(0, 1), ts)
    (_, total), _ = lax.scan(step, (alpha, total), xs, unroll=8)
    nll = -total
    nll = jnp.where(nll >= -NEG_INF / 2, 0.0, nll)  # infeasible → 0
    if reduction == "mean":
        return jnp.mean(nll)
    if reduction == "sum":
        return jnp.sum(nll)
    return nll

"""Fused zipformer attention (chunk-masked "flash" style) — Pallas TPU.

One kernel fuses, per (head, query-tile, batch) grid cell: content scores
(q·k on the MXU), compact-rel-pos scores (VPU multiply-accumulate against a
batch-independent Toeplitz pos tensor), score clipping, chunk/pad masking,
row softmax, and the value contraction — so the (B, H, T, T) float32 score
tensor and the softmaxed weight tensor are NEVER materialized in HBM on the
forward pass (reference RelPositionMultiheadAttentionWeights + SelfAttention,
/root/reference/model/encoder/zipformer.py:1836-2378, materialize both).

Because the zipformer layer applies the SAME weights to three sequentially
dependent value streams (self_attn1, self_attn2, nonlin_attn — reference
zipformer.py:1095-1221), a single kernel cannot fuse all three applications;
instead each consumer calls `zip_attend` and recomputes the (cheap, MXU)
scores from the shared projections. Score FLOPs are ~1% of a training step;
the HBM traffic and (critically) the live residual memory of the weight
tensors are what this removes — the known B=32 HBM cliff is score-tensor
residency.

Rel-pos handling: scores[t,s] += qp[t] · p[(t−s)+(T−1)] (the Transformer-XL
skew, kept locally as `_rel_shift` below). In-kernel per-row diagonal
extraction is slow on TPU (round-2 negative result), so the caller builds a
batch-independent Toeplitz tensor P[h, d, t, s] = p[(t−s)+T−1, h, d] once
per layer (15.7 MB f32 at T=495 — 1/6th of ONE bf16 weight tensor) and the
kernel consumes it tiled, with the grid ordered (head, q-tile, batch) so
each P tile is DMA'd once and reused across the whole batch.

Backward: custom_vjp recomputes the weight tensor with the existing
(round-2-tuned) XLA einsum+skew path and differentiates through it with
jax.vjp — gradients are identical to the materialized path by construction,
and the backward's transient (B,H,T,T) tensors are freed within the layer's
backward; nothing survives as a forward residual.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TQ = 128          # query rows per grid cell
_NEG = -1e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ----------------------------------------------------------------- kernel
def _attend_kernel(const_ref, q_ref, k_ref, qp_ref, p_ref, m_ref, v_ref,
                   o_ref, *, qd: int, pd: int, w_dtype):
    b = pl.program_id(2)                           # batch = innermost grid
    q = q_ref[0]                                   # (TQ, qd)
    k = k_ref[0]                                   # (Tp, qd)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s * (1.0 / math.sqrt(qd))
    qp = qp_ref[0].astype(jnp.float32)             # (TQ, pd)
    inv_sqrt_pd = 1.0 / math.sqrt(pd)
    for d in range(pd):                            # pd ≈ 4: VPU fma passes
        s = s + (qp[:, d:d + 1] * inv_sqrt_pd) * p_ref[0, d]
    s = jnp.clip(s, -100.0, 100.0)
    # const-attention (reference zipformer.py:1143-1155): uniform weights
    # over the allowed positions — equivalent to softmax of 0-where-allowed
    s = jnp.where(const_ref[b, 0] != 0, 0.0, s)
    s = jnp.where(m_ref[0], s, _NEG)               # chunk/pad mask
    smax = jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp(s - smax)
    w = e / jnp.sum(e, axis=1, keepdims=True)
    w = w.astype(w_dtype)                          # bit-match the XLA path
    o = jax.lax.dot_general(w, v_ref[0], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0] = o


def _flash_forward(q, k, qp, p, v, mask, const_row, w_dtype):
    """q,k (B,T,H,qd) · qp (B,T,H,pd) · p (2T−1,H,pd) · v (B,T,H,vd) ·
    mask (B,T,T) bool | None · const_row (B,) bool → (B,T,H,vd) f32."""
    B, T, H, qd = q.shape
    pd = qp.shape[-1]
    vd = v.shape[-1]
    Tp = _round_up(T, TQ)
    pt = (0, Tp - T)

    def to_bht(x):                                 # (B,T,H,d) → (B·H,Tp,d)
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(B * H, T, x.shape[-1])
        return jnp.pad(x, ((0, 0), pt, (0, 0)))

    qf, kf, qpf, vf = to_bht(q), to_bht(k), to_bht(qp), to_bht(v)
    # Toeplitz pos tensor P[h,d,t,s] = p[(t−s)+T−1, h, d]; batch-free.
    idx = jnp.clip(jnp.arange(Tp)[:, None] - jnp.arange(Tp)[None, :]
                   + (T - 1), 0, p.shape[0] - 1)
    P = jnp.transpose(p.astype(jnp.float32)[idx], (2, 3, 0, 1))
    valid = (jnp.arange(Tp) < T)[None, None, :]    # padded keys excluded
    if mask is not None:
        mf = jnp.pad(mask, ((0, 0), pt, pt)) & valid
    else:
        mf = jnp.broadcast_to(valid, (B, Tp, Tp))
    cf = const_row.astype(jnp.int32).reshape(B, 1)

    grid = (H, Tp // TQ, B)                        # b innermost: P reused
    out = pl.pallas_call(
        functools.partial(_attend_kernel, qd=qd, pd=pd, w_dtype=w_dtype),
        # interpret off-TPU so CPU tests and the virtual-device dryrun run
        interpret=(jax.default_backend() != "tpu"),
        grid=grid,
        in_specs=[
            # whole (B,1) flag vector in SMEM (a (1,1) block fails the
            # TPU (8,128) block-tiling rule); kernel indexes program_id
            pl.BlockSpec((B, 1), lambda h, i, b: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, TQ, qd), lambda h, i, b: (b * H + h, i, 0)),
            pl.BlockSpec((1, Tp, qd), lambda h, i, b: (b * H + h, 0, 0)),
            pl.BlockSpec((1, TQ, pd), lambda h, i, b: (b * H + h, i, 0)),
            pl.BlockSpec((1, pd, TQ, Tp), lambda h, i, b: (h, 0, i, 0)),
            pl.BlockSpec((1, TQ, Tp), lambda h, i, b: (b, i, 0)),
            pl.BlockSpec((1, Tp, vd), lambda h, i, b: (b * H + h, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, TQ, vd),
                               lambda h, i, b: (b * H + h, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B * H, Tp, vd), jnp.float32),
    )(cf, qf, kf, qpf, P, mf, vf)
    out = out.reshape(B, H, Tp, vd)[:, :, :T]
    return jnp.transpose(out, (0, 2, 1, 3))        # (B, T, H, vd)


# ------------------------------------------------- XLA oracle (backward)
def _rel_shift(x):
    """(T,2T−1,B,H) → (B,H,T,T) Transformer-XL skew (pad+reshape+slice;
    row j = (s−t)+(T−1), so the einsum runs on the offset-REVERSED
    table). Same math as the Toeplitz-window form the training path now
    uses (models/zipformer.py:AttentionWeights._toeplitz_windows)."""
    T, R, B, H = x.shape
    x = jnp.pad(x, ((0, 0), (0, 1), (0, 0), (0, 0)))
    x = x.reshape(T * 2 * T, B, H)
    x = x[T - 1:T - 1 + T * R].reshape(T, R, B, H)[:, :T]
    return x.transpose(2, 3, 0, 1)


def xla_weights(q, k, qp, p, mask, const_row, w_dtype):
    """Materialized-weight oracle: the exact math of
    models/zipformer.py:AttentionWeights.__call__ (post-projection)."""
    qd, pd = q.shape[-1], qp.shape[-1]
    scores = jnp.einsum("bthd,bshd->bhts", q, k,
                        preferred_element_type=jnp.float32)
    scores = scores / jnp.sqrt(jnp.float32(qd))
    rel = jnp.einsum("bthd,rhd->trbh", qp, p[::-1],
                     preferred_element_type=jnp.float32)
    scores = scores + _rel_shift(rel) / jnp.sqrt(jnp.float32(pd))
    scores = jnp.clip(scores, -100.0, 100.0)
    scores = jnp.where(const_row[:, None, None, None], 0.0, scores)
    if mask is not None:
        scores = jnp.where(mask[:, None, :, :], scores, _NEG)
    return jax.nn.softmax(scores, axis=-1).astype(w_dtype)


def _xla_attend(q, k, qp, p, v, mask, const_row, w_dtype):
    w = xla_weights(q, k, qp, p, mask, const_row, w_dtype)
    return jnp.einsum("bhts,bshd->bthd", w, v,
                      preferred_element_type=jnp.float32)


# ------------------------------------------------------------ custom vjp
@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def _zip_attend(q, k, qp, p, v, mask, const_row, w_dtype):
    return _flash_forward(q, k, qp, p, v, mask, const_row, w_dtype)


def _fwd(q, k, qp, p, v, mask, const_row, w_dtype):
    out = _flash_forward(q, k, qp, p, v, mask, const_row, w_dtype)
    return out, (q, k, qp, p, v, mask, const_row)


def _bwd(w_dtype, res, g):
    q, k, qp, p, v, mask, const_row = res

    def f(q, k, qp, p, v):
        return _xla_attend(q, k, qp, p, v, mask, const_row, w_dtype)

    _, vjp = jax.vjp(f, q, k, qp, p, v)
    dq, dk, dqp, dp, dv = vjp(g)
    zeros = [None if m is None
             else np.zeros(m.shape, jax.dtypes.float0)
             for m in (mask, const_row)]
    return (dq, dk, dqp, dp, dv, *zeros)


_zip_attend.defvjp(_fwd, _bwd)


def zip_attend(q, k, qp, p, v, mask=None, const_row=None,
               w_dtype=jnp.bfloat16):
    """Fused zipformer attention: returns attended values (B,T,H,vd) f32.

    q, k: (B,T,H,qd) queries/keys; qp: (B,T,H,pd) positional queries;
    p: (2T−1,H,pd) projected compact-rel-pos table (offsets −(T−1)..T−1);
    v: (B,T,H,vd) values; mask: (B,T,T) bool, True = may attend;
    const_row: (B,) bool — rows with True use uniform weights over allowed
    positions (const-attention regularization). `w_dtype` is the dtype the
    softmaxed weights are cast to before the value contraction, matching
    the materialized path bit-for-bit."""
    B = q.shape[0]
    if const_row is None:
        const_row = jnp.zeros((B,), bool)
    return _zip_attend(q, k, qp, p, v, mask, const_row, w_dtype)

"""Training-stability regularizers from the icefall scaling toolkit.

Parity targets (reference model/layer/scaling.py):
- ScheduledFloat / PiecewiseLinear (:49-221): step-indexed hyperparameter
  schedules. Here a pure function of a traced `step` scalar via linear
  interpolation — no retracing, value computed inside the jitted step.
- Balancer (:719-903): identity in the forward pass; the backward pass adds
  a gradient that steers per-channel activation statistics (mean/stddev
  and RMS magnitude) into configured ranges. The positive-fraction and
  abs-value limits are converted to mean/stddev and RMS limits exactly as
  the reference does (scaling.py:861-899: approximate inverse erf and the
  sqrt(pi/2) normal-absolute-moment factor).
- Whiten (:949-1096): identity forward; backward adds the gradient of a
  covariance-whitening penalty when the feature covariance is too
  anisotropic (whitening metric above `whitening_limit`).

All limit/probability parameters may be traced scalars (e.g. outputs of a
`ScheduledFloat` evaluated on the global step), so the schedules run inside
one compiled step with zero retracing.

Deviation from the reference (documented, TPU-first): the reference applies
Balancer/Whiten stochastically with probability `prob` via host-side
`random.random()` (scaling.py:857-858) to save memory on CUDA; here the
extra gradient is applied every step scaled by `prob` — the same expected
gradient, but branch-free (XLA-friendly) and deterministic.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


class PiecewiseLinear:
    """y = interp(x) over (x, y) breakpoints (reference scaling.py:49-140)."""

    def __init__(self, *points: Tuple[float, float]):
        assert len(points) >= 1
        self.xs = jnp.asarray([p[0] for p in points], jnp.float32)
        self.ys = jnp.asarray([p[1] for p in points], jnp.float32)

    def __call__(self, x):
        return jnp.interp(jnp.asarray(x, jnp.float32), self.xs, self.ys)


class ScheduledFloat(PiecewiseLinear):
    """Step-indexed scalar schedule (reference scaling.py:142-221); call
    with the (traced) global step."""


def whitening_schedule(x: float, ratio: float = 2.0) -> ScheduledFloat:
    """reference zipformer.py:901-902."""
    return ScheduledFloat((0.0, x), (20000.0, ratio * x))


# --------------------------------------------------------------- balancer
def _positive_to_mean(p):
    """positive-fraction limit → mean/stddev limit via the reference's
    crude inverse erf (scaling.py:866-891); accepts traced scalars (the
    reference NonlinAttention schedules min/max_positive)."""
    eps = 1.0e-10
    x = -1.0 + 2.0 * jnp.asarray(p, jnp.float32)
    atanh = (jnp.log(1.0 + x + eps) - jnp.log(1.0 - x + eps)) / 2.0
    return 0.8139535143 * atanh


_ABS_TO_RMS = 1.25331413732  # sqrt(pi/2): E|x| → rms for normal data


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _balancer_core(x, params, channel_axis):
    return x


def _balancer_fwd(x, params, channel_axis):
    return x, (x, params)


def _balancer_bwd(channel_axis, res, g):
    x, params = res
    min_mean, max_mean, min_rms, max_rms, grad_scale = params
    axes = tuple(i for i in range(x.ndim) if i != channel_axis % x.ndim)

    def stat_loss(x32):
        uvar = jnp.mean(jnp.square(x32), axis=axes, keepdims=True)
        mean = jnp.mean(x32, axis=axes, keepdims=True)
        stddev = jnp.sqrt(jnp.maximum(uvar - mean * mean, 1e-20))
        rms = jnp.sqrt(jnp.maximum(uvar, 1e-20))
        m = mean / stddev
        m_loss = jnp.abs(m - jnp.clip(m, min_mean, max_mean))
        r_loss = jnp.abs(jnp.log(jnp.clip(rms, min_rms, max_rms) / rms))
        return jnp.sum(m_loss + r_loss)

    x32 = x.astype(jnp.float32)
    loss_grad = jax.grad(stat_loss)(x32)
    lg_rms = jnp.sqrt(jnp.maximum(
        jnp.mean(jnp.square(loss_grad), axis=axes, keepdims=True), 1e-20))
    loss_grad = loss_grad * (grad_scale / lg_rms)
    g32 = g.astype(jnp.float32)
    out = (g32 + jnp.abs(g32) * loss_grad).astype(g.dtype)
    return (out, jnp.zeros_like(params))


_balancer_core.defvjp(_balancer_fwd, _balancer_bwd)


def balancer(x, min_positive=0.05, max_positive=0.95, min_abs=0.2,
             max_abs=100.0, grad_scale=0.04, prob=1.0, channel_axis=-1):
    """Identity with stat-steering gradients (reference Balancer,
    scaling.py:719-903). All limit parameters may be traced scalars
    (ScheduledFloat outputs)."""
    params = jnp.stack([
        _positive_to_mean(min_positive),
        _positive_to_mean(max_positive),
        _ABS_TO_RMS * jnp.asarray(min_abs, jnp.float32),
        _ABS_TO_RMS * jnp.asarray(max_abs, jnp.float32),
        jnp.asarray(grad_scale, jnp.float32)
        * jnp.asarray(prob, jnp.float32),
    ])
    return _balancer_core(x, params, channel_axis)


# ----------------------------------------------------------------- whiten
def _whitening_metric(x: jnp.ndarray) -> jnp.ndarray:
    """ratio of mean-squared eigenvalue to squared-mean eigenvalue of the
    centered feature covariance — 1.0 when perfectly white, grows with
    anisotropy (reference scaling.py:949-1000, num_groups=1)."""
    x = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
    x = x - jnp.mean(x, axis=0, keepdims=True)
    cov = (x.T @ x) / jnp.maximum(x.shape[0], 1)
    d = x.shape[-1]
    trace = jnp.trace(cov)
    frob2 = jnp.sum(jnp.square(cov))
    # = (Σλ²/d) / (Σλ/d)² ≥ 1, equality iff all eigenvalues equal
    return (frob2 / d) / jnp.maximum(jnp.square(trace / d), 1e-20)


@jax.custom_vjp
def _whiten_core(x, params):
    return x


def _whiten_fwd(x, params):
    return x, (x, params)


def _whiten_bwd(res, g):
    x, params = res
    whitening_limit, grad_scale = params
    metric, vjp = jax.vjp(_whitening_metric, x)
    (pgrad,) = vjp(jnp.ones(()))
    g_norm = jnp.sqrt(jnp.sum(jnp.square(g.astype(jnp.float32))))
    p_norm = jnp.sqrt(jnp.sum(jnp.square(pgrad))) + 1e-20
    scale = jnp.where(metric > whitening_limit,
                      grad_scale * g_norm / p_norm, 0.0)
    return ((g.astype(jnp.float32)
             + scale * pgrad).astype(g.dtype), jnp.zeros_like(params))


_whiten_core.defvjp(_whiten_fwd, _whiten_bwd)


def whiten(x, whitening_limit=2.0, grad_scale=0.01, prob=1.0):
    """Identity with covariance-whitening penalty gradients (reference
    Whiten, scaling.py:1003-1096). whitening_limit/prob may be traced
    (e.g. `whitening_schedule(...)` outputs); prob scales the expected
    gradient (see module docstring)."""
    params = jnp.stack([
        jnp.asarray(whitening_limit, jnp.float32),
        jnp.asarray(grad_scale, jnp.float32) * jnp.asarray(prob,
                                                           jnp.float32),
    ])
    return _whiten_core(x, params)


def limit_param_value(x: jnp.ndarray, min_val, max_val) -> jnp.ndarray:
    """Straight-through clamp (reference scaling.py limit_param_value):
    forward clamps, backward passes gradients unchanged. Bounds may be
    traced scalars."""
    clamped = jnp.clip(x, min_val, max_val)
    return x + jax.lax.stop_gradient(clamped - x)


def penalize_abs_values_gt(x: jnp.ndarray, limit: float,
                           penalty: float) -> jnp.ndarray:
    """Identity + gradient penalty on |x| > limit (reference scaling.py)."""

    @jax.custom_vjp
    def f(x):
        return x

    def fwd(x):
        return x, x

    def bwd(x, g):
        over = jnp.abs(x) > limit
        return (g + jnp.where(over, penalty * jnp.sign(x), 0.0),)

    f.defvjp(fwd, bwd)
    return f(x)

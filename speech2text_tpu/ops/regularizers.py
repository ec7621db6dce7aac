"""Training-stability regularizers from the icefall scaling toolkit.

Parity targets (reference model/layer/scaling.py):
- ScheduledFloat / PiecewiseLinear (:49-221): step-indexed hyperparameter
  schedules. Here a pure function of a traced `step` scalar via linear
  interpolation — no retracing, value computed inside the jitted step.
- Balancer (:719-903): identity in the forward pass; the backward pass adds
  a small gradient steering per-channel activation statistics (fraction of
  positive values and RMS magnitude) into configured ranges.
- Whiten (:949-1096): identity forward; backward adds the gradient of a
  covariance-whitening penalty when the feature covariance is too
  anisotropic (whitening metric above `whitening_limit`).

Both grad-shapers are custom_vjp identities, so they are free at inference
and compose with jit/remat. They are OFF by default (Zipformer trains in
bf16 on TPU where fp16-era emergency heuristics are less critical —
documented deviation); enable via Zipformer2Config for icefall-faithful
training dynamics.
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


# --------------------------------------------------------------- balancer
@partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5, 6))
def balancer(x, min_positive=0.05, max_positive=0.95, min_abs=0.2,
             max_abs=100.0, grad_scale=0.04, channel_axis=-1):
    """Identity with stat-steering gradients (reference Balancer)."""
    return x


def _balancer_fwd(x, min_positive, max_positive, min_abs, max_abs,
                  grad_scale, channel_axis):
    return x, x


def _balancer_bwd(min_positive, max_positive, min_abs, max_abs, grad_scale,
                  channel_axis, x, g):
    axes = tuple(i for i in range(x.ndim) if i != channel_axis % x.ndim)
    frac_pos = jnp.mean((x > 0).astype(jnp.float32), axis=axes,
                        keepdims=True)
    rms = jnp.sqrt(jnp.mean(jnp.square(x), axis=axes, keepdims=True) + 1e-20)
    g_rms = jnp.sqrt(jnp.mean(jnp.square(g), axis=axes, keepdims=True)
                     + 1e-20)
    # sign pressure: too few positives → push up (negative extra grad on
    # loss means increasing x); too many → push down
    sign_err = (jnp.maximum(min_positive - frac_pos, 0.0)
                - jnp.maximum(frac_pos - max_positive, 0.0))
    # magnitude pressure: rms below min_abs → grow |x|; above max → shrink
    mag_err = (jnp.maximum(1.0 - rms / min_abs, 0.0)
               - jnp.maximum(rms / max_abs - 1.0, 0.0))
    extra = -grad_scale * g_rms * (sign_err + mag_err * jnp.sign(x))
    return (g + extra,)


balancer.defvjp(_balancer_fwd, _balancer_bwd)


# ----------------------------------------------------------------- whiten
def _whitening_metric(x: jnp.ndarray) -> jnp.ndarray:
    """ratio of (mean eig)² proxy: E[diag²] of covariance vs uniform —
    1.0 when perfectly white, grows with anisotropy (reference
    scaling.py:949-1000)."""
    x = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
    x = x - jnp.mean(x, axis=0, keepdims=True)
    cov = (x.T @ x) / jnp.maximum(x.shape[0], 1)
    d = x.shape[-1]
    trace = jnp.trace(cov)
    frob2 = jnp.sum(jnp.square(cov))
    # = (Σλ²/d) / (Σλ/d)² ≥ 1, equality iff all eigenvalues equal
    return (frob2 / d) / jnp.maximum(jnp.square(trace / d), 1e-20)


@partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def whiten(x, whitening_limit=2.0, grad_scale=0.01):
    """Identity with covariance-whitening penalty gradients."""
    return x


def _whiten_fwd(x, whitening_limit, grad_scale):
    return x, x


def _whiten_bwd(whitening_limit, grad_scale, x, g):
    metric, vjp = jax.vjp(_whitening_metric, x)
    (pgrad,) = vjp(jnp.ones(()))
    g_rms = jnp.sqrt(jnp.mean(jnp.square(g)) + 1e-20)
    p_rms = jnp.sqrt(jnp.mean(jnp.square(pgrad)) + 1e-20)
    scale = jnp.where(metric > whitening_limit,
                      grad_scale * g_rms / p_rms, 0.0)
    return (g + scale * pgrad,)


whiten.defvjp(_whiten_fwd, _whiten_bwd)


def limit_param_value(x: jnp.ndarray, min_val: float,
                      max_val: float) -> jnp.ndarray:
    """Straight-through clamp (reference scaling.py limit_param_value):
    forward clamps, backward passes gradients unchanged."""
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

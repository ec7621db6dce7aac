"""ScaledAdam as an optax GradientTransformation — icefall-exact update.

TPU-native re-design of icefall's ScaledAdam (reference
optimizer/scaled_adam.py:112-736) keeping the exact update semantics:

1. **RMS-proportional step size** (reference `_step`, :674-713): the grad
   term added to the momentum buffer is `-lr·(1−β1)·param_rms·g/denom`,
   where `param_rms` is refreshed every `size_update_period` steps
   (:588-596) and clamped below by `param_min_rms`.
2. **Learned parameter scale** (reference `_size_update`, :610-672):
   per-step scale grads `Σ p·g` are buffered over `size_update_period`;
   on period boundaries a scale step with its own second moment
   (β2^period decay) multiplies the tensor, suppressed when rms is too
   small and clamped so rms never exceeds `param_max_rms`.
3. **Momentum lives in `delta`** with the lr folded in (reference :584,
   delta.mul_(beta1) then add) — lr changes take effect gradually.
4. **Median-based adaptive clipping** (reference `_get_clipping_scale`,
   :397-470): the clipped norm is the **rms-weighted** grad norm
   (`Σ(g·param_rms)²` for tensors, `scalar_lr_scale²·Σg²` for scalars);
   the threshold is `clipping_scale ×` the median of recent norms (×2
   during the early estimation window). Implemented as a jit-friendly
   ring buffer + rolling median instead of the reference's periodic
   host-side quartile recompute.
5. **Scalars** use plain Adam with `lr·scalar_lr_scale` and a ±scalar_max
   clamp applied to the parameter before the delta (reference
   `_step_scalar`, :715-736).

The reference's `BatchedOptimizer` stacks same-shaped tensors to cut CUDA
kernel-launch overhead (scaled_adam.py:16-109); under jit the whole update
is one fused XLA program, so that machinery is unnecessary here.

`dominant_parameter_report` reproduces the reference's dominant-parameter
diagnostics (`_show_gradient_dominating_parameter`, :472-527).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class ScaledAdamState(NamedTuple):
    count: jnp.ndarray            # scalar int32 (== icefall `step`)
    delta: optax.Updates          # momentum buffer (lr folded in)
    exp_avg_sq: optax.Updates     # second moment of grads
    scale_exp_avg_sq: optax.Updates  # second moment of scale grads (scalar)
    scale_grads: optax.Updates    # (size_update_period,) per tensor leaf
    param_rms: optax.Updates      # periodically-refreshed rms (scalar/leaf)
    norm_buffer: jnp.ndarray      # (buffer_size,) recent weighted norms


def _rms(p):
    return jnp.sqrt(jnp.mean(jnp.square(p)))


def scaled_adam(
    learning_rate,                # float or callable(step) -> lr
    betas=(0.9, 0.98),
    eps: float = 1e-8,
    clipping_scale: float | None = 2.0,
    param_min_rms: float = 1e-5,
    param_max_rms: float = 3.0,
    scalar_lr_scale: float = 0.1,
    scalar_max: float = 10.0,
    size_update_period: int = 4,
    norm_buffer_size: int = 100,  # == reference clipping_update_period
) -> optax.GradientTransformation:
    beta1, beta2 = betas
    P = size_update_period

    def lr_at(count):
        if callable(learning_rate):
            return learning_rate(count)
        return jnp.asarray(learning_rate, jnp.float32)

    def init(params):
        f32 = lambda p: jnp.zeros_like(p, jnp.float32)
        return ScaledAdamState(
            count=jnp.zeros((), jnp.int32),
            delta=jax.tree.map(f32, params),
            exp_avg_sq=jax.tree.map(f32, params),
            scale_exp_avg_sq=jax.tree.map(
                lambda p: jnp.zeros((), jnp.float32), params),
            scale_grads=jax.tree.map(
                lambda p: jnp.zeros((P,), jnp.float32), params),
            param_rms=jax.tree.map(
                lambda p: _rms(p.astype(jnp.float32)), params),
            norm_buffer=jnp.zeros((norm_buffer_size,), jnp.float32),
        )

    def update(grads, state, params=None):
        assert params is not None, "scaled_adam requires params"
        step = state.count                     # icefall `step` (0-based)
        cf = step.astype(jnp.float32) + 1.0
        lr = lr_at(step)

        # ---- rms-weighted global norm + median-based adaptive clipping
        # (reference _get_clipping_scale: tensors weighted by param_rms,
        # scalars by scalar_lr_scale)
        def leaf_sumsq(g, rms, p):
            g = g.astype(jnp.float32)
            if p.size <= 1:
                return jnp.sum(jnp.square(g)) * scalar_lr_scale ** 2
            return jnp.sum(jnp.square(g)) * jnp.square(rms)

        if clipping_scale is not None and clipping_scale > 0:
            tot = sum(jax.tree.leaves(jax.tree.map(
                leaf_sumsq, grads, state.param_rms, params)))
            gnorm = jnp.sqrt(tot)
            idx = jnp.mod(step, norm_buffer_size)
            buf = state.norm_buffer.at[idx].set(gnorm)
            n_valid = jnp.minimum(step + 1, norm_buffer_size)
            sorted_buf = jnp.sort(
                jnp.where(jnp.arange(norm_buffer_size) < n_valid,
                          buf, jnp.inf))
            median = sorted_buf[jnp.maximum((n_valid + 1) // 2 - 1, 0)]
            limit = clipping_scale * jnp.maximum(median, 1e-12)
            # early estimation window uses a doubled threshold
            # (reference :462-466); no clipping on the first steps
            limit = jnp.where(step < norm_buffer_size, 2.0 * limit, limit)
            clip = jnp.minimum(1.0, limit / jnp.maximum(gnorm, 1e-12))
            clip = jnp.where(step < 10, 1.0, clip)
        else:
            buf = state.norm_buffer
            clip = jnp.asarray(1.0, jnp.float32)

        is_boundary = jnp.mod(step, P) == P - 1
        size_step = (step + 1) // P
        beta2_corr = beta2 ** P
        bias2_size = 1.0 - beta2_corr ** jnp.maximum(
            size_step.astype(jnp.float32), 1.0)
        bias2 = 1.0 - beta2 ** cf

        def leaf_update(g, d, v, sv, sgbuf, rms, p):
            g = g.astype(jnp.float32) * clip
            p32 = p.astype(jnp.float32)
            d = beta1 * d                              # delta.mul_(beta1)
            if p.size <= 1:
                # _step_scalar: plain Adam, scaled lr, param clamp
                v = beta2 * v + (1.0 - beta2) * jnp.square(g)
                denom = jnp.sqrt(v / bias2) + eps
                d = d - (lr * scalar_lr_scale) * (1.0 - beta1) * g / denom
                clamped = jnp.clip(p32, -scalar_max, scalar_max)
                return (clamped + d - p32), d, v, sv, sgbuf, rms
            # buffer this step's scale grad; on period boundaries refresh
            # param_rms and apply the size update (reference :588-599)
            sgbuf = sgbuf.at[jnp.mod(step, P)].set(jnp.sum(g * p32))
            new_rms = jnp.where(is_boundary, _rms(p32), rms)
            sv_new = (beta2_corr * sv
                      + (1.0 - beta2_corr) * jnp.mean(jnp.square(sgbuf)))
            sv = jnp.where(is_boundary, sv_new, sv)
            s_denom = jnp.sqrt(sv) + eps
            scale_step = (-(lr * scalar_lr_scale) * jnp.sqrt(bias2_size)
                          * jnp.sum(sgbuf) / s_denom)
            scale_step = jnp.where(new_rms < param_min_rms, 0.0, scale_step)
            scale_step = jnp.minimum(
                scale_step, (param_max_rms - new_rms)
                / jnp.maximum(new_rms, 1e-12))
            apply_scale = is_boundary & (step > 0)
            d = d + jnp.where(apply_scale,
                              (1.0 - beta1) * scale_step, 0.0) * p32
            # main grad term (reference _step)
            v = beta2 * v + (1.0 - beta2) * jnp.square(g)
            vhat = v / jnp.where(bias2 < 0.99, bias2, 1.0)
            denom = jnp.sqrt(vhat) + eps
            alpha = -lr * (1.0 - beta1) * jnp.maximum(new_rms,
                                                      param_min_rms)
            d = d + alpha * g / denom
            return d, d, v, sv, sgbuf, new_rms

        leaves_g, treedef = jax.tree.flatten(grads)
        z = zip(leaves_g,
                treedef.flatten_up_to(state.delta),
                treedef.flatten_up_to(state.exp_avg_sq),
                treedef.flatten_up_to(state.scale_exp_avg_sq),
                treedef.flatten_up_to(state.scale_grads),
                treedef.flatten_up_to(state.param_rms),
                treedef.flatten_up_to(params))
        outs = [leaf_update(*args) for args in z]
        unf = lambda i: treedef.unflatten([o[i] for o in outs])
        return unf(0), ScaledAdamState(step + 1, unf(1), unf(2), unf(3),
                                       unf(4), unf(5), buf)

    return optax.GradientTransformation(init, update)


def dominant_parameter_report(grads, params, scalar_lr_scale: float = 0.1,
                              top_k: int = 5):
    """Which parameters dominate the rms-weighted grad norm (reference
    `_show_gradient_dominating_parameter`, scaled_adam.py:472-527).
    Host-side diagnostic: returns [(path, fraction_of_total_sumsq)]."""
    flat_g = jax.tree_util.tree_flatten_with_path(grads)[0]
    flat_p = dict(jax.tree_util.tree_flatten_with_path(params)[0])
    rows = []
    for path, g in flat_g:
        p = flat_p[path]
        g = jnp.asarray(g, jnp.float32)
        if p.size <= 1:
            s = float(jnp.sum(jnp.square(g))) * scalar_lr_scale ** 2
        else:
            s = float(jnp.sum(jnp.square(g))) * float(
                jnp.mean(jnp.square(p)))
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        rows.append((name, s))
    tot = sum(s for _, s in rows) or 1.0
    rows.sort(key=lambda r: -r[1])
    return [(n, s / tot) for n, s in rows[:top_k]]

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

Like the reference's `BatchedOptimizer` (scaled_adam.py:16-109), leaves
are **grouped by shape and stacked**, and the update runs vectorized over
each stack's leading axis. This matters on TPU just as it does on CUDA:
a per-leaf update on the ~600-leaf flagship tree lowers to thousands of
tiny sequential XLA ops and measured **56 ms of a 96 ms train step**;
grouping to the ~60 distinct shapes cuts the op count ~10×. The math per
tensor is unchanged (verified against the torch reference optimizer in
tests/test_scaled_adam_oracle.py).

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
    norm_buffer: jnp.ndarray      # (buffer_size,) recent weighted norms
    # per shape-group stacked state, each leading dim = #leaves in group:
    delta: tuple                  # (N, *shape) momentum (lr folded in)
    exp_avg_sq: tuple             # (N, *shape) second moment of grads
    scale_exp_avg_sq: tuple       # (N,) second moment of scale grads
    scale_grads: tuple            # (N, size_update_period)
    param_rms: tuple              # (N,) periodically-refreshed rms


def _rms(p):
    return jnp.sqrt(jnp.mean(jnp.square(p)))


def _group_by_shape(leaves):
    """Indices of leaves grouped by identical shape (static, derived from
    the tree structure — same role as the reference BatchedOptimizer's
    stacking, scaled_adam.py:16-109)."""
    by_shape: dict = {}
    for i, leaf in enumerate(leaves):
        by_shape.setdefault(tuple(leaf.shape), []).append(i)
    return list(by_shape.values())


def _bcast(x, ndim):
    """(N,) → (N, 1, ..., 1) for broadcasting against (N, *shape)."""
    return x.reshape(x.shape + (1,) * (ndim - 1))


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
        leaves = jax.tree.leaves(params)
        groups = _group_by_shape(leaves)
        delta, v, sv, sg, rms = [], [], [], [], []
        for idxs in groups:
            n = len(idxs)
            shape = (n,) + tuple(leaves[idxs[0]].shape)
            delta.append(jnp.zeros(shape, jnp.float32))
            v.append(jnp.zeros(shape, jnp.float32))
            sv.append(jnp.zeros((n,), jnp.float32))
            sg.append(jnp.zeros((n, P), jnp.float32))
            stacked = jnp.stack([leaves[i].astype(jnp.float32)
                                 for i in idxs])
            axes = tuple(range(1, stacked.ndim))
            # axis=() (scalar group) reduces nothing: per-leaf |x|
            rms.append(jnp.sqrt(jnp.mean(jnp.square(stacked), axis=axes)))
        return ScaledAdamState(
            count=jnp.zeros((), jnp.int32),
            norm_buffer=jnp.zeros((norm_buffer_size,), jnp.float32),
            delta=tuple(delta), exp_avg_sq=tuple(v),
            scale_exp_avg_sq=tuple(sv), scale_grads=tuple(sg),
            param_rms=tuple(rms))

    def update(grads, state, params=None):
        assert params is not None, "scaled_adam requires params"
        step = state.count                     # icefall `step` (0-based)
        cf = step.astype(jnp.float32) + 1.0
        lr = lr_at(step)

        leaves_g, treedef = jax.tree.flatten(grads)
        leaves_p = treedef.flatten_up_to(params)
        groups = _group_by_shape(leaves_g)

        # stack grads/params once per shape group (reused by the clipping
        # norm and the update)
        G, Pm = [], []
        for idxs in groups:
            G.append(jnp.stack([leaves_g[i].astype(jnp.float32)
                                for i in idxs]))
            Pm.append(jnp.stack([leaves_p[i].astype(jnp.float32)
                                 for i in idxs]))

        def grp_axes(x):
            return tuple(range(1, x.ndim))

        # ---- rms-weighted global norm + median-based adaptive clipping
        # (reference _get_clipping_scale: tensors weighted by param_rms,
        # scalars by scalar_lr_scale)
        if clipping_scale is not None and clipping_scale > 0:
            tot = jnp.zeros((), jnp.float32)
            for gi, idxs in enumerate(groups):
                g = G[gi]
                sumsq = jnp.sum(jnp.square(g), axis=grp_axes(g))
                scalar_grp = leaves_p[idxs[0]].size <= 1
                w = (scalar_lr_scale ** 2 if scalar_grp
                     else jnp.square(state.param_rms[gi]))
                tot = tot + jnp.sum(sumsq * w)
            gnorm = jnp.sqrt(tot)
            # Non-finite grads: the reference (_get_clipping_scale,
            # :481-499) turns a NaN clip ratio into ans=0.0 and zeroes the
            # grads — a momentum-decay-only step — so one bad batch cannot
            # poison delta/exp_avg_sq/params.  Keep the bad norm out of the
            # ring buffer too (a stored NaN/inf would corrupt every later
            # median), by re-writing the slot's previous value.
            finite = jnp.isfinite(gnorm)
            idx = jnp.mod(step, norm_buffer_size)
            buf = state.norm_buffer.at[idx].set(
                jnp.where(finite, gnorm, state.norm_buffer[idx]))
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
            clip = jnp.where(finite, clip, 0.0)
        else:
            buf = state.norm_buffer
            clip = jnp.asarray(1.0, jnp.float32)

        is_boundary = jnp.mod(step, P) == P - 1
        size_step = (step + 1) // P
        beta2_corr = beta2 ** P
        bias2_size = 1.0 - beta2_corr ** jnp.maximum(
            size_step.astype(jnp.float32), 1.0)
        bias2 = 1.0 - beta2 ** cf

        def group_update(g, d, v, sv, sgbuf, rms, p32, scalar_grp):
            """Vectorized over the stacked leading axis; per-tensor
            reductions run over the remaining axes. Identical math to the
            per-leaf form (oracle-tested)."""
            axes = grp_axes(g)
            # clip == 0.0 marks a non-finite batch: zero the grads outright
            # (inf * 0 is NaN, so a plain multiply would not sanitize).
            g = jnp.where(clip > 0.0, g * clip, jnp.zeros_like(g))
            d = beta1 * d                              # delta.mul_(beta1)
            if scalar_grp:
                # _step_scalar: plain Adam, scaled lr, param clamp
                v = beta2 * v + (1.0 - beta2) * jnp.square(g)
                denom = jnp.sqrt(v / bias2) + eps
                d = d - (lr * scalar_lr_scale) * (1.0 - beta1) * g / denom
                clamped = jnp.clip(p32, -scalar_max, scalar_max)
                return (clamped + d - p32), d, v, sv, sgbuf, rms
            # buffer this step's scale grad; on period boundaries refresh
            # param_rms and apply the size update (reference :588-599)
            sgbuf = sgbuf.at[:, jnp.mod(step, P)].set(
                jnp.sum(g * p32, axis=axes))
            new_rms = jnp.where(
                is_boundary,
                jnp.sqrt(jnp.mean(jnp.square(p32), axis=axes)), rms)
            sv_new = (beta2_corr * sv
                      + (1.0 - beta2_corr) * jnp.mean(jnp.square(sgbuf),
                                                      axis=1))
            sv = jnp.where(is_boundary, sv_new, sv)
            s_denom = jnp.sqrt(sv) + eps
            scale_step = (-(lr * scalar_lr_scale) * jnp.sqrt(bias2_size)
                          * jnp.sum(sgbuf, axis=1) / s_denom)
            scale_step = jnp.where(new_rms < param_min_rms, 0.0, scale_step)
            scale_step = jnp.minimum(
                scale_step, (param_max_rms - new_rms)
                / jnp.maximum(new_rms, 1e-12))
            apply_scale = is_boundary & (step > 0)
            d = d + _bcast(jnp.where(apply_scale,
                                     (1.0 - beta1) * scale_step, 0.0),
                           d.ndim) * p32
            # main grad term (reference _step)
            v = beta2 * v + (1.0 - beta2) * jnp.square(g)
            vhat = v / jnp.where(bias2 < 0.99, bias2, 1.0)
            denom = jnp.sqrt(vhat) + eps
            alpha = -lr * (1.0 - beta1) * jnp.maximum(new_rms,
                                                      param_min_rms)
            d = d + _bcast(alpha, d.ndim) * g / denom
            return d, d, v, sv, sgbuf, new_rms

        out_leaves = [None] * len(leaves_g)
        nd, nv, nsv, nsg, nrms = [], [], [], [], []
        for gi, idxs in enumerate(groups):
            scalar_grp = leaves_p[idxs[0]].size <= 1
            upd, d, v, sv, sg, rms = group_update(
                G[gi], state.delta[gi], state.exp_avg_sq[gi],
                state.scale_exp_avg_sq[gi], state.scale_grads[gi],
                state.param_rms[gi], Pm[gi], scalar_grp)
            nd.append(d), nv.append(v), nsv.append(sv)
            nsg.append(sg), nrms.append(rms)
            for k, i in enumerate(idxs):
                out_leaves[i] = upd[k]
        updates = treedef.unflatten(out_leaves)
        return updates, ScaledAdamState(
            step + 1, buf, tuple(nd), tuple(nv), tuple(nsv), tuple(nsg),
            tuple(nrms))

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

"""ScaledAdam as an optax GradientTransformation.

TPU-native re-design of icefall's ScaledAdam (reference
optimizer/scaled_adam.py:112-736), keeping its three core behaviors:

1. **RMS-proportional step size**: each tensor's update is scaled by its
   parameter RMS (clamped to [param_min_rms, param_max_rms]), so learning
   rate is relative to parameter magnitude rather than absolute.
2. **Learned parameter scale**: a per-tensor scalar "scale" direction
   (gradient ∝ Σ g·p) with its own Adam-style second moment, letting whole
   tensors grow/shrink multiplicatively (scale change clamped per step).
3. **Median-based adaptive gradient clipping**: the global grad norm is
   clipped against `clipping_scale ×` the running median of recent norms
   (ring buffer in optimizer state — jit-friendly, no host sync).

The reference's `BatchedOptimizer` stacks same-shaped tensors to cut CUDA
kernel-launch overhead (scaled_adam.py:16-109); under jit the whole update
is one fused XLA program, so that machinery is unnecessary here.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class ScaledAdamState(NamedTuple):
    count: jnp.ndarray            # scalar int32
    exp_avg: optax.Updates        # first moment of the combined update
    exp_avg_sq: optax.Updates     # second moment of grads
    scale_exp_avg_sq: optax.Updates  # second moment of scale grads (scalars)
    norm_buffer: jnp.ndarray      # (buffer_size,) recent global grad norms


def scaled_adam(
    learning_rate,                # float or callable(step) -> lr
    betas=(0.9, 0.98),
    eps: float = 1e-8,
    clipping_scale: float | None = 2.0,
    param_min_rms: float = 1e-5,
    param_max_rms: float = 3.0,
    scalar_lr_scale: float = 0.1,
    scalar_max: float = 10.0,
    norm_buffer_size: int = 128,
) -> optax.GradientTransformation:
    beta1, beta2 = betas

    def lr_at(count):
        if callable(learning_rate):
            return learning_rate(count)
        return jnp.asarray(learning_rate, jnp.float32)

    def init(params):
        zeros_like = lambda p: jnp.zeros_like(p, jnp.float32)
        scale_zeros = lambda p: jnp.zeros((), jnp.float32)
        return ScaledAdamState(
            count=jnp.zeros((), jnp.int32),
            exp_avg=jax.tree.map(zeros_like, params),
            exp_avg_sq=jax.tree.map(zeros_like, params),
            scale_exp_avg_sq=jax.tree.map(scale_zeros, params),
            norm_buffer=jnp.zeros((norm_buffer_size,), jnp.float32),
        )

    def update(grads, state, params=None):
        assert params is not None, "scaled_adam requires params"
        count = state.count + 1
        cf = count.astype(jnp.float32)
        lr = lr_at(state.count)
        bias2 = 1.0 - beta2 ** cf

        # ---- median-based adaptive clipping
        gnorm = optax.global_norm(grads)
        if clipping_scale is not None and clipping_scale > 0:
            idx = jnp.mod(state.count, norm_buffer_size)
            buf = state.norm_buffer.at[idx].set(gnorm)
            n_valid = jnp.minimum(count, norm_buffer_size)
            # median over the filled portion: sort, index middle of valid
            sorted_buf = jnp.sort(
                jnp.where(jnp.arange(norm_buffer_size) < n_valid,
                          buf, jnp.inf))
            median = sorted_buf[jnp.maximum(n_valid // 2 - 1, 0)]
            # warmup: don't clip until the buffer has some history
            limit = clipping_scale * jnp.maximum(median, 1e-12)
            clip = jnp.minimum(1.0, limit / jnp.maximum(gnorm, 1e-12))
            clip = jnp.where(count < 16, 1.0, clip)
        else:
            buf = state.norm_buffer
            clip = jnp.asarray(1.0, jnp.float32)

        def leaf_update(g, m, v, sv, p):
            g = g.astype(jnp.float32) * clip
            p32 = p.astype(jnp.float32)
            is_scalar = p.size <= 1
            v = beta2 * v + (1.0 - beta2) * jnp.square(g)
            denom = jnp.sqrt(v / bias2) + eps
            if is_scalar:
                # plain Adam step with scaled-down lr, magnitude clamp
                step_dir = g / denom
                m = beta1 * m + (1.0 - beta1) * step_dir
                delta = -(lr * scalar_lr_scale) * m
                new_p = jnp.clip(p32 + delta, -scalar_max, scalar_max)
                return new_p - p32, m, v, sv
            # tensor: RMS-relative step
            rms = jnp.sqrt(jnp.mean(jnp.square(p32)))
            rms = jnp.clip(rms, param_min_rms, param_max_rms)
            step_dir = rms * g / denom
            # learned scale direction: d loss/d log(scale) ≈ Σ g·p
            sg = jnp.sum(g * p32) / jnp.maximum(
                jnp.sqrt(jnp.sum(jnp.square(p32)) * p.size), 1e-12)
            sv = beta2 * sv + (1.0 - beta2) * jnp.square(sg)
            s_denom = jnp.sqrt(sv / bias2) + eps
            # per-step multiplicative scale change, clamped to ±10% · lr-ish
            scale_step = jnp.clip(sg / s_denom, -1.0, 1.0)
            step_dir = step_dir + scale_step * p32
            m = beta1 * m + (1.0 - beta1) * step_dir
            return -lr * m, m, v, sv

        leaves_g, treedef = jax.tree.flatten(grads)
        leaves_m = treedef.flatten_up_to(state.exp_avg)
        leaves_v = treedef.flatten_up_to(state.exp_avg_sq)
        leaves_sv = treedef.flatten_up_to(state.scale_exp_avg_sq)
        leaves_p = treedef.flatten_up_to(params)
        outs = [leaf_update(g, m, v, sv, p) for g, m, v, sv, p in
                zip(leaves_g, leaves_m, leaves_v, leaves_sv, leaves_p)]
        updates = treedef.unflatten([o[0] for o in outs])
        new_m = treedef.unflatten([o[1] for o in outs])
        new_v = treedef.unflatten([o[2] for o in outs])
        new_sv = treedef.unflatten([o[3] for o in outs])
        return updates, ScaledAdamState(count, new_m, new_v, new_sv, buf)

    return optax.GradientTransformation(init, update)

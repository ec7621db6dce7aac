#!/usr/bin/env python3
"""Per-piece cost of the Conv2dSubsampling frontend (fwd and fwd+bwd).

tools/backprof.py attributes ~9 ms/step of backward to the frontend at
B=24/10s — ~50x off MXU speed-of-light, the classic small-channel-conv
penalty (C_in 1..32). This times each sub-piece standalone (same shapes
as the flagship step) to pick the reformulation target:
  conv1 (3x3 s1, 1->32), conv2 (3x3 s2, 32->32), conv3 (3x3 s1, 32->32),
  convnext_dw (7x7 depthwise C=32), convnext_pw (Dense 32->96->32),
  head (Dense 1152->192 + BiasNorm).

Each timing jit-compiles fn and value_and_grad(loss of fn) as fori_loops
(single dispatch, k iters). Usage: python tools/frontprof.py
(env: BENCH_B, BENCH_ITERS, BENCH_DTYPE).

RELIABILITY CAVEAT (measured): standalone piece timings do NOT compose
to in-step costs — XLA fuses/schedules the frontend differently inside
the full train step (this tool once measured conv2 fwd_bwd FASTER than
its own fwd, and conv1 standalone at 4.9 ms while replacing it with an
equivalent matmul changed the full step by ~0). Use full-step bench.py
A/Bs to accept/reject changes; use this only to generate hypotheses.
See docs/evidence/backprof_r3_lattice.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_T0 = time.time()


def log(msg):
    print(f"[frontprof +{time.time() - _T0:5.1f}s] {msg}",
          file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    import flax.linen as nn

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     os.path.join(_REPO, ".jax_cache")))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from speech2text_tpu.models.zipformer import (BiasNorm, ConvNeXtBlock,
                                                  Conv2dSubsampling, swoosh_l,
                                                  swoosh_r, scaled_init)

    B = int(os.environ.get("BENCH_B", 24))
    k = int(os.environ.get("BENCH_ITERS", 50))
    dt = jnp.bfloat16 if os.environ.get("BENCH_DTYPE",
                                        "bfloat16") == "bfloat16" else \
        jnp.float32
    T, F, C = 998, 80, 32
    rng = np.random.default_rng(0)

    def timeit(name, module, x):
        params = module.init(jax.random.PRNGKey(0), x)["params"]

        def fwd_loss(p, c):
            out = module.apply({"params": p}, x + c * 1e-30)
            return jnp.sum(out.astype(jnp.float32) ** 2) * 1e-12

        @jax.jit
        def run_f(c0):
            return lax.fori_loop(
                0, k, lambda i, c: fwd_loss(params, c).astype(jnp.float32),
                c0)

        @jax.jit
        def run_fb(c0):
            def body(c):
                l, g = jax.value_and_grad(fwd_loss)(params, c)
                leaves = jax.tree_util.tree_leaves(g)
                return l + sum(jnp.sum(jnp.abs(x_).astype(jnp.float32))
                               for x_ in leaves) * 1e-30
            return lax.fori_loop(0, k, lambda i, c: body(c), c0)

        res = {}
        for tag_, fn in (("fwd", run_f), ("fwd_bwd", run_fb)):
            c = float(fn(jnp.zeros((), jnp.float32)))
            t0 = time.perf_counter()
            c = float(fn(jnp.zeros((), jnp.float32)))
            res[tag_] = (time.perf_counter() - t0) / k * 1e3
            log(f"{name}/{tag_}: {res[tag_]:.3f} ms (carry {c:.3g})")
        return res

    class Conv1(nn.Module):
        @nn.compact
        def __call__(self, x):
            return swoosh_r(nn.Conv(C, (3, 3), padding="VALID",
                                    dtype=dt)(x))

    class Conv2(nn.Module):
        @nn.compact
        def __call__(self, x):
            return swoosh_r(nn.Conv(C, (3, 3), strides=(2, 2),
                                    padding="VALID", dtype=dt)(x))

    class Conv3(nn.Module):
        @nn.compact
        def __call__(self, x):
            return swoosh_r(nn.Conv(C, (3, 3), padding="VALID",
                                    dtype=dt)(x))

    class Dw(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Conv(C, (7, 7), padding="VALID",
                           feature_group_count=C, dtype=dt)(
                jnp.pad(x, ((0, 0), (6, 0), (3, 3), (0, 0))))

    class Pw(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = swoosh_l(nn.Dense(C * 3, dtype=dt)(x))
            return nn.Dense(C, dtype=dt, kernel_init=scaled_init(0.01))(h)

    class Head(nn.Module):
        @nn.compact
        def __call__(self, h):
            B_, T2, F2, C_ = h.shape
            return BiasNorm(dt)(nn.Dense(192, dtype=dt)(
                h.reshape(B_, T2, F2 * C_)))

    class Full(nn.Module):
        @nn.compact
        def __call__(self, x):
            sub = Conv2dSubsampling(192, dtype=dt, causal=True)
            h, _ = sub(x, jnp.full((x.shape[0],), x.shape[1], jnp.int32))
            return h

    x0 = jnp.asarray(rng.standard_normal((B, T, F)), jnp.float32)
    h1 = jnp.asarray(rng.standard_normal((B, T - 2, F - 2, C)), dt)
    h2 = jnp.asarray(rng.standard_normal((B, 497, 38, C)), dt)
    h3 = jnp.asarray(rng.standard_normal((B, 495, 36, C)), dt)

    out = {
        "full": timeit("full", Full(), x0),
        "conv1": timeit("conv1", Conv1(), x0[..., None].astype(dt)),
        "conv2": timeit("conv2", Conv2(), h1),
        "conv3": timeit("conv3", Conv3(), h2),
        "convnext_dw": timeit("convnext_dw", Dw(), h3),
        "convnext_pw": timeit("convnext_pw", Pw(), h3),
        "head": timeit("head", Head(), h3),
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Roofline check for the flagship train step: FLOPs + HBM bytes from
XLA's cost analysis vs measured step time → MFU and HBM-BW utilization.

Answers "how close to speed-of-light is the step?" with the compiler's
own op counts (jax `compiled.cost_analysis()`), rather than hand
arithmetic. Peaks are TPU v5e: 197 TFLOP/s bf16 (matmul), 98.5 TFLOP/s
f32, ~819 GB/s HBM. XLA reports flops in f32-equivalent terms (a bf16
MXU matmul still counts each multiply-add as 2 flops), so `mfu_bf16` —
flops / (time × bf16 peak) — is the honest utilization number for a
bf16-compute model; `roofline_bound` says which resource the step is
closer to saturating.

Usage: python tools/mfu.py   (env: BENCH_B, BENCH_ITERS, BENCH_SCORE_DTYPE)
Prints one JSON object; record results in docs/evidence/.
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

V5E_BF16_FLOPS = 197e12
V5E_F32_FLOPS = 98.5e12
V5E_HBM_BYTES_PER_S = 819e9


def log(msg):
    print(f"[mfu +{time.time() - _T0:5.1f}s] {msg}", file=sys.stderr,
          flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import optax
    from jax import lax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     os.path.join(_REPO, ".jax_cache")))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_default_prng_impl", "rbg")

    from __graft_entry__ import _build_model, _flagship_config
    from speech2text_tpu.data.frontend import Fbank, FbankConfig
    from speech2text_tpu.losses import Loss
    from speech2text_tpu.optim import scaled_adam

    vocab = 128
    remat_policy = os.environ.get("BENCH_REMAT_POLICY", "full")
    remat = (os.environ.get("BENCH_REMAT", "0") != "0"
             or remat_policy != "full")
    cfg = _flagship_config(vocab, dtype="bfloat16", remat=remat)
    cfg["encoder"]["config"]["remat_policy"] = remat_policy
    cfg["encoder"]["config"]["score_dtype"] = \
        os.environ.get("BENCH_SCORE_DTYPE", "bfloat16")
    cfg["encoder"]["config"]["use_flash_attn"] = \
        os.environ.get("BENCH_FLASH", "0") != "0"
    model = _build_model(cfg)
    fbank = Fbank(FbankConfig(num_mel_bins=80, snip_edges=True))
    loss_obj = Loss({"model": "Pruned_Rnnt", "config": {}})
    tx = scaled_adam(learning_rate=1e-3)

    B = int(os.environ.get("BENCH_B", 24))
    N, U = 10 * 16000, 48
    k = int(os.environ.get("BENCH_ITERS", 20))
    rng = np.random.default_rng(0)
    pcm = jnp.asarray(rng.standard_normal((B, N)) * 0.1, jnp.float32)
    pcm_lens = jnp.full((B,), N, jnp.int32)
    labels = jnp.asarray(rng.integers(1, vocab, (B, U)), jnp.int32)
    lab_lens = jnp.full((B,), U, jnp.int32)

    @jax.jit
    def init_all(key):
        feats, feat_lens = fbank(pcm, pcm_lens)
        p = model.init({"params": key}, feats, feat_lens, labels,
                       lab_lens)["params"]
        return p, tx.init(p)

    params, opt_state = init_all(jax.random.PRNGKey(0))
    log("params initialized")

    def one_step(params, opt_state, key):
        feats, feat_lens = fbank(pcm, pcm_lens)

        def lf(p):
            out = model.apply({"params": p}, feats, feat_lens, labels,
                              lab_lens, deterministic=False,
                              rngs={"dropout": key})
            pruned = loss_obj({"logits": out["logits"],
                               "ranges": out["ranges"],
                               "logits_length": out["enc_lens"],
                               "label": labels, "label_length": lab_lens})
            return 0.5 * out["simple_loss"] + 0.5 * pruned

        loss, grads = jax.value_and_grad(lf)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    # cost analysis on the SINGLE step (the fori_loop program reports the
    # whole k-step loop; per-step numbers are cleaner from the unrolled 1)
    lowered = jax.jit(one_step).lower(params, opt_state,
                                      jax.random.PRNGKey(1))
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    flops = float(ca.get("flops", float("nan")))
    hbm_bytes = float(ca.get("bytes accessed", float("nan")))
    log(f"cost analysis: flops={flops:.3e}, bytes={hbm_bytes:.3e}")

    # timing: k steps in one fori_loop, like bench.py
    def run_k(params, opt_state, key):
        def body(i, carry):
            params, opt_state, key, _ = carry
            key, sub = jax.random.split(key)
            params, opt_state, loss = one_step(params, opt_state, sub)
            return (params, opt_state, key, loss)

        return lax.fori_loop(0, k, body,
                             (params, opt_state, key,
                              jnp.zeros((), jnp.float32)))

    runner = jax.jit(run_k, donate_argnums=(0, 1))
    params, opt_state, _, loss = runner(params, opt_state,
                                        jax.random.PRNGKey(1))
    _ = float(loss)
    t0 = time.perf_counter()
    params, opt_state, _, loss = runner(params, opt_state,
                                        jax.random.PRNGKey(2))
    _ = float(loss)
    dt = (time.perf_counter() - t0) / k
    log(f"measured {dt * 1e3:.2f} ms/step")

    achieved_flops = flops / dt
    achieved_bw = hbm_bytes / dt
    result = {
        "B": B,
        "ms_per_step": round(dt * 1e3, 2),
        "xla_flops_per_step": flops,
        "xla_hbm_bytes_per_step": hbm_bytes,
        "achieved_tflops": round(achieved_flops / 1e12, 2),
        "achieved_hbm_gbps": round(achieved_bw / 1e9, 1),
        "mfu_bf16": round(achieved_flops / V5E_BF16_FLOPS, 4),
        "mfu_f32": round(achieved_flops / V5E_F32_FLOPS, 4),
        "hbm_bw_util": round(achieved_bw / V5E_HBM_BYTES_PER_S, 4),
        "roofline_bound": ("hbm" if achieved_bw / V5E_HBM_BYTES_PER_S
                           > achieved_flops / V5E_BF16_FLOPS else "flops"),
    }
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()

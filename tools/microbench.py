#!/usr/bin/env python3
"""Per-segment microbenchmark of the flagship train step (bench.py shapes).

Times each pipeline segment as its own k-iteration `lax.fori_loop` device
program (single dispatch, like bench.py), printing a JSON breakdown in
ms/step. Segments chain through the loop carry with a `carry * 1e-30`
input perturbation so XLA cannot hoist the loop body as loop-invariant.

Usage: python tools/microbench.py  (env: BENCH_B, BENCH_ITERS, BENCH_DTYPE)
Output schema matches docs/evidence/microbench_segments.json.
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_T0 = time.time()


def log(msg):
    print(f"[microbench +{time.time() - _T0:5.1f}s] {msg}",
          file=sys.stderr, flush=True)


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
    from speech2text_tpu.tasks.rnnt import RnntModel

    vocab = 128
    cfg = _flagship_config(vocab,
                           dtype=os.environ.get("BENCH_DTYPE", "bfloat16"))
    cfg["encoder"]["config"]["score_dtype"] = \
        os.environ.get("BENCH_SCORE_DTYPE", "float32")
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
        return p, tx.init(p), feats, feat_lens

    params, opt_state, feats, feat_lens = init_all(jax.random.PRNGKey(0))
    log("params initialized")

    def timed(name, body0):
        """body0: carry_scalar -> new scalar; timed as one fori_loop."""

        @jax.jit
        def run(c0):
            return lax.fori_loop(0, k, lambda i, c: body0(c), c0)

        c = float(run(jnp.zeros((), jnp.float32)))   # warm/compile
        t0 = time.perf_counter()
        c = float(run(jnp.zeros((), jnp.float32)))   # fence via host fetch
        dt = (time.perf_counter() - t0) / k * 1e3
        log(f"{name}: {dt:.2f} ms/step (carry {c:.3g})")
        return dt

    def fb(c):
        f, fl = fbank(pcm + c * 1e-30, pcm_lens)
        return f.astype(jnp.float32).mean()

    def enc(c):
        e, el = model.apply({"params": params}, feats + c * 1e-30,
                            feat_lens, True, method=RnntModel.encode)
        return e.astype(jnp.float32).mean()

    def full_fwd(c):
        out = model.apply({"params": params}, feats + c * 1e-30,
                          feat_lens, labels, lab_lens)
        pruned = loss_obj({"logits": out["logits"], "ranges": out["ranges"],
                           "logits_length": out["enc_lens"],
                           "label": labels, "label_length": lab_lens})
        return 0.5 * out["simple_loss"] + 0.5 * pruned

    def fwd_bwd(c):
        def lf(p):
            out = model.apply({"params": p}, feats + c * 1e-30, feat_lens,
                              labels, lab_lens)
            pruned = loss_obj({"logits": out["logits"],
                               "ranges": out["ranges"],
                               "logits_length": out["enc_lens"],
                               "label": labels, "label_length": lab_lens})
            return 0.5 * out["simple_loss"] + 0.5 * pruned

        loss, grads = jax.value_and_grad(lf)(params)
        return loss + optax.global_norm(grads) * 1e-30

    res = {"fbank": timed("fbank", fb),
           "enc_fwd": timed("enc_fwd", enc),
           "full_fwd": timed("full_fwd", full_fwd),
           "fwd_bwd": timed("fwd_bwd", fwd_bwd)}

    # full step incl. optimizer — donated params like bench.py
    @partial(jax.jit, donate_argnums=(0, 1))
    def run_full(params, opt_state, key):
        def body(i, carry):
            params, opt_state, key, _ = carry
            key, sub = jax.random.split(key)
            f, fl = fbank(pcm, pcm_lens)

            def lf(p):
                out = model.apply({"params": p}, f, fl, labels, lab_lens,
                                  deterministic=False,
                                  rngs={"dropout": sub})
                pruned = loss_obj({"logits": out["logits"],
                                   "ranges": out["ranges"],
                                   "logits_length": out["enc_lens"],
                                   "label": labels,
                                   "label_length": lab_lens})
                return 0.5 * out["simple_loss"] + 0.5 * pruned

            loss, grads = jax.value_and_grad(lf)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state, key,
                    loss)

        return lax.fori_loop(0, k, body,
                             (params, opt_state, key,
                              jnp.zeros((), jnp.float32)))

    params, opt_state, _, loss = run_full(params, opt_state,
                                          jax.random.PRNGKey(1))
    _ = float(loss)
    t0 = time.perf_counter()
    params, opt_state, _, loss = run_full(params, opt_state,
                                          jax.random.PRNGKey(2))
    _ = float(loss)
    res["full_step"] = (time.perf_counter() - t0) / k * 1e3
    log(f"full_step: {res['full_step']:.2f} ms/step")

    res["derived"] = {
        "encoder_fwd": res["enc_fwd"] - res["fbank"],
        "pred_joiner_lattice_fwd": res["full_fwd"] - res["enc_fwd"],
        "backward": res["fwd_bwd"] - res["full_fwd"],
        "optimizer_and_dropout": res["full_step"] - res["fwd_bwd"]
                                 - res["fbank"],
    }
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()

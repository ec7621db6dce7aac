#!/usr/bin/env python3
"""Backward-pass cost attribution for the flagship train step.

The per-segment microbench (tools/microbench.py) shows the backward pass
is the dominant segment once the forward is tuned. XLA trace tools are
awkward over the axon tunnel, so this attributes backward cost by
*ablation*: re-time grad(loss) with `lax.stop_gradient` spliced at chosen
cut points and difference the timings. Each variant is one compiled
`lax.fori_loop` program (single dispatch), like bench.py.

Cut points (each removes that subgraph's BACKWARD only; forwards all run):
  - attn_weights : stop_gradient on every attention-weights tensor
                   (softmax output) -> removes score-einsum/rel-shift/
                   softmax backward in every layer
  - encoder      : stop_gradient on encoder output -> only the predictor/
                   joiner/lattice backward remains
  - none         : full grad (reference point)

Usage: python tools/backprof.py  (env: BENCH_B, BENCH_ITERS, BENCH_SCORE_DTYPE)
Prints one JSON line with ms/step per variant and derived attribution.
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
    print(f"[backprof +{time.time() - _T0:5.1f}s] {msg}",
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
    from speech2text_tpu.tasks.rnnt import RnntModel
    from speech2text_tpu import stopgrad_probe

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
        return p, feats, feat_lens

    params, feats, feat_lens = init_all(jax.random.PRNGKey(0))
    log("params initialized")

    # BACKPROF_DROPOUT=1 re-times with training-mode dropout active
    # (deterministic=False + per-step key), isolating the RNG/mask cost
    # that the default deterministic fwd_bwd timing hides.
    dropout = os.environ.get("BACKPROF_DROPOUT", "0") != "0"

    def make_fwd_bwd(variant):
        def lf(p, c, key):
            kw = ({"deterministic": False, "rngs": {"dropout": key}}
                  if dropout else {})
            with stopgrad_probe.ablate(variant):
                out = model.apply({"params": p}, feats + c * 1e-30,
                                  feat_lens, labels, lab_lens, **kw)
            pruned = loss_obj({"logits": out["logits"],
                               "ranges": out["ranges"],
                               "logits_length": out["enc_lens"],
                               "label": labels, "label_length": lab_lens})
            return 0.5 * out["simple_loss"] + 0.5 * pruned

        def body(c, key):
            key, sub = jax.random.split(key)
            loss, grads = jax.value_and_grad(lf)(params, c, sub)
            return loss + optax.global_norm(grads) * 1e-30, key

        @jax.jit
        def run(c0):
            return lax.fori_loop(0, k, lambda i, ck: body(*ck),
                                 (c0, jax.random.PRNGKey(7)))[0]

        return run

    variants = os.environ.get(
        "BACKPROF_VARIANTS",
        "none,attn_weights,encoder,ff,conv,selfattn,nonlin,frontend"
    ).split(",")
    res = {}
    for variant in variants:
        run = make_fwd_bwd(variant)
        c = float(run(jnp.zeros((), jnp.float32)))
        t0 = time.perf_counter()
        c = float(run(jnp.zeros((), jnp.float32)))
        dt = (time.perf_counter() - t0) / k * 1e3
        res[variant] = dt
        log(f"{variant}: {dt:.2f} ms/step (carry {c:.3g})")

    if "none" in res:
        res["derived"] = {f"{v}_backward": res["none"] - res[v]
                          for v in res if v not in ("none", "derived")}
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Benchmark: flagship (zipformer + stateless + pruned-RNN-T) training-step
throughput on the available accelerator.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Metric: utterances/sec/chip for the flagship train step on synthetic 10 s
utterances (B×T fixed shapes as the bucketed pipeline would emit).
`vs_baseline` divides by the driver's north-star target — 3× an estimated
A100 throughput for the reference recipe (reference publishes no numbers,
BASELINE.md; estimate: ~26 utts/s/A100 for zipformer-medium pruned RNN-T
≈ batch 16 × ~1.6 steps/s) → target 80 utts/s/chip. vs_baseline ≥ 1.0
means the target is met.
"""

from __future__ import annotations

import json
import time
from functools import partial

import numpy as np

A100_UTTS_PER_SEC_ESTIMATE = 26.0
TARGET = 3.0 * A100_UTTS_PER_SEC_ESTIMATE


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from __graft_entry__ import _build_model, _flagship_config
    from speech2text_tpu.data.frontend import Fbank, FbankConfig
    from speech2text_tpu.losses import Loss
    from speech2text_tpu.optim import scaled_adam

    import os
    vocab = 128
    dtype = os.environ.get("BENCH_DTYPE", "bfloat16")
    remat = os.environ.get("BENCH_REMAT", "1") != "0"
    model = _build_model(_flagship_config(vocab, dtype=dtype, remat=remat))
    fbank = Fbank(FbankConfig(num_mel_bins=80, snip_edges=True))
    loss_obj = Loss({"model": "Pruned_Rnnt", "config": {}})
    tx = scaled_adam(learning_rate=1e-3)

    # B=24 is the sweet spot on v5e (B=32 falls off a memory
    # cliff: 167 utt/s @24 vs 48 @32); see STATUS.md gap #6
    B = int(os.environ.get("BENCH_B", 24))
    SECS, U = 10, 48
    N = SECS * 16000
    rng = np.random.default_rng(0)
    pcm = jnp.asarray(rng.standard_normal((B, N)) * 0.1, jnp.float32)
    pcm_lens = jnp.full((B,), N, jnp.int32)
    labels = jnp.asarray(rng.integers(1, vocab, (B, U)), jnp.int32)
    lab_lens = jnp.full((B,), U, jnp.int32)

    feats, feat_lens = fbank(pcm, pcm_lens)
    params = model.init({"params": jax.random.PRNGKey(0)}, feats, feat_lens,
                        labels, lab_lens)["params"]
    opt_state = tx.init(params)

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, pcm, pcm_lens, labels, lab_lens, rng):
        feats, feat_lens = fbank(pcm, pcm_lens)

        def lf(p):
            out = model.apply({"params": p}, feats, feat_lens, labels,
                              lab_lens, deterministic=False,
                              rngs={"dropout": rng})
            pruned = loss_obj({"logits": out["logits"],
                               "ranges": out["ranges"],
                               "logits_length": out["enc_lens"],
                               "label": labels, "label_length": lab_lens})
            return 0.5 * out["simple_loss"] + 0.5 * pruned

        loss, grads = jax.value_and_grad(lf)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    # warmup/compile. NOTE: on the tunneled axon platform
    # block_until_ready does not actually block; a host fetch of a value
    # depending on the whole chain is the only reliable fence.
    k = jax.random.PRNGKey(1)
    params, opt_state, loss = step(params, opt_state, pcm, pcm_lens, labels,
                                   lab_lens, k)
    _ = float(loss)

    n_iters = 20
    t0 = time.perf_counter()
    for i in range(n_iters):
        k, sub = jax.random.split(k)
        params, opt_state, loss = step(params, opt_state, pcm, pcm_lens,
                                       labels, lab_lens, sub)
    _ = float(loss)  # forces execution of the full dependent chain
    dt = time.perf_counter() - t0

    utts_per_sec = B * n_iters / dt
    frames_per_sec = float(feat_lens.sum()) * n_iters / dt
    print(json.dumps({
        "metric": "utterances/sec/chip (zipformer pruned-RNN-T train step, "
                  f"B={B}, {SECS}s utts; frames/sec={frames_per_sec:.0f})",
        "value": round(utts_per_sec, 3),
        "unit": "utt/s/chip",
        "vs_baseline": round(utts_per_sec / TARGET, 4),
    }))


if __name__ == "__main__":
    main()

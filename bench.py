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
≈ batch 16 × ~1.6 steps/s, consistent with icefall zipformer-medium
training logs of ~30-40 min/epoch on 4×A100 for ~280k utts ≈ 29-39
utt/s/GPU) → target 80 utts/s/chip. vs_baseline ≥ 1.0 means the target is
met.

Engineering notes (round-2 fixes for the cold-process slow mode):
- The axon TPU's XLA compile service is slow enough that an uncached
  flagship-step compile exceeds 15 minutes. bench.py therefore pins a
  persistent compilation cache (repo-local `.jax_cache/`, pre-warmed and
  committed) unless JAX_COMPILATION_CACHE_DIR overrides it.
- The measured region runs BENCH_ITERS training steps inside ONE compiled
  `lax.fori_loop` program — a single device dispatch, as a prefetching
  input pipeline permits in real training — so per-step host/tunnel
  dispatch latency (the round-1 bimodality: 36 vs 167 utt/s at B=24)
  cannot contaminate the number.
- Phase progress is logged to stderr so a stall is diagnosable.
- On the axon platform `block_until_ready` does not actually block; a
  host fetch of a value depending on the whole chain is the only
  reliable fence.
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

import numpy as np

A100_UTTS_PER_SEC_ESTIMATE = 26.0
TARGET = 3.0 * A100_UTTS_PER_SEC_ESTIMATE

_T0 = time.time()
_REPO = os.path.dirname(os.path.abspath(__file__))
_CACHE = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                        os.path.join(_REPO, ".jax_cache"))


def log(msg: str) -> None:
    print(f"[bench +{time.time() - _T0:5.1f}s] {msg}", file=sys.stderr,
          flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import optax
    from jax import lax

    # NOTE: the JAX_COMPILATION_CACHE_DIR env var is silently ignored by
    # this jax install; only the explicit config.update works (verified:
    # config.compilation_cache_dir stays None under the env var).
    jax.config.update("jax_compilation_cache_dir", _CACHE)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    # rbg PRNG: threefry dropout-key generation costs 7.3 ms/step on v5e
    # (64.9 vs 72.2 ms measured); rbg is the TPU-recommended generator.
    # Training defaults to the same (trainer.prng_impl in build_task).
    jax.config.update("jax_default_prng_impl",
                      os.environ.get("BENCH_PRNG", "rbg"))

    from __graft_entry__ import _build_model, _flagship_config
    from speech2text_tpu.data.frontend import Fbank, FbankConfig
    from speech2text_tpu.losses import Loss
    from speech2text_tpu.optim import scaled_adam

    log(f"jax {jax.__version__}, devices={jax.devices()}, cache={_CACHE}")

    vocab = 128
    dtype = os.environ.get("BENCH_DTYPE", "bfloat16")
    # remat off by default: B=24 fits HBM without it and the step is ~9%
    # faster (104.8 vs 114.7 ms measured on v5e); BENCH_REMAT=1 re-enables.
    remat = os.environ.get("BENCH_REMAT", "0") != "0"
    # BENCH_REMAT_POLICY=dots: selective remat (save matmul outputs +
    # attention weights, recompute elementwise) — targets the B>128
    # activation-spill cliff without full-remat's recompute cost.
    # Setting a non-"full" policy implies remat: auto-enable it so an A/B
    # run can't silently measure no-remat while believing dots is active.
    remat_policy = os.environ.get("BENCH_REMAT_POLICY", "full")
    if remat_policy != "full" and not remat:
        if "BENCH_REMAT" in os.environ:
            log(f"WARNING: BENCH_REMAT=0 overrides "
                f"BENCH_REMAT_POLICY={remat_policy}; remat stays OFF")
            remat_policy = "full"
        else:
            log(f"BENCH_REMAT_POLICY={remat_policy}: auto-enabling remat")
            remat = True
    # scan-over-layers measured 11% slower per step (116.5 vs 104.8 ms) and
    # barely smaller serialized (68.6 vs 70.5 MB — the executable-size win
    # came from passing the batch as arguments, not from layer dedup), so
    # the bench unrolls by default; BENCH_SCAN=1 to flip.
    scan = os.environ.get("BENCH_SCAN", "0") != "0"
    cfg = _flagship_config(vocab, dtype=dtype, remat=remat)
    cfg["encoder"]["config"]["remat_policy"] = remat_policy
    cfg["encoder"]["config"]["scan_layers"] = scan
    # fused Pallas attention-WEIGHTS kernel (scores never hit HBM; see
    # ops/pallas/flash_attn.py). Round-4 A/B at the B=96 default: 128.0 vs
    # 131.3 ms/step (750 vs 731 utt/s) → on. At B=24 it loses (42.1 vs
    # 40.3) — BENCH_FLASH=0 to A/B.
    cfg["encoder"]["config"]["use_flash_attn"] = \
        os.environ.get("BENCH_FLASH", "1") != "0"
    # bf16 attention-score einsum outputs (f32 clip/mask/softmax
    # unchanged) — measured 64.0 → 58.3 ms/step (microbench, v5e); see
    # AttentionWeights.score_dtype. BENCH_SCORE_DTYPE=float32 to A/B back.
    cfg["encoder"]["config"]["score_dtype"] = \
        os.environ.get("BENCH_SCORE_DTYPE", "bfloat16")
    model = _build_model(cfg)
    # NOTE: any commit that changes the traced step (model/optimizer/loss)
    # invalidates the persistent-cache entries for init_all and run_k; the
    # next cold process then recompiles run_k on the axon compile service
    # (~15 min) — ALWAYS re-run bench.py to completion after such a change
    # so the driver's cold run hits a warm cache.
    fbank_kind = os.environ.get("BENCH_FBANK")  # "pallas" | "dft" | None
    fbank = Fbank(FbankConfig(num_mel_bins=80, snip_edges=True),
                  use_pallas=None if fbank_kind is None
                  else fbank_kind == "pallas")
    loss_obj = Loss({"model": "Pruned_Rnnt", "config": {}})
    tx = scaled_adam(learning_rate=1e-3)

    # B=128 is the measured throughput optimum on v5e (round-4 extended
    # sweep with the flash-weights kernel, docs/evidence/r4_perf_ab.json:
    # B=96→754, B=128→821, B=144→703, B=160→698, B=192→702 utt/s/chip —
    # a sharp cliff right past 128 as activations start spilling).
    # Larger batches amortize the batch-free rel-pos window tensors and
    # keep the MXU busier per HBM byte, until HBM pressure bites.
    B = int(os.environ.get("BENCH_B", 128))
    SECS, U = 10, 48
    N = SECS * 16000
    rng = np.random.default_rng(0)
    pcm = jnp.asarray(rng.standard_normal((B, N)) * 0.1, jnp.float32)
    pcm_lens = jnp.full((B,), N, jnp.int32)
    labels = jnp.asarray(rng.integers(1, vocab, (B, U)), jnp.int32)
    lab_lens = jnp.full((B,), U, jnp.int32)

    log("featurize + param init (one jitted program — eager init is "
        "hundreds of per-op tunnel round-trips on axon; the standalone "
        "pallas-fbank jit has an unstable cache key, so it lives inside "
        "this program too)...")

    @jax.jit
    def init_all(key):
        feats, feat_lens = fbank(pcm, pcm_lens)
        p = model.init({"params": key}, feats, feat_lens,
                       labels, lab_lens)["params"]
        return p, tx.init(p), feat_lens

    params, opt_state, feat_lens = init_all(jax.random.PRNGKey(0))
    log("params initialized")

    n_iters = int(os.environ.get("BENCH_ITERS", 20))

    def one_step(params, opt_state, key, pcm, pcm_lens, labels, lab_lens):
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

    @partial(jax.jit, donate_argnums=(0, 1), static_argnums=(3,))
    def run_k(params, opt_state, key, k, pcm, pcm_lens, labels, lab_lens):
        """k training steps as one device program (single dispatch).

        The batch arrays are arguments, not closed-over constants — embedded
        constants bloat the serialized executable that must be uploaded
        through the axon tunnel (~1 MB/s) on every cold process.
        """

        def body(i, carry):
            params, opt_state, key, _ = carry
            key, sub = jax.random.split(key)
            params, opt_state, loss = one_step(params, opt_state, sub,
                                               pcm, pcm_lens, labels,
                                               lab_lens)
            return (params, opt_state, key, loss)

        return lax.fori_loop(
            0, k, body,
            (params, opt_state, key, jnp.zeros((), jnp.float32)))

    log("compiling + warmup dispatch (cold compile is slow without a "
        "warm .jax_cache)...")
    key = jax.random.PRNGKey(1)
    params, opt_state, key, loss = run_k(params, opt_state, key, n_iters, pcm, pcm_lens, labels, lab_lens)
    warm_loss = float(loss)  # host fetch = the only reliable fence on axon
    log(f"warmup done (loss {warm_loss:.3f}); timing {n_iters} steps...")

    t0 = time.perf_counter()
    params, opt_state, key, loss = run_k(params, opt_state, key, n_iters, pcm, pcm_lens, labels, lab_lens)
    final_loss = float(loss)
    dt = time.perf_counter() - t0
    assert np.isfinite(final_loss), f"non-finite loss {final_loss}"

    utts_per_sec = B * n_iters / dt
    frames_per_sec = float(feat_lens.sum()) * n_iters / dt
    log(f"done: {dt:.2f}s for {n_iters} steps "
        f"({dt / n_iters * 1e3:.1f} ms/step)")

    result = {
        "metric": "utterances/sec/chip (zipformer pruned-RNN-T train step, "
                  f"B={B}, {SECS}s utts; frames/sec={frames_per_sec:.0f})",
        "value": round(utts_per_sec, 3),
        "unit": "utt/s/chip",
        "vs_baseline": round(utts_per_sec / TARGET, 4),
    }

    # ---- bucketed replay: the shape mix training actually sees ----------
    # The fixed-shape headline above measures one flattering (B, T); real
    # flagship training runs the bucket table (num_bucket=8, volume 600 s,
    # min_batch 16 — configs/training/zipformer_stateless_pruned_rnnt.yaml)
    # over variable-length utterances. Replay that table: durations drawn
    # LibriSpeech-like (normal μ=11 s σ=3.5 clipped to [2, 16.7] s), per-
    # bucket static shapes from the SAME build_bucket_specs the training
    # pipeline uses, per-utterance true lengths inside each bucket (so
    # padding/masking costs are real), steps allocated ∝ each bucket's
    # share of corpus audio (= its emission probability under the
    # constant-volume batcher). BENCH_BUCKETED=0 skips.
    if os.environ.get("BENCH_BUCKETED", "1") != "0":
        from speech2text_tpu.data.batcher import build_bucket_specs
        drng = np.random.default_rng(7)
        durs = np.clip(drng.normal(11.0, 3.5, 2000), 2.0, 16.7)
        toks = np.maximum(1, (durs * 4.8).astype(np.int64))
        specs = build_bucket_specs(durs, toks, num_buckets=8,
                                   volume_threshold=600.0,
                                   min_batch_size=16)
        edges = [0.0] + [s.hi_duration for s in specs]
        shares = np.asarray([
            durs[(durs > lo) & (durs <= hi)].sum()
            for lo, hi in zip(edges[:-1], edges[1:])])
        shares = shares / shares.sum()
        total_steps = int(os.environ.get("BENCH_BUCKETED_STEPS", 20))
        ks = np.maximum(1, np.rint(shares * total_steps).astype(int))

        batches = []
        for s, k in zip(specs, ks):
            b = s.batch_size
            u_durs = drng.uniform(max(edges[specs.index(s)], 2.0),
                                  s.hi_duration, b)
            p_lens = np.minimum((u_durs * 16000).astype(np.int32),
                                s.pcm_len)
            l_lens = np.minimum((u_durs * 4.8).astype(np.int32) + 1,
                                s.label_len)
            batches.append((
                jnp.asarray(drng.standard_normal((b, s.pcm_len)) * 0.1,
                            jnp.float32),
                jnp.asarray(p_lens),
                jnp.asarray(drng.integers(1, vocab, (b, s.label_len)),
                            jnp.int32),
                jnp.asarray(l_lens), int(k), s))

        log(f"bucketed replay: {len(batches)} bucket programs, "
            f"{int(ks.sum())} steps "
            f"(B={[s.batch_size for s in specs]}, "
            f"pcm_s={[s.pcm_len // 16000 for s in specs]})")
        # warmup/compile each bucket program; fenced per bucket for a
        # per-bucket ms/step log line (evidence), then one unfenced pass
        # for the clean aggregate number.
        per_bucket = []
        for pcm_b, pl_b, lb_b, ll_b, k, s in batches:
            t0 = time.perf_counter()
            params, opt_state, key, loss = run_k(
                params, opt_state, key, k, pcm_b, pl_b, lb_b, ll_b)
            float(loss)  # compile+run fence
            t_cold = time.perf_counter() - t0
            t0 = time.perf_counter()
            params, opt_state, key, loss = run_k(
                params, opt_state, key, k, pcm_b, pl_b, lb_b, ll_b)
            float(loss)
            t_warm = time.perf_counter() - t0
            per_bucket.append({"B": s.batch_size,
                               "pcm_s": s.pcm_len // 16000,
                               "steps": k,
                               "ms_per_step": round(t_warm / k * 1e3, 1)})
            log(f"  bucket B={s.batch_size:3d} {s.pcm_len // 16000:2d}s "
                f"x{k}: {t_warm / k * 1e3:6.1f} ms/step "
                f"(first pass {t_cold:.1f}s)")
        t0 = time.perf_counter()
        for pcm_b, pl_b, lb_b, ll_b, k, s in batches:
            params, opt_state, key, loss = run_k(
                params, opt_state, key, k, pcm_b, pl_b, lb_b, ll_b)
        bkt_loss = float(loss)  # single fence after all buckets
        bdt = time.perf_counter() - t0
        assert np.isfinite(bkt_loss), f"non-finite bucketed loss {bkt_loss}"
        n_utts = sum(s.batch_size * k for *_x, k, s in batches)
        bkt_rate = n_utts / bdt
        log(f"bucketed: {bdt:.2f}s for {int(ks.sum())} steps, "
            f"{n_utts} utts -> {bkt_rate:.1f} utt/s/chip")
        result["bucketed_utt_per_sec"] = round(bkt_rate, 3)
        result["bucketed_vs_baseline"] = round(bkt_rate / TARGET, 4)
        result["bucketed_detail"] = per_bucket

    print(json.dumps(result))


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Decode throughput: fp32 vs int8-quantized transducer decode.

Measures the post-encoder decode loop at flagship sizes on synthetic
encoder output — the quantized-execution counterpart of the reference's
dynamic-int8 ONNX export claim (reference task_factory/rnnt_task.py:
753-809). Prints a JSON line with both rates.

Modes (DEC_MODE):
  greedy (default) — RnntGreedyDecoding vs Int8RnntGreedyDecoding
  beam             — RnntBeamDecoding vs Int8RnntBeamDecoding
Predictor (DEC_PRED): Stateless (default) | Lstm

Usage: python tools/decode_bench.py
  (env: DEC_B, DEC_T, DEC_ITERS, DEC_MODE, DEC_PRED, DEC_BEAM)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     os.path.join(_REPO, ".jax_cache")))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from speech2text_tpu.decoding import (RnntBeamDecoding,
                                          RnntGreedyDecoding)
    from speech2text_tpu.models.joiner import Joiner, JoinerConfig
    from speech2text_tpu.models.predictor import (LstmPredictor,
                                                  LstmPredictorConfig,
                                                  StatelessPredictor,
                                                  StatelessPredictorConfig)
    from speech2text_tpu.quant import (Int8RnntBeamDecoding,
                                       Int8RnntGreedyDecoding)

    V, D = 128, 256
    B = int(os.environ.get("DEC_B", 24))
    T = int(os.environ.get("DEC_T", 247))       # 10 s utts post-encoder
    iters = int(os.environ.get("DEC_ITERS", 20))
    mode = os.environ.get("DEC_MODE", "greedy")
    pred_kind = os.environ.get("DEC_PRED", "Stateless")
    beam = int(os.environ.get("DEC_BEAM", 4))

    if pred_kind == "Lstm":
        pred_cfg_d = {"num_symbols": V, "output_dim": D,
                      "symbol_embedding_dim": 512, "num_lstm_layers": 2,
                      "lstm_hidden_dim": 512}
        pred = LstmPredictor(LstmPredictorConfig(**pred_cfg_d))
    else:
        pred_cfg_d = {"num_symbols": V, "output_dim": D,
                      "symbol_embedding_dim": 512, "context_size": 5}
        pred = StatelessPredictor(StatelessPredictorConfig(**pred_cfg_d))
    join_cfg = JoinerConfig(input_dim=D, output_dim=V,
                            use_out_project=False)
    join = Joiner(join_cfg)
    kp, kj, ke = jax.random.split(jax.random.PRNGKey(0), 3)
    params = {
        "predictor": pred.init(kp, jnp.zeros((1, 4), jnp.int32))["params"],
        "joiner": join.init(kj, jnp.zeros((1, 7, D)), jnp.asarray([7]),
                            jnp.zeros((1, 5, D)), jnp.asarray([4]),
                            jnp.ones((1, 4), jnp.int32))["params"],
    }
    enc_out = jax.random.normal(ke, (B, T, D), jnp.float32)
    enc_lens = jnp.full((B,), T, jnp.int32)

    class Tok:
        def decode(self, ids):
            return " ".join(str(int(i)) for i in ids)

    def pred_step(p, token, state):
        return pred.apply({"params": p["predictor"]}, token, state,
                          method=type(pred).streaming_step)

    def join_step(p, enc_t, pred_out):
        return join.apply({"params": p["joiner"]}, enc_t, pred_out,
                          method=Joiner.streaming_step)

    if mode == "beam":
        fp32 = RnntBeamDecoding(Tok(), pred_step, pred.init_state,
                                join_step, beam_size=beam,
                                cutoff_top_k=beam)
        int8 = Int8RnntBeamDecoding(Tok(), params, pred_cfg_d,
                                    {"use_out_project": False},
                                    beam_size=beam, cutoff_top_k=beam,
                                    predictor_model=pred_kind)
    else:
        fp32 = RnntGreedyDecoding(Tok(), pred_step, pred.init_state,
                                  join_step)
        int8 = Int8RnntGreedyDecoding(Tok(), params, pred_cfg_d,
                                      {"use_out_project": False},
                                      predictor_model=pred_kind)

    def timeit(name, sess, p):
        sess.decode(p, enc_out, enc_lens)         # compile + warm
        t0 = time.perf_counter()
        for _ in range(iters):
            sess.decode(p, enc_out, enc_lens)     # decode() fetches host-side
        dt = (time.perf_counter() - t0) / iters
        print(f"[decode_bench] {name}: {dt * 1e3:.2f} ms/batch "
              f"({B / dt:.1f} utt/s)", file=sys.stderr, flush=True)
        return B / dt

    r32 = timeit("fp32", fp32, params)
    r8 = timeit("int8", int8, None)
    print(json.dumps({"metric": f"{mode} transducer decode (post-encoder), "
                                f"pred={pred_kind}, B={B}, T={T}, V={V}"
                                + (f", beam={beam}" if mode == "beam"
                                   else ""),
                      "fp32_utt_per_sec": round(r32, 1),
                      "int8_utt_per_sec": round(r8, 1),
                      "int8_speedup": round(r8 / r32, 3)}))


if __name__ == "__main__":
    main()

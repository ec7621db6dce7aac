#!/usr/bin/env python3
"""Streaming ASR demo: decode wavs chunk-by-chunk with per-chunk latency.

Drives speech2text_tpu.streaming.StreamingAsrSession (raw PCM → streaming
fbank → zipformer streaming_step → greedy transducer continuation) over a
trained RNN-T-family run and prints the incremental transcript plus a
latency table. Counterpart of the reference's ONNX streaming deployment
path (reference model/encoder/zipformer.py:601-663 + runtime/).

Usage:
  python tools/stream_demo.py --train_config tasks/<run>/<cfg>.yaml \
      --wav /root/reference/sample_data/data/wavs/....wav \
      [--chunk_size 32] [--left_chunks 4] [--avg_best_k 2]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--train_config", required=True)
    ap.add_argument("--wav", required=True, nargs="+")
    ap.add_argument("--chunk_size", type=int, default=32,
                    help="post-frontend frames per step (÷ all ds factors)")
    ap.add_argument("--left_chunks", type=int, default=4)
    ap.add_argument("--avg_best_k", type=int, default=2)
    ap.add_argument("--checkpoints_dir", default=None)
    ap.add_argument("--export_dir", default=None,
                    help="also serialize the per-chunk serving graph "
                         "(prime/step StableHLO + streaming_spec.json)")
    args = ap.parse_args()

    from speech2text_tpu.config import load_config
    from speech2text_tpu.data.audio import read_wav
    from speech2text_tpu.streaming import StreamingAsrSession
    from speech2text_tpu.tasks import TaskFactory
    from speech2text_tpu.train.checkpoint import average_checkpoints
    from speech2text_tpu.utils.cache import \
        enable_persistent_compilation_cache
    enable_persistent_compilation_cache()

    cfg = load_config(args.train_config)
    task = TaskFactory(cfg["task"]["type"])(cfg)
    ckpt_dir = args.checkpoints_dir or os.path.join(
        cfg["task"]["export_path"], cfg["task"]["name"], "checkpoints")
    params = average_checkpoints(ckpt_dir, best_k=args.avg_best_k)
    print(f"loaded checkpoint average (best {args.avg_best_k}) "
          f"from {ckpt_dir}")

    sess = StreamingAsrSession(task, params, chunk_size=args.chunk_size,
                               left_context_chunks=args.left_chunks)
    if args.export_dir:
        from speech2text_tpu.export import export_streaming_session
        paths = export_streaming_session(sess, args.export_dir)
        print(f"serving graph exported: {paths}")

    chunk_ms = sess.step_samples / 16.0  # 16 kHz → ms of audio per chunk
    print(f"chunk = {sess.step_samples} samples ({chunk_ms:.0f} ms audio), "
          f"prime = {sess.prime_samples} samples")

    for wav_path in args.wav:
        pcm, sr = read_wav(wav_path)
        assert sr == 16000, f"expected 16 kHz, got {sr}"
        texts, lat = sess.run_utterance(pcm[None], measure_latency=True)
        print(f"\n== {os.path.basename(wav_path)} "
              f"({len(pcm) / sr:.2f} s) ==")
        print(f"transcript: {texts[0]}")
        if lat:
            steady = lat[1:] or lat
            print(f"latency ms/chunk: first(prime+compile)={lat[0]:.1f}  "
                  f"steady p50={np.percentile(steady, 50):.1f}  "
                  f"p95={np.percentile(steady, 95):.1f}  "
                  f"max={max(steady):.1f}")
            rtf = np.mean(steady) / chunk_ms
            print(f"steady-state RTF={rtf:.3f} "
                  f"({'real-time OK' if rtf < 1 else 'SLOWER than RT'})")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Inference entry point (reference inference.py:30-95 surface parity).

Usage:
  python inference.py --inference_config=configs/inference/<x>.yaml

Loads the inference YAML and its training YAML, restores a checkpoint
(named, latest, or top-k average — reference inference.py:79-90), runs the
test set, writes a per-utterance test report (utt/hyp/ref/wer) and corpus
WER (reference task_factory/asr_inference.py:25-85).
"""

from __future__ import annotations

import os

import jax
import numpy as np
from absl import app, flags

from speech2text_tpu.config import load_config, override
from speech2text_tpu.metrics import AsrMetric, word_error_rate
from speech2text_tpu.tasks import TaskFactory
from speech2text_tpu.train.checkpoint import (CheckpointManager,
                                              average_checkpoints)
from speech2text_tpu.utils.logging import get_logger, init_logging

FLAGS = flags.FLAGS
flags.DEFINE_string("inference_config", None, "YAML of inference setup.")
flags.DEFINE_multi_string("override", [], "dotted-key config overrides")
flags.mark_flag_as_required("inference_config")

_INFER_TO_TRAIN = {
    "ctc_inference": "CTC",
    "rnnt_inference": "Rnnt",
    "ctc_hybrid_rnnt_inference": "CTC_Hybrid_Rnnt",
    "pruned_rnnt_inference": "Pruned_Rnnt",
    "cif_inference": "CIF",
}


def run_inference(argv):
    from speech2text_tpu.utils.cache import \
        enable_persistent_compilation_cache
    enable_persistent_compilation_cache()

    del argv
    infer_cfg = load_config(FLAGS.inference_config)
    for ov in FLAGS.override:
        key, _, value = ov.partition("=")
        override(infer_cfg, key, value)

    task_section = infer_cfg["task"]
    # task.platform: cpu pins the host backend (the JAX_PLATFORMS env var
    # is ignored by the axon plugin; only this config update works)
    if task_section.get("platform"):
        jax.config.update("jax_platforms", str(task_section["platform"]))
    workdir = task_section["export_path"]
    os.makedirs(workdir, exist_ok=True)
    init_logging(os.path.join(workdir, "inference.log"))
    log = get_logger()

    train_cfg = load_config(task_section["train_config"])
    # spm path rewrite from the train export dir (reference
    # inference.py:50-55): training may have trained the subword model into
    # <workdir>/spm after the config was written
    tok = train_cfg.get("tokenizer", {})
    if tok.get("type") == "subword" and not (tok.get("config") or {}).get(
            "spm_model"):
        wd = os.path.join(train_cfg["task"]["export_path"],
                          train_cfg["task"]["name"])
        tok.setdefault("config", {})
        tok["config"]["spm_model"] = os.path.join(wd, "spm",
                                                  "tokenizer.model")
        tok["config"]["spm_vocab"] = os.path.join(wd, "spm",
                                                  "tokenizer.vocab")
    # test-set overrides (reference inference.py:42-55)
    testset = infer_cfg.get("testset", {}) or {}
    train_cfg["dataset"]["test_data"] = testset.get(
        "test_data", train_cfg["dataset"].get("eval_data"))
    ts_cfg = testset.get("config", {}) or {}
    if "feat_type" in ts_cfg and not ts_cfg["feat_type"].startswith(
            "torchscript"):
        if train_cfg["dataset"].get("feat_type") == "pcm" \
                and ts_cfg["feat_type"] != "pcm":
            # raw-waveform encoders (wav2vec2) consume PCM directly; a
            # spectral testset frontend can never match the model's input
            # contract, so keep pcm rather than crash in the encoder
            log.warning("testset feat_type=%s ignored: task was trained on "
                        "raw pcm (wav2vec2-style encoder)",
                        ts_cfg["feat_type"])
        else:
            train_cfg["dataset"]["feat_type"] = ts_cfg["feat_type"]
    if "feat_config" in ts_cfg and "num_mel_bins" in ts_cfg["feat_config"]:
        train_cfg["dataset"].setdefault("feat_config", {})["num_mel_bins"] \
            = ts_cfg["feat_config"]["num_mel_bins"]
    dec = infer_cfg.get("decoding", {}) or {}
    if dec.get("type"):
        train_cfg.setdefault("metric", {})["decode_method"] = dec["type"]
        for k, v in (dec.get("config", {}) or {}).items():
            train_cfg["metric"][k] = v
    streaming = infer_cfg.get("streaming", {}) or {}
    if streaming.get("is_encoder_streaming"):
        train_cfg.setdefault("metric", {})["encoder_streaming"] = True

    task_type = _INFER_TO_TRAIN[task_section["type"]]
    task = TaskFactory(task_type)(train_cfg)

    # ---- checkpoint selection (averaged | named | latest)
    train_workdir = os.path.join(train_cfg["task"]["export_path"],
                                 train_cfg["task"]["name"])
    ckpt_dir = task_section.get("checkpoints_dir") or os.path.join(
        train_workdir, "checkpoints")
    mode = "max" if task_section.get("descending") else "min"
    if task_section.get("chkpt_aver"):
        params = average_checkpoints(ckpt_dir,
                                     best_k=int(task_section.get(
                                         "aver_best_k", 5)), mode=mode)
    else:
        mgr = CheckpointManager(ckpt_dir, mode=mode)
        step = task_section.get("chkpt_name") or mgr.latest_step()
        params = mgr.restore(int(step))["params"]
    log.info("checkpoint loaded from %s", ckpt_dir)

    # ---- optional deployment export before testing (reference
    # rnnt_task.py:753-809: on_test_start ONNX export + dynamic int8 quant;
    # here StableHLO modules + int8 weights-only artifact)
    if task_section.get("module_export"):
        from speech2text_tpu.export import export_asr_modules, save_quantized
        exp_cfg = infer_cfg.get("module_export_config", {}) or {}
        export_asr_modules(task, params, workdir,
                           max_frames=int(exp_cfg.get("max_frames", 2000)),
                           max_label=int(exp_cfg.get("max_label", 128)))
        task.tokenizer.export_units(os.path.join(workdir, "units.txt"))
        if exp_cfg.get("export_int8", True):
            save_quantized(params, os.path.join(workdir, "weights.int8.npz"))

    # ---- optional ONNX export (reference rnnt_task.py:753-809 exact
    # parity: encoder/predictor/joiner .onnx + dynamic-int8 variants +
    # units.txt for sherpa-onnx / mnn-speech2text)
    if task_section.get("onnx_export"):
        from speech2text_tpu.export import export_onnx_modules
        onnx_cfg = infer_cfg.get("onnx_export_config", {}) or {}
        enc_cfg = onnx_cfg.get("onnx_encoder_config", {}) or {}
        export_onnx_modules(
            task, params, workdir,
            max_frames=int(enc_cfg.get("max_frames", 2000)),
            int8=bool(onnx_cfg.get("export_int8", True)))

    # ---- test loop with per-utterance report; batch sharded over the
    # mesh 'data' axis so an N-chip host decodes N× wide (the train step
    # is pjit-sharded the same way — see train/loop.py)
    from speech2text_tpu.parallel.mesh import (MeshConfig, batch_sharding,
                                               make_mesh, replicated,
                                               shard_batch)
    mesh = make_mesh(MeshConfig())
    task.data_config.batch_multiple = mesh.shape["data"]
    pipe = task.make_test_pipeline()
    eval_fwd = jax.jit(task.eval_forward,
                       in_shardings=(None, batch_sharding(mesh)),
                       out_shardings=replicated(mesh))
    metric = AsrMetric()
    report_path = os.path.join(workdir, "test_report.txt")
    with open(report_path, "w") as report, mesh:
        for batch in pipe:
            arrays = {k: v for k, v in batch.items()
                      if not isinstance(v, list)}
            arrays = shard_batch(mesh, arrays)
            out = eval_fwd(params, arrays)
            hyps = task.eval_hyps(out, params)
            refs = batch["text"]
            utts = batch["audio_filepath"]
            for utt, hyp, ref in zip(utts, hyps, refs):
                wer = word_error_rate([hyp], [ref])
                report.write(f"utt: {utt}\nhyp: {hyp}\nref: {ref}\n"
                             f"wer: {wer:.4f}\n\n")
            metric.update(hyps, refs)
    corpus_wer = metric.compute()
    with open(report_path, "a") as report:
        report.write(f"corpus wer: {corpus_wer:.4f} "
                     f"({metric.num_utts} utts)\n")
    log.info("corpus WER %.4f over %d utts → %s", corpus_wer,
             metric.num_utts, report_path)


if __name__ == "__main__":
    app.run(run_inference)

"""StableHLO export round-trips (deployment parity with the reference's
torchscript/ONNX exports, reference task_factory/rnnt_task.py:753-809 and
callbacks/callbacks.py:20-41).

Every exported artifact must deserialize with `jax.export.deserialize`
and reproduce the live module's outputs (to compile-variation
tolerance) — including the full
streaming per-chunk session graph (PCM → fbank → CMVN → encoder
streaming step → greedy transducer continuation)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech2text_tpu.export import (export_asr_modules,
                                    export_streaming_session, load_exported)
from speech2text_tpu.streaming import StreamingAsrSession
from speech2text_tpu.tasks import TaskFactory

VOCAB = 31

CFG = {
    "tokenizer": {"type": "char", "config": {}},
    "dataset": {"feat_type": "lhotes_fbank",
                "feat_config": {"num_mel_bins": 80},
                "data_aug_config": {}},
    "metric": {"decode_method": "rnnt_greedy_search",
               "encoder_streaming": True,
               "streaming_chunk_size": 8,
               "streaming_left_chunks": 4},
    "encoder": {"model": "Zipformer", "config": {
        "feature_dim": 80, "downsampling_factor": [1, 2],
        "num_encoder_layers": [1, 1], "feedforward_dim": [64, 64],
        "encoder_dim": [32, 32], "encoder_unmasked_dim": [24, 24],
        "num_heads": [2, 2], "query_head_dim": 8, "value_head_dim": 8,
        "pos_head_dim": 4, "pos_dim": 16, "cnn_module_kernel": [7, 7],
        "causal": True, "chunk_size": [8], "left_context_frames": [32],
        "dropout": 0.0}},
    "decoder": {"model": "Identity", "config": {"dummy": -1}},
    "predictor": {"model": "Stateless", "config": {
        "num_symbols": VOCAB, "output_dim": 32,
        "symbol_embedding_dim": 32, "context_size": 2}},
    "joiner": {"input_dim": 32, "output_dim": VOCAB, "prune_range": 3,
               "use_out_project": False},
    "loss": {"model": "Pruned_Rnnt", "config": {}},
}


@pytest.fixture(scope="module")
def task_and_params():
    task = TaskFactory("Pruned_Rnnt")(CFG)
    params = task.init(jax.random.PRNGKey(0))
    return task, params


def test_asr_modules_roundtrip(task_and_params, tmp_path):
    """encoder/predictor/joiner StableHLO modules match the live
    apply() outputs (to compile-variation tolerance) after deserialize."""
    from speech2text_tpu.tasks.rnnt import RnntModel
    task, params = task_and_params
    paths = export_asr_modules(task, params, str(tmp_path), max_frames=64)
    assert set(paths) == {"encoder", "predictor", "joiner"}

    feats = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 64, 80)), jnp.float32)
    lens = jnp.asarray([64], jnp.int32)
    live_out, live_lens = task.model.apply(
        {"params": params}, feats, lens, method=RnntModel.encode)
    exp_out, exp_lens = load_exported(paths["encoder"]).call(
        params, feats, lens)
    np.testing.assert_array_equal(np.asarray(live_lens),
                                  np.asarray(exp_lens))
    np.testing.assert_allclose(np.asarray(live_out, np.float32),
                               np.asarray(exp_out, np.float32),
                               rtol=2e-5, atol=2e-5)

    state = task.model.predictor.init_state(1)
    tok = jnp.asarray([3], jnp.int32)
    live_p, live_s = task.model.apply({"params": params}, tok, state,
                                      method=RnntModel.predictor_step)
    exp_p, exp_s = load_exported(paths["predictor"]).call(params, tok, state)
    np.testing.assert_allclose(np.asarray(live_p, np.float32),
                               np.asarray(exp_p, np.float32),
                               rtol=2e-5, atol=2e-5)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a, np.float32), np.asarray(b, np.float32),
        rtol=2e-5, atol=2e-5),
        live_s, exp_s)


def test_streaming_session_export_roundtrip(task_and_params, tmp_path):
    """The full per-chunk serving graph (prime + step) runs from the
    serialized artifacts alone and yields the live session's transcripts."""
    task, params = task_and_params
    sess = StreamingAsrSession(task, params, chunk_size=8,
                               left_context_chunks=4)
    paths = export_streaming_session(sess, str(tmp_path))
    assert set(paths) == {"prime", "step", "spec"}

    spec = json.load(open(paths["spec"]))
    assert spec["prime_samples"] == sess.prime_samples
    assert spec["step_samples"] == sess.step_samples
    assert spec["chunk_size"] == 8

    n = sess.prime_samples + 2 * sess.step_samples
    pcm = (np.random.default_rng(5).standard_normal((1, n)) * 0.1
           ).astype(np.float32)
    live_texts, _ = sess.run_utterance(pcm)

    prime = load_exported(paths["prime"])
    step = load_exported(paths["step"])
    state = sess.init_state(1)
    state = prime.call(params, jnp.asarray(pcm[:, :sess.prime_samples]),
                       state)
    off = sess.prime_samples
    while off + sess.step_samples <= n:
        state = step.call(params,
                          jnp.asarray(pcm[:, off:off + sess.step_samples]),
                          state)
        off += sess.step_samples
    assert sess.texts(state) == live_texts

    for key in ("prime", "step"):
        assert os.path.getsize(paths[key]) > 0

"""End-to-end streaming deployment session ≡ offline chunk-masked decode.

The session chains streaming fbank framing (carried sample tail), CMVN,
zipformer streaming_prime/streaming_step, and the greedy transducer
continuation across chunks; its transcripts must match the offline
simulated-streaming decode (`metric.encoder_streaming`) on the same PCM."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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


def test_streaming_session_matches_offline(task_and_params):
    task, params = task_and_params
    sess = StreamingAsrSession(task, params, chunk_size=8,
                               left_context_chunks=4)
    n = sess.prime_samples + 2 * sess.step_samples
    rng = np.random.default_rng(7)
    pcm = (rng.standard_normal((2, n)) * 0.1).astype(np.float32)

    batch = {"pcm": jnp.asarray(pcm),
             "pcm_length": jnp.full((2,), n, jnp.int32),
             "label": jnp.ones((2, 4), jnp.int32),
             "label_length": jnp.full((2,), 4, jnp.int32)}
    offline = task.eval_hyps(task.eval_forward(params, batch), params)

    texts, _ = sess.run_utterance(pcm)
    assert texts == offline, (texts, offline)


def test_streaming_session_is_incremental(task_and_params):
    """Tokens decoded after k chunks are a prefix-consistent state: counts
    never decrease and the tail chunk only appends."""
    task, params = task_and_params
    sess = StreamingAsrSession(task, params, chunk_size=8,
                               left_context_chunks=4)
    n = sess.prime_samples + 3 * sess.step_samples
    rng = np.random.default_rng(11)
    pcm = (rng.standard_normal((1, n)) * 0.1).astype(np.float32)
    state = sess.init_state(1)
    state = sess.prime(jnp.asarray(pcm[:, :sess.prime_samples]), state)
    counts = [int(state["counts"][0])]
    toks = [np.asarray(state["tokens"][0]).copy()]
    off = sess.prime_samples
    for _ in range(3):
        state = sess.step(
            jnp.asarray(pcm[:, off:off + sess.step_samples]), state)
        off += sess.step_samples
        counts.append(int(state["counts"][0]))
        toks.append(np.asarray(state["tokens"][0]).copy())
    assert all(b >= a for a, b in zip(counts, counts[1:]))
    for a, b, ca in zip(toks, toks[1:], counts):
        np.testing.assert_array_equal(a[:ca], b[:ca])

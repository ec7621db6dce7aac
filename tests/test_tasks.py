"""Task-level integration tests: every task family's loss_fn and
eval_forward run on synthetic batches with finite outputs and nonzero
gradients (mirrors the reference's per-task *_task tests at small scale)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech2text_tpu.tasks import TaskFactory

TINY_ENCODER = {
    "model": "Conformer",
    "config": {"feats_dim": 80, "subsampling_rate": 4, "input_dim": 32,
               "num_heads": 2, "ffn_dim": 64, "num_layers": 1,
               "output_dim": 32, "dropout": 0.0},
}
TINY_ZIP = {
    "model": "Zipformer",
    "config": {"feature_dim": 80, "downsampling_factor": [1, 2],
               "num_encoder_layers": [1, 1], "feedforward_dim": [64, 64],
               "encoder_dim": [32, 32], "encoder_unmasked_dim": [24, 24],
               "num_heads": [2, 2], "query_head_dim": 8,
               "value_head_dim": 8, "pos_head_dim": 4, "pos_dim": 16,
               "cnn_module_kernel": [7, 7], "causal": True,
               "chunk_size": [8, -1], "left_context_frames": [16, -1],
               "dropout": 0.0},
}
BASE = {
    "tokenizer": {"type": "char", "config": {}},
    "dataset": {"feat_type": "lhotes_fbank",
                "feat_config": {"num_mel_bins": 80},
                "data_aug_config": {"use_spec_aug": True}},
    "metric": {},
}
VOCAB = 31  # char tokenizer size


def audio_batch(rng, B=2, N=16000, U=6):
    return {
        "pcm": jnp.asarray(rng.standard_normal((B, N)) * 0.1, jnp.float32),
        "pcm_length": jnp.full((B,), N, jnp.int32),
        "label": jnp.asarray(rng.integers(2, VOCAB - 1, (B, U)), jnp.int32),
        "label_length": jnp.asarray([U, U - 2], jnp.int32),
    }


def check_task(task, batch):
    params = task.init(jax.random.PRNGKey(0))

    def f(p):
        loss, metrics = task.loss_fn(p, batch, jax.random.PRNGKey(1),
                                     jnp.asarray(0))
        return loss, metrics

    (loss, metrics), grads = jax.value_and_grad(f, has_aux=True)(params)
    assert np.isfinite(float(loss)), f"loss={loss}"
    gsum = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads))
    assert np.isfinite(gsum) and gsum > 0
    out = task.eval_forward(params, batch)
    assert np.isfinite(float(out["val_loss"]))
    hyps = task.eval_hyps(out, params)
    assert isinstance(hyps, list)
    return loss, metrics, hyps


class TestCtcTask:

    def test_end_to_end(self, rng):
        cfg = {**BASE, "encoder": TINY_ENCODER,
               "decoder": {"model": "Projector",
                           "config": {"input_dim": 32,
                                      "num_classes": VOCAB,
                                      "dropout_p": 0.0}},
               "loss": {"model": "CTC", "config": {}}}
        task = TaskFactory("CTC")(cfg)
        loss, metrics, hyps = check_task(task, audio_batch(rng))
        assert len(hyps) == 2


class TestWav2Vec2Ctc:

    def test_raw_pcm_path(self, rng):
        cfg = {**BASE,
               "dataset": {"feat_type": "pcm", "feat_config": {"dummy": -1},
                           "data_aug_config": {"use_spec_aug": True}},
               "encoder": {"model": "Wav2Vec2",
                           "config": {"hidden_dim": 32, "num_layers": 1,
                                      "num_heads": 2, "ffn_dim": 64,
                                      "output_dim": 24, "dropout": 0.0,
                                      "conv_pos_kernel": 16,
                                      "conv_pos_groups": 4}},
               "decoder": {"model": "Projector",
                           "config": {"input_dim": 24,
                                      "num_classes": VOCAB,
                                      "dropout_p": 0.0}},
               "loss": {"model": "CTC", "config": {}}}
        task = TaskFactory("CTC")(cfg)
        loss, metrics, hyps = check_task(task, audio_batch(rng))
        assert len(hyps) == 2


class TestRnntTasks:

    def _cfg(self, prune_range, rng_unused=None):
        return {
            **BASE, "encoder": TINY_ENCODER,
            "decoder": {"model": "Projector" if prune_range <= 0 else
                        "Identity",
                        "config": ({"input_dim": 32, "num_classes": VOCAB,
                                    "dropout_p": 0.0}
                                   if prune_range <= 0 else {"dummy": -1})},
            "predictor": {"model": "Stateless",
                          "config": {"num_symbols": VOCAB, "output_dim": 32,
                                     "symbol_embedding_dim": 32,
                                     "context_size": 2}},
            "joiner": {"input_dim": 32, "output_dim": VOCAB,
                       "prune_range": prune_range,
                       "use_out_project": False},
            "metric": {"decode_method": "rnnt_greedy_search",
                       "max_token_step": 1},
        }

    def test_vanilla(self, rng):
        cfg = self._cfg(-1)
        cfg["loss"] = {"model": "Rnnt", "config": {}}
        task = TaskFactory("Rnnt")(cfg)
        loss, metrics, hyps = check_task(task, audio_batch(rng))
        assert len(hyps) == 2

    def test_hybrid(self, rng):
        cfg = self._cfg(-1)
        cfg["loss"] = {"model": "Rnnt", "rnnt_weight": 0.7,
                       "ctc_weight": 0.3}
        task = TaskFactory("CTC_Hybrid_Rnnt")(cfg)
        _, metrics, _ = check_task(task, audio_batch(rng))
        assert "ctc_loss" in metrics and "rnnt_loss" in metrics

    def test_pruned_with_zipformer(self, rng):
        cfg = self._cfg(3)
        cfg["encoder"] = TINY_ZIP
        cfg["loss"] = {"model": "Pruned_Rnnt", "simple_loss_scale": 0.5,
                       "pruned_loss_scale": 0.5, "config": {}}
        task = TaskFactory("Pruned_Rnnt")(cfg)
        _, metrics, _ = check_task(task, audio_batch(rng))
        assert "simple_loss" in metrics and "pruned_loss" in metrics

    def test_vanilla_val_loss_is_real(self, rng):
        """Transducer eval_forward must report the actual validation loss
        (reference rnnt_task.py:283), not a zero placeholder, so
        checkpoint top-k can monitor it."""
        cfg = self._cfg(-1)
        cfg["loss"] = {"model": "Rnnt", "config": {}}
        task = TaskFactory("Rnnt")(cfg)
        batch = audio_batch(rng)
        params = task.init(jax.random.PRNGKey(0))
        out = task.eval_forward(params, batch)
        assert float(out["val_loss"]) > 0.1  # untrained → NLL well above 0

    def test_hybrid_val_branch_losses(self, rng):
        cfg = self._cfg(-1)
        cfg["loss"] = {"model": "Rnnt", "rnnt_weight": 0.7,
                       "ctc_weight": 0.3}
        task = TaskFactory("CTC_Hybrid_Rnnt")(cfg)
        batch = audio_batch(rng)
        params = task.init(jax.random.PRNGKey(0))
        out = task.eval_forward(params, batch)
        np.testing.assert_allclose(
            float(out["val_loss"]),
            0.7 * float(out["val_rnnt_loss"])
            + 0.3 * float(out["val_ctc_loss"]), rtol=1e-5)
        assert float(out["val_rnnt_loss"]) > 0.0

    def test_pruned_val_branch_losses(self, rng):
        cfg = self._cfg(3)
        cfg["loss"] = {"model": "Pruned_Rnnt", "simple_loss_scale": 0.4,
                       "pruned_loss_scale": 0.6, "config": {}}
        task = TaskFactory("Pruned_Rnnt")(cfg)
        batch = audio_batch(rng)
        params = task.init(jax.random.PRNGKey(0))
        out = task.eval_forward(params, batch)
        np.testing.assert_allclose(
            float(out["val_loss"]),
            0.4 * float(out["val_simple_loss"])
            + 0.6 * float(out["val_pruned_loss"]), rtol=1e-5)
        assert float(out["val_pruned_loss"]) > 0.0

    def test_streaming_eval_forward_skips_val_loss(self, rng):
        """encoder_streaming eval (the inference/test surface,
        reference rnnt_task.py:814-819) decodes only — no loss keys."""
        cfg = self._cfg(-1)
        cfg["loss"] = {"model": "Rnnt", "config": {}}
        cfg["encoder"] = TINY_ZIP
        cfg["metric"] = {**cfg["metric"], "encoder_streaming": True}
        task = TaskFactory("Rnnt")(cfg)
        batch = audio_batch(rng)
        params = task.init(jax.random.PRNGKey(0))
        out = task.eval_forward(params, batch)
        assert "val_loss" not in out
        assert task.eval_hyps(out, params) is not None


class TestSslTask:

    def test_best_rq(self, rng):
        cfg = {**BASE, "encoder": TINY_ENCODER,
               "ssl": {"best_rq": {"stack_size": 4, "num_codebooks": 2,
                                   "codebook_size": 64, "codebook_dim": 8,
                                   "masking": {"mask_proportion": 0.5,
                                               "mean_span_length": 2}}},
               "loss": {"model": "MaskedCELoss", "config": {},
                        "loss_selection": "mask_loss"}}
        task = TaskFactory("SSL")(cfg)
        batch = audio_batch(rng)
        params = task.init(jax.random.PRNGKey(0))
        loss, metrics = task.loss_fn(params, batch, jax.random.PRNGKey(1),
                                     jnp.asarray(0))
        assert np.isfinite(float(loss))
        assert 0.0 < float(metrics["mask_rate"]) < 1.0
        out = task.eval_forward(params, batch)
        assert np.isfinite(float(out["val_loss"]))
        assert 0.0 <= float(out["acc"]) <= 1.0


class TestCifTask:

    def test_cif(self, rng):
        cfg = {**BASE, "encoder": TINY_ENCODER,
               "cif": {"config": {"input_dim": 32, "max_tokens": 16}},
               "decoder": {"model": "Projector",
                           "config": {"input_dim": 32,
                                      "num_classes": VOCAB,
                                      "dropout_p": 0.0}},
               "loss": {"model": "MaskedCELoss", "mae_weight": 1.0}}
        task = TaskFactory("CIF")(cfg)
        loss, metrics, hyps = check_task(task, audio_batch(rng))
        assert "mae_loss" in metrics
        assert len(hyps) == 2

    def test_label_pad_exceeds_emission_cap(self, rng):
        """Static bucket label pad (U=24) wider than cif.max_tokens (16):
        the task must score the overlap with a clamped mask, not crash
        (regression: the heldout CIF recipe hit a broadcast error)."""
        cfg = {**BASE, "encoder": TINY_ENCODER,
               "cif": {"config": {"input_dim": 32, "max_tokens": 16}},
               "decoder": {"model": "Projector",
                           "config": {"input_dim": 32,
                                      "num_classes": VOCAB,
                                      "dropout_p": 0.0}},
               "loss": {"model": "MaskedCELoss", "mae_weight": 1.0}}
        task = TaskFactory("CIF")(cfg)
        batch = audio_batch(rng, U=24)
        batch["label_length"] = jnp.asarray([24, 10], jnp.int32)
        loss, metrics, hyps = check_task(task, batch)
        assert np.isfinite(float(loss))
        assert len(hyps) == 2


class TestNnLmTask:

    def test_nnlm(self, rng):
        cfg = {**BASE,
               "lm": {"config": {"embedding_dim": 16, "hidden_dim": 32,
                                 "num_layers": 1}},
               "loss": {"model": "MaskedKLDiv",
                        "config": {"label_smoothing": 0.1}},
               "metric": {"top_k": 2}}
        task = TaskFactory("NNLM")(cfg)
        batch = {"text": jnp.asarray(rng.integers(2, VOCAB - 1, (2, 10)),
                                     jnp.int32),
                 "text_length": jnp.asarray([10, 7], jnp.int32)}
        params = task.init(jax.random.PRNGKey(0))
        loss, metrics = task.loss_fn(params, batch, jax.random.PRNGKey(1),
                                     jnp.asarray(0))
        assert np.isfinite(float(loss))
        out = task.eval_forward(params, batch)
        assert 0.0 <= float(out["acc"]) <= 1.0

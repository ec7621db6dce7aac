"""Int8 weights-only quantized export: round-trip fidelity and WER-delta
(deployment parity with reference rnnt_task.py:753-809 dynamic int8 ONNX
export — here an int8 artifact + dequant-on-load for StableHLO graphs)."""

import jax
import jax.numpy as jnp
import numpy as np

from speech2text_tpu.export import (load_quantized, quantize_params,
                                    save_quantized)
from speech2text_tpu.tasks import TaskFactory

BASE = {
    "tokenizer": {"type": "char", "config": {}},
    "dataset": {"feat_type": "lhotes_fbank",
                "feat_config": {"num_mel_bins": 80},
                "data_aug_config": {}},
    "metric": {"decode_method": "rnnt_greedy_search", "max_token_step": 1},
    "encoder": {"model": "Conformer",
                "config": {"feats_dim": 80, "subsampling_rate": 4,
                           "input_dim": 32, "num_heads": 2, "ffn_dim": 64,
                           "num_layers": 1, "output_dim": 32,
                           "dropout": 0.0}},
    "decoder": {"model": "Identity", "config": {"dummy": -1}},
    "predictor": {"model": "Stateless",
                  "config": {"num_symbols": 31, "output_dim": 32,
                             "symbol_embedding_dim": 32, "context_size": 2}},
    "joiner": {"input_dim": 32, "output_dim": 31, "prune_range": 2,
               "use_out_project": False},
    "loss": {"model": "Pruned_Rnnt", "config": {}},
}


def _batch(rng, B=2, N=16000, U=6):
    return {
        "pcm": jnp.asarray(rng.standard_normal((B, N)) * 0.1, jnp.float32),
        "pcm_length": jnp.full((B,), N, jnp.int32),
        "label": jnp.asarray(rng.integers(2, 30, (B, U)), jnp.int32),
        "label_length": jnp.full((B,), U, jnp.int32),
    }


def test_quantize_roundtrip_error_bounded():
    rng = np.random.default_rng(0)
    params = {"layer": {"kernel": rng.standard_normal((64, 48)).astype(
        np.float32) * 0.1, "bias": rng.standard_normal(48).astype(
        np.float32)}}
    flat = quantize_params(params, min_size=128)
    assert flat["layer/kernel"].dtype == np.int8
    assert "layer/bias.fp32" in flat  # small leaves stay fp32
    deq = flat["layer/kernel"].astype(np.float32) * flat[
        "layer/kernel.scale"]
    err = np.abs(deq - params["layer"]["kernel"]).max(axis=0)
    bound = flat["layer/kernel.scale"] * 0.5 + 1e-8  # ≤ half-step/channel
    assert (err <= bound).all()


def test_save_load_tree_shape(tmp_path):
    rng = np.random.default_rng(1)
    params = {"enc": {"w": rng.standard_normal((40, 40)).astype(np.float32),
                      "b": np.ones(40, np.float32)},
              "head": {"w": rng.standard_normal((40, 8)).astype(
                  np.float32)}}
    p = str(tmp_path / "w.int8.npz")
    save_quantized(params, p, min_size=64)
    back = load_quantized(p)
    assert set(back) == {"enc", "head"}
    assert back["enc"]["w"].shape == (40, 40)
    np.testing.assert_array_equal(back["enc"]["b"], params["enc"]["b"])
    assert np.abs(back["enc"]["w"] - params["enc"]["w"]).max() < 0.05


def test_wer_delta_after_quantization(tmp_path):
    """Greedy decode with dequantized int8 weights matches fp32 hyps on a
    tiny transducer (the fixture-level WER-delta criterion)."""
    task = TaskFactory("Pruned_Rnnt")(BASE)
    rng = np.random.default_rng(2)
    params = task.init(jax.random.PRNGKey(0))
    batch = _batch(rng)

    p = str(tmp_path / "weights.int8.npz")
    save_quantized(jax.device_get(params), p, min_size=256)
    qparams = load_quantized(p)

    out_fp = task.eval_forward(params, batch)
    out_q = task.eval_forward(qparams, batch)
    # losses close in relative terms
    lf, lq = float(out_fp["val_loss"]), float(out_q["val_loss"])
    assert abs(lf - lq) / max(abs(lf), 1e-6) < 0.05
    # greedy hypotheses identical on this batch (quantization noise is
    # far below decision boundaries at random init)
    assert task.eval_hyps(out_fp, params) == task.eval_hyps(out_q, qparams)

"""Wav2Vec2 pretrained-weight converter tests.

The converter (tools/convert_wav2vec2.py) is torch-free; these tests use
the environment's CPU torch + transformers as an independent numeric
oracle: build a tiny random HF Wav2Vec2Model, save real safetensors,
convert → flax params, and assert the flax forward reproduces the HF
last_hidden_state (reference capability: model/encoder/wav2vec2.py:25-43
constructs the encoder from HF pretrained weights)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speech2text_tpu.models.wav2vec2 import Wav2Vec2Config, Wav2Vec2Encoder
from speech2text_tpu.tools.convert_wav2vec2 import (
    convert, hf_to_flax, read_safetensors, write_safetensors)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

HIDDEN, LAYERS, HEADS, FFN = 32, 2, 2, 64
POS_K, POS_G = 16, 4
N_SAMPLES = 4000  # → 11 feature frames through the standard conv schedule


def _tiny_hf(stable: bool):
    cfg = transformers.Wav2Vec2Config(
        hidden_size=HIDDEN, num_hidden_layers=LAYERS,
        num_attention_heads=HEADS, intermediate_size=FFN,
        num_conv_pos_embeddings=POS_K, num_conv_pos_embedding_groups=POS_G,
        do_stable_layer_norm=stable,
        feat_extract_norm="layer" if stable else "group",
        conv_bias=stable,
        hidden_dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        feat_proj_dropout=0.0, layerdrop=0.0, apply_spec_augment=False,
        hidden_act="gelu")
    torch.manual_seed(0)
    model = transformers.Wav2Vec2Model(cfg).eval()
    return model


def _roundtrip(model, tmp_path):
    sd = {k: v.detach().numpy().astype(np.float32)
          for k, v in model.state_dict().items()}
    st = tmp_path / "model.safetensors"
    write_safetensors(sd, str(st))
    back = read_safetensors(str(st))
    assert set(back) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(back[k], sd[k])
    return str(st)


@pytest.mark.parametrize("stable", [False, True])
def test_forward_matches_hf(tmp_path, stable):
    model = _tiny_hf(stable)
    st_path = _roundtrip(model, tmp_path)
    out_path = str(tmp_path / "w2v2.msgpack")
    params = convert(st_path, out_path)
    layout = params.pop("__layout__")
    assert int(layout["num_layers"]) == LAYERS
    assert bool(layout["do_stable_layer_norm"]) == stable

    rng = np.random.default_rng(3)
    pcm = rng.standard_normal((2, N_SAMPLES)).astype(np.float32)
    # HF normalization lives in the processor; our model normalizes
    # per-utterance internally, so pre-normalize for the oracle.
    norm = (pcm - pcm.mean(1, keepdims=True)) / np.sqrt(
        pcm.var(1, keepdims=True) + 1e-7)
    with torch.no_grad():
        ref = model(torch.from_numpy(norm)).last_hidden_state.numpy()

    cfg = Wav2Vec2Config(hidden_dim=HIDDEN, num_layers=LAYERS,
                         num_heads=HEADS, ffn_dim=FFN, output_dim=HIDDEN,
                         dropout=0.0, conv_pos_kernel=POS_K,
                         conv_pos_groups=POS_G,
                         feat_extract_norm="layer" if stable else "group",
                         do_stable_layer_norm=stable)
    enc = Wav2Vec2Encoder(cfg)
    lens = jnp.full((2,), N_SAMPLES, jnp.int32)
    init = enc.init(jax.random.PRNGKey(0), jnp.asarray(pcm), lens)["params"]

    # graft converted weights over the init; identity head exposes the
    # pre-head hidden state for comparison with HF last_hidden_state
    merged = dict(init)
    for k, v in params.items():
        assert k in merged, f"converted key {k} missing from model params"
        assert jax.tree.structure(merged[k]) == jax.tree.structure(v)
        for a, b in zip(jax.tree.leaves(merged[k]), jax.tree.leaves(v)):
            assert a.shape == b.shape
        merged[k] = jax.tree.map(jnp.asarray, v)
    merged["head"] = {"kernel": jnp.eye(HIDDEN),
                      "bias": jnp.zeros((HIDDEN,))}

    got, out_lens = enc.apply({"params": merged}, jnp.asarray(pcm), lens)
    assert got.shape == ref.shape
    assert int(out_lens[0]) == ref.shape[1]
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-4, rtol=1e-3)


def test_task_init_merges_pretrained(tmp_path):
    model = _tiny_hf(False)
    st_path = _roundtrip(model, tmp_path)
    msg_path = str(tmp_path / "w2v2.msgpack")
    converted = convert(st_path, msg_path)
    converted.pop("__layout__")

    from speech2text_tpu.tasks import TaskFactory
    cfg = {
        "tokenizer": {"type": "char", "config": {}},
        "dataset": {"feat_type": "pcm", "feat_config": {"dummy": -1},
                    "data_aug_config": {}},
        "metric": {},
        "encoder": {"model": "Wav2Vec2",
                    "config": {"hidden_dim": HIDDEN, "num_layers": LAYERS,
                               "num_heads": HEADS, "ffn_dim": FFN,
                               "output_dim": 24, "dropout": 0.0,
                               "conv_pos_kernel": POS_K,
                               "conv_pos_groups": POS_G,
                               "pretrained_path": msg_path}},
        "decoder": {"model": "Projector",
                    "config": {"input_dim": 24, "num_classes": 31,
                               "dropout_p": 0.0}},
        "loss": {"model": "CTC", "config": {}},
    }
    task = TaskFactory("CTC")(cfg)
    params = task.init(jax.random.PRNGKey(0))
    got = params["encoder"]["feature_projection"]["kernel"]
    np.testing.assert_allclose(
        np.asarray(got), converted["feature_projection"]["kernel"],
        atol=1e-6)

    # finetune smoke: one grad step stays finite and trains
    rng = np.random.default_rng(5)
    batch = {
        "pcm": jnp.asarray(rng.standard_normal((2, N_SAMPLES)) * 0.1,
                           jnp.float32),
        "pcm_length": jnp.full((2,), N_SAMPLES, jnp.int32),
        "label": jnp.asarray(rng.integers(2, 30, (2, 4)), jnp.int32),
        "label_length": jnp.full((2,), 4, jnp.int32),
    }
    loss, _ = task.loss_fn(params, batch, jax.random.PRNGKey(1),
                           jnp.asarray(0))
    assert np.isfinite(float(loss))


def test_shape_mismatch_rejected(tmp_path):
    model = _tiny_hf(False)
    st_path = _roundtrip(model, tmp_path)
    msg_path = str(tmp_path / "w2v2.msgpack")
    convert(st_path, msg_path)

    cfg = Wav2Vec2Config(hidden_dim=HIDDEN * 2, num_layers=LAYERS,
                         num_heads=HEADS, ffn_dim=FFN, output_dim=24,
                         dropout=0.0, conv_pos_kernel=POS_K,
                         conv_pos_groups=POS_G, pretrained_path=msg_path)
    from speech2text_tpu.tasks.base import AsrTaskBase
    task = AsrTaskBase.__new__(AsrTaskBase)
    task.config = {"encoder": {"config": {"pretrained_path": msg_path}}}
    enc = Wav2Vec2Encoder(cfg)
    lens = jnp.full((1,), N_SAMPLES, jnp.int32)
    init = enc.init(jax.random.PRNGKey(0),
                    jnp.zeros((1, N_SAMPLES)), lens)["params"]
    with pytest.raises((ValueError, KeyError)):
        task.merge_pretrained_encoder({"encoder": init})

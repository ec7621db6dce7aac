"""Zipformer forward parity against the reference torch model (oracle).

The strongest WER-parity evidence available in this environment: the
reference's own Zipformer2 (torch, eval mode, randomized weights) and this
repo's flax Zipformer2 — with the SAME weights, converted by
tools/convert_zipformer_ref.py — must produce the same encoder outputs.
Together with the loss oracles (torch CTC / RNN-T lattice), the ScaledAdam
oracle, and the spm parity tests, numerical forward equivalence closes the
chain: same features → same encoder → same loss → same updates.

Parity requires two documented config switches (both OFF by default —
this repo's own basis/semantics differ deliberately):
  - pos_variant="icefall": the reference's atan-compressed interleaved
    cos/sin positional basis (zipformer.py:1765-1813);
  - full_dim_bypass=True: the reference's full-width stack out_combiner
    (zipformer.py:438-441, 1600-1650).
The converter additionally folds this repo's 1/sqrt(head_dim) score
scaling into q/qpos (the reference applies none, zipformer.py:1977).

The subsampling frontend is architecturally different by design and is
compared elsewhere (golden fbank tests + streaming equivalence); parity
here starts from a shared post-embed tensor, exactly what the reference
feeds its encoder stacks.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from convert_zipformer_ref import convert_ref_zipformer
from ref_zipformer_util import load_ref_zipformer, randomize_

torch = pytest.importorskip("torch")

SMALL = {
    "feature_dim": 80,
    "downsampling_factor": [1, 2],
    "num_encoder_layers": [2, 2],
    "feedforward_dim": [96, 128],
    "encoder_dim": [64, 96],
    "encoder_unmasked_dim": [64, 96],
    "num_heads": [2, 2],
    "query_head_dim": 16,
    "value_head_dim": 12,
    "pos_head_dim": 4,
    "pos_dim": 16,
    "cnn_module_kernel": [15, 15],
    "causal": False,
}

FLAGSHIP = {
    "feature_dim": 80,
    "downsampling_factor": [1, 2, 4, 8, 4, 2],
    "num_encoder_layers": [2, 2, 2, 2, 2, 2],
    "feedforward_dim": [512, 768, 768, 768, 768, 768],
    "encoder_dim": [192, 256, 256, 256, 256, 256],
    "encoder_unmasked_dim": [192] * 6,
    "num_heads": [4, 4, 4, 8, 4, 4],
    "query_head_dim": 32,
    "value_head_dim": 12,
    "pos_head_dim": 4,
    "pos_dim": 48,
    "cnn_module_kernel": [31, 31, 15, 15, 15, 31],
    "causal": False,
}


def _ref_model(cfg):
    rz = load_ref_zipformer()
    ref_cfg = dict(cfg, chunk_size=[-1], left_context_frames=[-1],
                   for_ctc=False, num_tokens=100)
    m = rz.Zipformer2(config=rz.Zipformer2Config(**ref_cfg))
    randomize_(m)
    m.eval()
    return rz, m


def _flax_model(cfg):
    from speech2text_tpu.models.zipformer import (Zipformer2,
                                                  Zipformer2Config)
    return Zipformer2(Zipformer2Config.from_config(
        dict(cfg, pos_variant="icefall", full_dim_bypass=True)))


def _ref_encode_embedded(rz, m, x_btd):
    """The reference Zipformer2.forward body after _encoder_embed
    (zipformer.py:338-389), full lengths, eval mode."""
    with torch.no_grad():
        x = x_btd.transpose(0, 1)  # (T, B, D)
        outputs = []
        for i, module in enumerate(m.encoders):
            x = rz.convert_num_channels(x, m.encoder_dim[i])
            x = module(x, chunk_size=-1, feature_mask=1.0,
                       src_key_padding_mask=None, attn_mask=None)
            outputs.append(x)
        x = m._get_full_dim_output(outputs)
        x = m.downsample_output(x)
        return x.transpose(0, 1)  # (B, T2, D)


def _converted_params(model, m, cfg, x):
    B, T, _ = x.shape
    lens = jnp.full((B,), T, jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(0)}, x, lens,
                        method=model.encode_embedded)["params"]
    conv = convert_ref_zipformer(m.state_dict(), cfg)
    for k in conv:
        assert k in params, f"converted key {k} not in flax tree"
        params[k] = jax.tree_util.tree_map(
            jnp.asarray, conv[k])
    return params, lens


def _tree_shapes(t):
    return jax.tree_util.tree_map(lambda a: tuple(np.shape(a)), t)


@pytest.mark.quick
def test_pos_embedding_matches_reference():
    rz, m = _ref_model(SMALL)
    from speech2text_tpu.models.zipformer import \
        CompactRelPositionalEncoding
    T = 37
    x = torch.zeros(T, 2, 8)
    ref_pe = m.encoders[0].encoder_pos(x).squeeze(0).numpy()  # (2T-1, pd)
    flax_pe = np.asarray(
        CompactRelPositionalEncoding(SMALL["pos_dim"], "icefall").table(
            T - 1))
    # this repo indexes by query−key, the reference by key−query
    np.testing.assert_allclose(flax_pe, ref_pe[::-1], rtol=1e-5,
                               atol=1e-6)


@pytest.mark.quick
def test_attention_weights_match_reference():
    rz, m = _ref_model(SMALL)
    cfg = SMALL
    B, T, D = 3, 29, cfg["encoder_dim"][0]
    rng = np.random.default_rng(0)
    x = rng.standard_normal((B, T, D)).astype(np.float32)

    ref_attn = m.encoders[0].layers[0].self_attn_weights
    xt = torch.from_numpy(x).transpose(0, 1)  # (T, B, D)
    with torch.no_grad():
        pos = m.encoders[0].encoder_pos(xt)
        ref_w = ref_attn(xt, pos).numpy()  # (H, B, T, T)

    from speech2text_tpu.models.zipformer import (
        AttentionWeights, CompactRelPositionalEncoding)
    attn = AttentionWeights(D, cfg["num_heads"][0], cfg["query_head_dim"],
                            cfg["pos_head_dim"], cfg["pos_dim"])
    conv = convert_ref_zipformer(m.state_dict(), cfg)
    params = jax.tree_util.tree_map(
        jnp.asarray, conv["stack0"]["layer0"]["attn_weights"])
    pe = CompactRelPositionalEncoding(cfg["pos_dim"], "icefall").table(
        T - 1)
    flax_w = attn.apply({"params": params}, jnp.asarray(x), pe)
    np.testing.assert_allclose(np.asarray(flax_w),
                               ref_w.transpose(1, 0, 2, 3),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.quick
def test_encoder_stacks_match_reference_small():
    _run_stack_parity(SMALL, B=3, T=30, atol=5e-4)


def test_encoder_stacks_match_reference_flagship_dims():
    _run_stack_parity(FLAGSHIP, B=2, T=48, atol=1e-3)


@pytest.mark.quick
def test_stateless_predictor_matches_reference():
    """Embedding → depthwise conv → linear, NO intermediate activation
    (reference stateless_predictor.py:75-99) — converted weights must
    reproduce the reference exactly."""
    from convert_zipformer_ref import convert_ref_stateless_predictor
    from ref_zipformer_util import load_ref_zipformer  # installs stubs
    load_ref_zipformer()
    from model.predictor.stateless_predictor import (
        StatelessPredictor as RefPredictor,
        StatelessPredictorConfig as RefPredictorConfig)

    ref = RefPredictor(RefPredictorConfig(
        num_symbols=40, output_dim=48, symbol_embedding_dim=32,
        context_size=3))
    randomize_(ref)
    ref.eval()

    B, U = 3, 7
    rng = np.random.default_rng(2)
    targets = rng.integers(1, 39, (B, U)).astype(np.int32)
    with torch.no_grad():
        ref_out, _, _ = ref(torch.from_numpy(targets),
                            torch.full((B,), U), ref.init_state(1))

    from speech2text_tpu.models.factories import PredictorFactory
    pred = PredictorFactory({"model": "Stateless", "config": {
        "num_symbols": 40, "output_dim": 48, "symbol_embedding_dim": 32,
        "context_size": 3}})
    params = jax.tree_util.tree_map(
        jnp.asarray, convert_ref_stateless_predictor(ref.state_dict()))
    out = pred.apply({"params": params}, jnp.asarray(targets))
    np.testing.assert_allclose(np.asarray(out), ref_out.numpy(),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.quick
def test_joiner_matches_reference():
    """Unpruned join: enc/pre projections + activation + 2-layer out
    projection (reference joiner.py:127-183)."""
    from convert_zipformer_ref import convert_ref_joiner
    from ref_zipformer_util import load_ref_zipformer
    load_ref_zipformer()
    from model.joiner.joiner import (Joiner as RefJoiner,
                                     JoinerConfig as RefJoinerConfig)

    ref = RefJoiner(RefJoinerConfig(input_dim=16, output_dim=40,
                                    inner_dim=24, activation="relu",
                                    prune_range=-1))
    randomize_(ref)
    ref.eval()

    B, T, U, D = 2, 7, 3, 16
    rng = np.random.default_rng(3)
    enc = rng.standard_normal((B, T, D)).astype(np.float32)
    pre = rng.standard_normal((B, U + 1, D)).astype(np.float32)
    with torch.no_grad():
        ref_logits, _, _, _ = ref(torch.from_numpy(enc),
                                  torch.full((B,), T),
                                  torch.from_numpy(pre),
                                  torch.full((B,), U))

    from speech2text_tpu.models.factories import JoinerFactory
    joiner = JoinerFactory({"input_dim": 16, "output_dim": 40,
                            "inner_dim": 24, "activation": "relu",
                            "prune_range": -1})
    params = jax.tree_util.tree_map(
        jnp.asarray, convert_ref_joiner(ref.state_dict()))
    logits, ranges, simple = joiner.apply(
        {"params": params}, jnp.asarray(enc), jnp.full((B,), T, jnp.int32),
        jnp.asarray(pre), jnp.full((B,), U, jnp.int32))
    assert ranges is None and simple is None
    np.testing.assert_allclose(np.asarray(logits), ref_logits.numpy(),
                               rtol=1e-5, atol=1e-6)


def _run_stack_parity(cfg, B, T, atol):
    rz, m = _ref_model(cfg)
    model = _flax_model(cfg)
    D0 = cfg["encoder_dim"][0]
    rng = np.random.default_rng(1)
    x_np = rng.standard_normal((B, T, D0)).astype(np.float32)

    ref_out = _ref_encode_embedded(rz, m, torch.from_numpy(x_np)).numpy()

    x = jnp.asarray(x_np)
    params, lens = _converted_params(model, m, cfg, x)
    flax_out, out_lens = model.apply({"params": params}, x, lens,
                                     method=model.encode_embedded)
    flax_out = np.asarray(flax_out)

    assert flax_out.shape == ref_out.shape, (flax_out.shape, ref_out.shape)
    assert int(out_lens[0]) == ref_out.shape[1]
    np.testing.assert_allclose(flax_out, ref_out, rtol=1e-4, atol=atol)

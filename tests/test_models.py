"""Model-layer tests: shapes, lengths, streaming consistency, factories.

Mirrors reference colocated tests (model/encoder/conformer_test.py,
model/predictor/stateless_predictor_test.py, model/joiner/joiner_test.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech2text_tpu.models.conformer import (Conformer, ConformerConfig,
                                              ConvSubsampling)
from speech2text_tpu.models.factories import (DecoderFactory, EncoderFactory,
                                              JoinerFactory,
                                              PredictorFactory)
from speech2text_tpu.models.joiner import Joiner, JoinerConfig
from speech2text_tpu.models.predictor import (StatelessPredictor,
                                              StatelessPredictorConfig)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)


class TestSubsampling:

    @pytest.mark.parametrize("rate", [4, 6, 8])
    def test_rates_and_lengths(self, key, rate):
        m = ConvSubsampling(rate=rate, out_dim=32)
        x = jnp.ones((2, 97, 80))
        lens = jnp.array([97, 50])
        params = m.init(key, x, lens)
        out, out_lens = m.apply(params, x, lens)
        assert out.shape[0] == 2 and out.shape[2] == 32
        assert int(out_lens[0]) == out.shape[1]
        # roughly T/rate
        assert abs(out.shape[1] - 97 // rate) <= 3


class TestConformer:

    def test_forward_shapes(self, key):
        cfg = ConformerConfig(feats_dim=80, subsampling_rate=4, input_dim=32,
                              num_heads=4, ffn_dim=64, num_layers=2,
                              output_dim=48)
        m = Conformer(cfg)
        x = jax.random.normal(key, (2, 101, 80))
        lens = jnp.array([101, 60])
        params = m.init(key, x, lens)
        out, out_lens = m.apply(params, x, lens)
        assert out.shape == (2, out.shape[1], 48)
        assert out.dtype == jnp.float32
        # padded region must be zeroed
        pad = np.asarray(out[1, int(out_lens[1]):])
        assert np.abs(pad).sum() == 0.0

    def test_padding_invariance(self, key):
        """Same utterance with different pad amounts → same valid output
        (masking correctness)."""
        cfg = ConformerConfig(input_dim=32, num_heads=2, ffn_dim=64,
                              num_layers=1, output_dim=32)
        m = Conformer(cfg)
        x = jax.random.normal(key, (1, 80, 80))
        params = m.init(key, x, jnp.array([80]))
        out1, l1 = m.apply(params, x, jnp.array([80]))
        xpad = jnp.pad(x, ((0, 0), (0, 40), (0, 0)))
        out2, l2 = m.apply(params, xpad, jnp.array([80]))
        T = int(l1[0])
        np.testing.assert_allclose(np.asarray(out1[0, :T]),
                                   np.asarray(out2[0, :T]), atol=2e-5)


class TestStatelessPredictor:

    def test_train_vs_streaming_consistency(self, key):
        cfg = StatelessPredictorConfig(num_symbols=16, output_dim=24,
                                       symbol_embedding_dim=32,
                                       context_size=3)
        m = StatelessPredictor(cfg)
        targets = jnp.array([[3, 5, 2, 7]], dtype=jnp.int32)
        params = m.init(key, targets)
        full = m.apply(params, targets)          # (1, 5, 24)
        assert full.shape == (1, 5, 24)

        # streaming: feed tokens one at a time; outputs must match rows 1..U
        state = m.init_state(1)
        outs = []
        for u in range(4):
            out, state = m.apply(params, targets[:, u], state,
                                 method=StatelessPredictor.streaming_step)
            outs.append(out[:, 0])
        stream = jnp.stack(outs, axis=1)
        np.testing.assert_allclose(np.asarray(full[:, 1:]),
                                   np.asarray(stream), atol=1e-5)

    def test_row0_is_blank_context(self, key):
        cfg = StatelessPredictorConfig(num_symbols=16, output_dim=8,
                                       symbol_embedding_dim=16,
                                       context_size=2)
        m = StatelessPredictor(cfg)
        t1 = jnp.array([[3, 5]], dtype=jnp.int32)
        t2 = jnp.array([[7, 1]], dtype=jnp.int32)
        params = m.init(key, t1)
        a = m.apply(params, t1)
        b = m.apply(params, t2)
        np.testing.assert_allclose(np.asarray(a[:, 0]), np.asarray(b[:, 0]),
                                   atol=1e-6)


class TestJoiner:

    def test_unpruned_shapes(self, key):
        cfg = JoinerConfig(input_dim=16, output_dim=12, prune_range=-1)
        m = Joiner(cfg)
        enc = jax.random.normal(key, (2, 7, 16))
        pred = jax.random.normal(key, (2, 5, 16))
        el = jnp.array([7, 4])
        tl = jnp.array([4, 2])
        params = m.init(key, enc, el, pred, tl)
        logits, ranges, simple = m.apply(params, enc, el, pred, tl)
        assert logits.shape == (2, 7, 5, 12)
        assert ranges is None and simple is None

    def test_pruned_shapes_and_loss(self, key):
        r = 3
        cfg = JoinerConfig(input_dim=16, output_dim=12, prune_range=r,
                           use_out_project=True, inner_dim=8)
        m = Joiner(cfg)
        enc = jax.random.normal(key, (2, 9, 16))
        pred = jax.random.normal(key, (2, 6, 16))
        el = jnp.array([9, 6])
        tl = jnp.array([5, 3])
        tgt = jnp.ones((2, 5), jnp.int32)
        params = m.init(key, enc, el, pred, tl, tgt)
        logits, ranges, simple = m.apply(params, enc, el, pred, tl, tgt)
        assert logits.shape == (2, 9, r, 12)
        assert ranges.shape == (2, 9)
        assert np.isfinite(float(simple))

    def test_streaming_step(self, key):
        cfg = JoinerConfig(input_dim=16, output_dim=12, prune_range=-1)
        m = Joiner(cfg)
        enc = jax.random.normal(key, (2, 7, 16))
        pred = jax.random.normal(key, (2, 5, 16))
        params = m.init(key, enc, jnp.array([7, 7]), pred, jnp.array([4, 4]))
        logp = m.apply(params, enc[:, 0], pred[:, 0],
                       method=Joiner.streaming_step)
        assert logp.shape == (2, 12)
        np.testing.assert_allclose(np.asarray(jnp.exp(logp).sum(-1)),
                                   np.ones(2), rtol=1e-4)


class TestFactories:

    def test_dispatch(self):
        enc = EncoderFactory({"model": "Conformer",
                              "config": {"input_dim": 32, "num_layers": 1,
                                         "ffn_dim": 32, "output_dim": 32}})
        assert isinstance(enc, Conformer)
        dec = DecoderFactory({"model": "Identity", "config": {"dummy": -1}})
        pred = PredictorFactory({"model": "Stateless",
                                 "config": {"num_symbols": 10,
                                            "output_dim": 8}})
        assert isinstance(pred, StatelessPredictor)
        joi = JoinerFactory({"input_dim": 8, "output_dim": 10})
        assert isinstance(joi, Joiner)
        with pytest.raises(ValueError):
            EncoderFactory({"model": "nope"})

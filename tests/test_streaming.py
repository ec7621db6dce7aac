"""Streaming-encoder tests: Emformer forward/step, Wav2Vec2 raw-pcm path
(mirrors reference emformer_test.py / wav2vec2_test.py coverage)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech2text_tpu.models.emformer import (Emformer, EmformerConfig,
                                             emformer_attention_mask)
from speech2text_tpu.models.wav2vec2 import (Wav2Vec2Config, Wav2Vec2Encoder,
                                             conv_output_lengths)

EM_TINY = EmformerConfig(feats_dim=80, subsampling_rate=4, input_dim=32,
                         num_heads=2, ffn_dim=64, num_layers=2,
                         segment_length=4, left_context_length=8,
                         right_context_length=2, output_dim=32, dropout=0.0)


class TestEmformer:

    @pytest.fixture(scope="class")
    def setup(self):
        m = Emformer(EM_TINY)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 103, 80))
        lens = jnp.asarray([103, 59])
        params = m.init({"params": jax.random.PRNGKey(1)}, x, lens)["params"]
        return m, x, lens, params

    def test_mask_structure(self):
        m = np.asarray(emformer_attention_mask(12, segment=4, left=4,
                                               right=2))
        # frame 5 (segment 1 = [4..7]): sees [0..9]
        assert m[5, 0] and m[5, 9]
        assert not m[5, 10]
        # frame 0 (segment 0): sees [0..5], not beyond
        assert m[0, 5] and not m[0, 6]

    def test_forward(self, setup):
        m, x, lens, params = setup
        out, out_lens = m.apply({"params": params}, x, lens)
        assert out.shape[-1] == 32
        assert np.isfinite(np.asarray(out)).all()
        pad = np.asarray(out[1, int(out_lens[1]):])
        assert np.abs(pad).sum() == 0.0

    def test_streaming_step_shapes(self, setup):
        m, x, lens, params = setup
        states = m.init_state(2)
        chunk = x[:, :32]  # one raw chunk
        out, new_states = m.apply({"params": params}, chunk, states,
                                  method=Emformer.streaming_step)
        assert out.shape[0] == 2 and out.shape[-1] == 32
        assert len(new_states) == EM_TINY.num_layers
        for s in new_states:
            assert s.shape == (2, EM_TINY.left_context_length, 32)
        # a second step consumes the updated caches
        out2, _ = m.apply({"params": params}, x[:, 32:64], new_states,
                          method=Emformer.streaming_step)
        assert np.isfinite(np.asarray(out2)).all()


class TestWav2Vec2:

    def test_conv_length_arithmetic(self):
        lens = conv_output_lengths(jnp.asarray([16000]))
        # wav2vec2 ≈ 49 frames/sec
        assert 48 <= int(lens[0]) <= 50

    def test_forward_on_raw_pcm(self, rng):
        cfg = Wav2Vec2Config(hidden_dim=32, num_layers=1, num_heads=2,
                             ffn_dim=64, output_dim=24, dropout=0.0,
                             conv_pos_kernel=16, conv_pos_groups=4)
        m = Wav2Vec2Encoder(cfg)
        pcm = jnp.asarray(rng.standard_normal((2, 8000)) * 0.1, jnp.float32)
        lens = jnp.asarray([8000, 6000])
        params = m.init({"params": jax.random.PRNGKey(0)}, pcm, lens)[
            "params"]
        out, out_lens = m.apply({"params": params}, pcm, lens)
        assert out.shape[-1] == 24
        assert int(out_lens[1]) == int(conv_output_lengths(
            jnp.asarray([6000]))[0])
        assert np.isfinite(np.asarray(out)).all()

    def test_feature_extractor_frozen(self, rng):
        cfg = Wav2Vec2Config(hidden_dim=32, num_layers=1, num_heads=2,
                             ffn_dim=64, output_dim=24, dropout=0.0,
                             conv_pos_kernel=16, conv_pos_groups=4,
                             freeze_feature_extractor=True)
        m = Wav2Vec2Encoder(cfg)
        pcm = jnp.asarray(rng.standard_normal((1, 4000)) * 0.1, jnp.float32)
        lens = jnp.asarray([4000])
        params = m.init({"params": jax.random.PRNGKey(0)}, pcm, lens)[
            "params"]

        def f(p):
            out, _ = m.apply({"params": p}, pcm, lens)
            return jnp.sum(out ** 2)

        g = jax.grad(f)(params)
        fe = g["feature_extractor"]
        assert sum(float(jnp.abs(v).sum())
                   for v in jax.tree.leaves(fe)) == 0.0
        head = g["head"]
        assert sum(float(jnp.abs(v).sum())
                   for v in jax.tree.leaves(head)) > 0.0

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
        # per-layer caches + step counter
        assert len(new_states) == EM_TINY.num_layers + 1
        for s in new_states[:-1]:
            assert s.shape == (2, EM_TINY.left_context_length, 32)
        assert int(new_states[-1][0]) == 1
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


class TestEmformerMemoryBank:
    """max_memory_size capability (reference emformer.py:36,70 via
    torchaudio Emformer): past-segment summaries join the K/V set."""

    CFG = EmformerConfig(feats_dim=80, subsampling_rate=4, input_dim=32,
                         num_heads=2, ffn_dim=64, num_layers=2,
                         segment_length=4, left_context_length=4,
                         right_context_length=0, max_memory_size=4,
                         output_dim=32, dropout=0.0)

    def test_memory_mask_structure(self):
        from speech2text_tpu.models.emformer import emformer_memory_mask
        m = np.asarray(emformer_memory_mask(16, segment=4, max_memory=2))
        # frame 9 (segment 2): sees summaries of segments 0 and 1 only
        assert m[9, 0] and m[9, 1]
        assert not m[9, 2] and not m[9, 3]
        # frame 2 (segment 0): no past segments
        assert not m[2].any()
        # max_memory bound: frame 15 (segment 3) must not see segment 0
        m2 = np.asarray(emformer_memory_mask(16, segment=4, max_memory=1))
        assert m2[15, 2] and not m2[15, 1] and not m2[15, 0]

    def test_memory_extends_receptive_field(self):
        """A far-past change (outside left context, inside memory range)
        must alter outputs iff max_memory_size > 0."""
        key = jax.random.PRNGKey(0)
        x1 = jax.random.normal(key, (1, 103, 80))
        x2 = x1.at[:, :12].add(1.5)  # perturb raw frames 0-11 (seg 0 only)
        lens = jnp.asarray([103])

        cfg_mem = self.CFG
        cfg_off = dataclasses.replace(cfg_mem, max_memory_size=0)
        for cfg, expect_diff in ((cfg_off, False), (cfg_mem, True)):
            m = Emformer(cfg)
            params = m.init({"params": jax.random.PRNGKey(1)}, x1,
                            lens)["params"]
            o1, ol = m.apply({"params": params}, x1, lens)
            o2, _ = m.apply({"params": params}, x2, lens)
            # subsampled frame 20 = segment 5: left context reaches back to
            # frame 16; segment 0 is visible only through the memory bank
            d = float(jnp.abs(o1[0, 20] - o2[0, 20]).max())
            if expect_diff:
                assert d > 1e-6, "memory bank carried no information"
            else:
                assert d < 1e-6, f"leak without memory bank: {d}"

    def test_streaming_bank_rotation_and_influence(self):
        m = Emformer(self.CFG)
        x = jax.random.normal(jax.random.PRNGKey(2), (1, 131, 80))
        lens = jnp.asarray([131])
        params = m.init({"params": jax.random.PRNGKey(3)}, x,
                        lens)["params"]
        states = m.init_state(1)
        n = self.CFG.num_layers
        assert len(states) == 2 * n + 1  # caches + banks + counter
        # 19 raw frames subsample to exactly segment_length=4 post-conv
        # frames ((T-3)//2+1 twice); the memory bank requires exact
        # segment-sized chunks (one summary per segment, as in training)
        chunks = [x[:, i:i + 19] for i in range(0, 114, 19)]
        outs = []
        for c in chunks:
            o, states = m.apply({"params": params}, c, states,
                                method=Emformer.streaming_step)
            outs.append(o)
        assert int(states[-1][0]) == len(chunks)
        for s in states[n:2 * n]:
            assert s.shape == (1, self.CFG.max_memory_size, 32)
        # memory influence: replaying the last chunk with a fresh state
        # (empty bank+cache) gives a different output
        fresh = m.init_state(1)
        o_fresh, _ = m.apply({"params": params}, chunks[-1], fresh,
                             method=Emformer.streaming_step)
        assert float(jnp.abs(o_fresh - outs[-1]).max()) > 1e-6


import dataclasses  # noqa: E402  (used by TestEmformerMemoryBank)

"""Zipformer cached-streaming tests.

The core machinery — six per-layer caches (key, nonlin value, two
attention values, two conv contexts) — must reproduce the chunk-masked
full forward EXACTLY at the stack level (same math, windowed). The
end-to-end encoder streaming additionally crosses the (non-causal
ConvNeXt) frontend, so it gets a shape/finiteness/continuity check only
(boundary effects documented in models/zipformer.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech2text_tpu.models.zipformer import (Zipformer2, Zipformer2Config,
                                              Zipformer2Stack)
from speech2text_tpu.ops.masking import chunk_causal_mask


class TestStackStreamingExact:

    @pytest.mark.parametrize("downsample", [1, 2])
    def test_streaming_matches_chunked_forward(self, downsample):
        CHUNK, LEFT_CHUNKS, N_CHUNKS = 8, 2, 3
        T = CHUNK * N_CHUNKS
        D = 16
        stack = Zipformer2Stack(
            num_layers=2, downsample=downsample, embed_dim=D, ff_dim=32,
            num_heads=2, query_head_dim=4, value_head_dim=4, pos_head_dim=2,
            pos_dim=8, kernel_size=5, causal=True, dropout=0.0)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, T, D))
        lens = jnp.asarray([T, T])

        cs = CHUNK // downsample

        def attn_mask_fn(Td, ds, pad_mask):
            cm = chunk_causal_mask(Td, jnp.asarray(cs, jnp.int32),
                                   jnp.asarray(LEFT_CHUNKS, jnp.int32))
            return (pad_mask[:, None, :] & pad_mask[:, :, None]
                    & cm[None, :, :])

        params = stack.init({"params": jax.random.PRNGKey(1)}, x, lens,
                            attn_mask_fn)["params"]
        full = stack.apply({"params": params}, x, lens, attn_mask_fn)

        caches = stack.init_cache(2, CHUNK, LEFT_CHUNKS)
        outs = []
        for k in range(N_CHUNKS):
            chunk_x = x[:, k * CHUNK:(k + 1) * CHUNK]
            valid = jnp.asarray(k * cs, jnp.int32)
            out, caches = stack.apply({"params": params}, chunk_x, caches,
                                      valid,
                                      method=Zipformer2Stack.streaming_step)
            outs.append(out)
        streamed = jnp.concatenate(outs, axis=1)
        np.testing.assert_allclose(np.asarray(streamed),
                                   np.asarray(full), rtol=1e-3, atol=1e-4)


class TestEncoderStreaming:

    def test_streaming_step_runs_and_is_continuous(self):
        cfg = Zipformer2Config(
            feature_dim=80, downsampling_factor=(1, 2),
            num_encoder_layers=(1, 1), feedforward_dim=(32, 32),
            encoder_dim=(16, 16), encoder_unmasked_dim=(8, 8),
            num_heads=(2, 2), query_head_dim=4, value_head_dim=4,
            pos_head_dim=2, pos_dim=8, cnn_module_kernel=(5, 5),
            causal=True, dropout=0.0)
        m = Zipformer2(cfg)
        CHUNK = 8
        N_CHUNKS = 4
        T_raw = 2 * CHUNK * N_CHUNKS + 40
        feats = jax.random.normal(jax.random.PRNGKey(0), (1, T_raw, 80))
        params = m.init({"params": jax.random.PRNGKey(1)}, feats,
                        jnp.asarray([T_raw]))["params"]

        state = m.init_streaming_state(1, chunk_size=CHUNK,
                                       left_context_chunks=2)
        outs = []
        for k in range(N_CHUNKS):
            chunk = feats[:, k * 2 * CHUNK:(k + 1) * 2 * CHUNK]
            out, state = m.apply({"params": params}, chunk, state,
                                 method=Zipformer2.streaming_step)
            outs.append(np.asarray(out))
        streamed = np.concatenate(outs, axis=1)
        assert streamed.shape == (1, CHUNK // 2 * N_CHUNKS, 16)
        assert np.isfinite(streamed).all()
        assert int(state["processed"]) == N_CHUNKS
        # chunks are not identical (real information flows across steps)
        assert not np.allclose(outs[1], outs[2])

    def test_chunk_divisibility_asserted(self):
        cfg = Zipformer2Config(downsampling_factor=(1, 8),
                               num_encoder_layers=(1, 1),
                               feedforward_dim=(32, 32),
                               encoder_dim=(16, 16),
                               encoder_unmasked_dim=(8, 8),
                               num_heads=(2, 2), cnn_module_kernel=(5, 5),
                               causal=True)
        m = Zipformer2(cfg)
        with pytest.raises(AssertionError):
            m.init_streaming_state(1, chunk_size=12)  # 12 % 8 != 0

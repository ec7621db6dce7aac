"""Zipformer cached-streaming tests.

The core machinery — six per-layer caches (key, nonlin value, two
attention values, two conv contexts) — must reproduce the chunk-masked
full forward EXACTLY at the stack level (same math, windowed). With the
causal ConvNeXt frontend (round 2), the FULL encoder chain is exact too:
`streaming_prime` + `streaming_step` reproduce the chunk-masked full
forward from frame 0."""

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

    def test_full_chain_streaming_exact(self):
        """streaming_prime + streaming_step ≡ chunk-masked full forward
        (VERDICT round-1 item 4: exactness from frame 0, causal
        ConvNeXt frontend)."""
        cfg = Zipformer2Config(
            feature_dim=80, downsampling_factor=(1, 2),
            num_encoder_layers=(1, 1), feedforward_dim=(32, 32),
            encoder_dim=(16, 16), encoder_unmasked_dim=(8, 8),
            num_heads=(2, 2), query_head_dim=4, value_head_dim=4,
            pos_head_dim=2, pos_dim=8, cnn_module_kernel=(5, 5),
            causal=True, dropout=0.0)
        m = Zipformer2(cfg)
        CHUNK, LEFT_CHUNKS, N_CHUNKS = 8, 2, 4
        T_raw = 2 * CHUNK * N_CHUNKS + Zipformer2.PRIME_EXTRA_RAW
        feats = jax.random.normal(jax.random.PRNGKey(0), (2, T_raw, 80))
        lens = jnp.asarray([T_raw, T_raw])
        params = m.init({"params": jax.random.PRNGKey(1)}, feats,
                        lens)["params"]
        full, full_lens = m.apply(
            {"params": params}, feats, lens,
            chunk_size=jnp.asarray(CHUNK, jnp.int32),
            left_context_chunks=jnp.asarray(LEFT_CHUNKS, jnp.int32))
        assert int(full_lens[0]) == CHUNK * N_CHUNKS // 2

        state = m.init_streaming_state(2, chunk_size=CHUNK,
                                       left_context_chunks=LEFT_CHUNKS)
        prime_raw = 2 * CHUNK + Zipformer2.PRIME_EXTRA_RAW
        out, state = m.apply({"params": params}, feats[:, :prime_raw],
                             state, method=Zipformer2.streaming_prime)
        outs = [np.asarray(out)]
        for k in range(1, N_CHUNKS):
            lo = prime_raw + (k - 1) * 2 * CHUNK
            chunk = feats[:, lo:lo + 2 * CHUNK]
            out, state = m.apply({"params": params}, chunk, state,
                                 method=Zipformer2.streaming_step)
            outs.append(np.asarray(out))
        streamed = np.concatenate(outs, axis=1)
        assert streamed.shape == (2, CHUNK // 2 * N_CHUNKS, 16)
        assert int(state["processed"]) == N_CHUNKS
        np.testing.assert_allclose(
            streamed, np.asarray(full)[:, :streamed.shape[1]],
            rtol=1e-4, atol=1e-5)

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

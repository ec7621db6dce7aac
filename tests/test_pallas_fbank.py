"""Pallas fused-fbank kernel vs the jnp reference (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from speech2text_tpu.data.frontend import (Fbank, FbankConfig, fbank_numpy,
                                           make_dft_matrices,
                                           make_mel_banks, make_window)
from speech2text_tpu.ops.pallas.fbank_kernel import (build_operands,
                                                     fbank_pallas)


@pytest.mark.parametrize("n_samples", [16000, 48000])
def test_matches_numpy_oracle(rng, n_samples):
    cfg = FbankConfig(num_mel_bins=80, snip_edges=True)
    pcm = (0.2 * rng.standard_normal((2, n_samples))).astype(np.float32)
    w, c, s, b = build_operands(make_window(cfg), *make_dft_matrices(cfg),
                                make_mel_banks(cfg))
    max_frames = cfg.num_frames(n_samples)
    feats = fbank_pallas(jnp.asarray(pcm), jnp.asarray(w), jnp.asarray(c),
                         jnp.asarray(s), jnp.asarray(b), max_frames,
                         interpret=True)
    assert feats.shape == (2, max_frames, 80)
    ref = fbank_numpy(cfg, pcm[1])
    np.testing.assert_allclose(np.asarray(feats[1]), ref, rtol=1e-3,
                               atol=1e-2)


def test_matches_jnp_path(rng):
    cfg = FbankConfig(num_mel_bins=80, snip_edges=True)
    pcm = (0.2 * rng.standard_normal((1, 32000))).astype(np.float32)
    fb = Fbank(cfg, use_pallas=False)
    ref, lens = fb(jnp.asarray(pcm), jnp.asarray([32000]))
    w, c, s, b = build_operands(make_window(cfg), *make_dft_matrices(cfg),
                                make_mel_banks(cfg))
    got = fbank_pallas(jnp.asarray(pcm), jnp.asarray(w), jnp.asarray(c),
                       jnp.asarray(s), jnp.asarray(b), ref.shape[1],
                       interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4,
                               atol=1e-3)

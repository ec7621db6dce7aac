"""Frontend tests: JAX fbank vs independent numpy oracle + physics sanity.

Modeled on reference dataset/frontend/frontend_test.py (output-equivalence
between frontend implementations) — here the oracle is a per-frame numpy
implementation of the same kaldi math.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from speech2text_tpu.data import audio
from speech2text_tpu.data.frontend import (Fbank, FbankConfig, FrontendSetup,
                                           fbank_numpy, make_mel_banks)


@pytest.fixture
def tone(rng):
    t = np.arange(16000 * 2) / 16000.0
    return (0.5 * np.sin(2 * np.pi * 440.0 * t)
            + 0.01 * rng.standard_normal(len(t))).astype(np.float32)


@pytest.mark.parametrize("snip_edges", [True, False])
def test_matches_numpy_oracle(tone, snip_edges):
    cfg = FbankConfig(num_mel_bins=80, snip_edges=snip_edges)
    fb = Fbank(cfg)
    feats, flen = fb(jnp.asarray(tone)[None], jnp.array([len(tone)]))
    ref = fbank_numpy(cfg, tone)
    T = int(flen[0])
    assert T == cfg.num_frames(len(tone))
    np.testing.assert_allclose(np.asarray(feats[0, :T]), ref, rtol=1e-3,
                               atol=1e-2)


def test_frame_count_arithmetic():
    cfg = FbankConfig()
    # 25ms/10ms @16k: 400-sample window, 160 shift
    assert cfg.frame_length == 400 and cfg.frame_shift == 160
    assert cfg.padded_window_size == 512
    assert cfg.num_frames(16000) == 1 + (16000 - 400) // 160
    assert cfg.num_frames(399) == 0
    cfg2 = FbankConfig(snip_edges=False)
    assert cfg2.num_frames(16000) == (16000 + 80) // 160


def test_batched_ragged_lengths(tone):
    cfg = FbankConfig()
    fb = Fbank(cfg)
    short = tone[:8000]
    batch = np.zeros((2, len(tone)), np.float32)
    batch[0] = tone
    batch[1, :8000] = short
    feats, flens = fb(jnp.asarray(batch), jnp.array([len(tone), 8000]))
    assert int(flens[1]) == cfg.num_frames(8000)
    ref = fbank_numpy(cfg, short)
    np.testing.assert_allclose(np.asarray(feats[1, :len(ref)]), ref,
                               rtol=2e-4, atol=1e-2)


def test_tone_peaks_at_correct_mel_bin(tone):
    cfg = FbankConfig()
    fb = Fbank(cfg)
    feats, _ = fb(jnp.asarray(tone)[None], jnp.array([len(tone)]))
    mean = np.asarray(feats[0]).mean(axis=0)
    banks = make_mel_banks(cfg)
    bin440 = int(round(440.0 / (16000 / 512)))
    expected_bin = int(np.argmax(banks[:, bin440]))
    assert abs(int(np.argmax(mean)) - expected_bin) <= 1


def test_mel_banks_shape_and_partition():
    cfg = FbankConfig()
    banks = make_mel_banks(cfg)
    assert banks.shape == (80, 257)
    assert banks[:, -1].sum() == 0.0  # nyquist bin zero (kaldi convention)
    # interior fft bins covered by the filterbank sum to ~1ish (triangles overlap)
    assert (banks.sum(axis=0)[10:250] > 0).all()


def test_frontend_factory():
    fb = FrontendSetup("lhotes_fbank", {"num_mel_bins": 80, "snip_edges": True})
    assert isinstance(fb, Fbank) and fb.cfg.snip_edges
    fb2 = FrontendSetup("fbank", {"num_mel_bins": 64, "dither": 0.0})
    assert fb2.feat_dim == 64
    pcm = FrontendSetup("pcm", {"dummy": -1})
    x, l = pcm(np.ones(10), np.array(10))
    assert x.shape == (10,)


def test_wav_io_round_trip(tmp_path, tone):
    path = str(tmp_path / "t.wav")
    audio.write_wav(path, tone, 16000)
    back, sr = audio.read_wav(path)
    assert sr == 16000
    np.testing.assert_allclose(back, tone, atol=1.0 / 32000)


def test_speed_perturb_lengths(tone):
    fast = audio.speed_perturb(tone, 1.1)
    slow = audio.speed_perturb(tone, 0.9)
    assert abs(len(fast) - len(tone) / 1.1) < 10
    assert abs(len(slow) - len(tone) / 0.9) < 10
    same = audio.speed_perturb(tone, 1.0)
    assert len(same) == len(tone)

"""Independent fbank validation against analytically-derived golden values.

The round-1 frontend test validated the JAX fbank against `fbank_numpy`
from the same module (same author) — self-referential. Here every
expectation is derived in-test from the *published kaldi definitions*
(povey window = hann^0.85, preemphasis y[n]=x[n]-0.97x[n-1] with y[0]
reusing x[0], mel(f) = 1127·ln(1+f/700), triangular banks with
(num_bins+1) equal mel-width intervals between low=20Hz and nyquist,
natural log with FLT_EPSILON floor), using closed-form signals (DC,
impulse, exact-bin cosine) and scalar-style numpy math that shares no
code with speech2text_tpu.data.frontend.

Hard golden constants are embedded for the cases with closed forms, so a
simultaneous drift of test math + implementation cannot pass silently.
"""

import math

import numpy as np
import jax.numpy as jnp

from speech2text_tpu.data.frontend import Fbank, FbankConfig

FLT_EPS = 1.1920928955078125e-07
LOG_FLOOR = math.log(FLT_EPS)  # = -15.942385152878742


def kaldi_mel(f):
    return 1127.0 * math.log(1.0 + f / 700.0)


def bank_weight(b, fft_bin, num_bins, n_fft, sr=16000, low=20.0):
    """Triangular kaldi mel-bank weight for one (bank, fft bin) pair,
    straight from the published definition (scalar math)."""
    nyq = sr / 2.0
    mlo, mhi = kaldi_mel(low), kaldi_mel(nyq)
    delta = (mhi - mlo) / (num_bins + 1)
    left = mlo + b * delta
    center = left + delta
    right = center + delta
    m = kaldi_mel(fft_bin * sr / n_fft)
    if m <= left or m >= right:
        return 0.0
    return (m - left) / delta if m <= center else (right - m) / delta


def test_dc_signal_is_log_floor():
    """Constant signal + remove_dc_offset ⇒ zero frame ⇒ every mel energy
    hits kaldi's FLT_EPSILON floor: output ≡ ln(1.1920929e-07)."""
    cfg = FbankConfig(num_mel_bins=23, dither=0.0, remove_dc_offset=True,
                      snip_edges=True)
    fb = Fbank(cfg, use_pallas=False)
    pcm = jnp.full((1, 16000), 0.25, jnp.float32)
    feats, lens = fb(pcm, jnp.asarray([16000], jnp.int32))
    T = int(lens[0])
    assert T == 98
    got = np.asarray(feats[0, :T])
    np.testing.assert_allclose(got, np.full_like(got, -15.942385),
                               atol=1e-4)


def test_cosine_at_exact_fft_bin():
    """flen = n_fft = 512 (32ms @16k), rectangular window, no preemph/DC:
    cos(2π·k·n/512) has DFT power (512/2)² at bin k and 0 elsewhere, so
    mel_b = log(65536 · w_b(k)) with w_b from the published triangle
    formula (zero-weight banks floor at ln FLT_EPSILON)."""
    num_bins, n_fft, k = 40, 512, 60  # bin 60 = 1875 Hz
    cfg = FbankConfig(num_mel_bins=num_bins, frame_length_ms=32.0,
                      frame_shift_ms=16.0, dither=0.0, preemphasis=0.0,
                      remove_dc_offset=False, window_type="rectangular",
                      snip_edges=True)
    assert cfg.frame_length == 512 and cfg.padded_window_size == 512
    n = np.arange(512)
    pcm = np.cos(2.0 * np.pi * k * n / 512.0).astype(np.float32)
    fb = Fbank(cfg, use_pallas=False)
    feats, lens = fb(jnp.asarray(pcm)[None, :],
                     jnp.asarray([512], jnp.int32))
    assert int(lens[0]) == 1
    got = np.asarray(feats[0, 0])

    expected = np.empty(num_bins)
    for b in range(num_bins):
        w = bank_weight(b, k, num_bins, n_fft)
        expected[b] = math.log(max((512.0 / 2.0) ** 2 * w, FLT_EPS))
    # the tone lands inside at least one bank, and most banks are floored
    assert (expected > LOG_FLOOR + 1).sum() >= 1
    np.testing.assert_allclose(got, expected, atol=2e-3)
    # golden literals for bin-60 @ 40 mel bins (computed from the formula
    # above; regression anchor independent of both implementations)
    hot = [(b, e) for b, e in enumerate(expected) if e > LOG_FLOOR + 1]
    assert [b for b, _ in hot] == [19, 20]
    np.testing.assert_allclose([e for _, e in hot],
                               [7.650000, 11.057777], atol=1e-3)


def test_impulse_full_kaldi_chain():
    """Unit impulse at sample 123 through the full kaldi chain (DC removal,
    preemphasis 0.97, povey window, 512-pt power spectrum, mel, log) —
    expectation built with scalar-style math straight from the published
    definitions."""
    num_bins, flen, n_fft, n0, A = 30, 400, 512, 123, 0.5
    cfg = FbankConfig(num_mel_bins=num_bins, dither=0.0, snip_edges=True)
    assert cfg.frame_length == flen and cfg.padded_window_size == n_fft
    pcm = np.zeros(flen, np.float32)
    pcm[n0] = A
    fb = Fbank(cfg, use_pallas=False)
    feats, lens = fb(jnp.asarray(pcm)[None, :], jnp.asarray([flen],
                                                            jnp.int32))
    assert int(lens[0]) == 1
    got = np.asarray(feats[0, 0])

    # --- independent scalar-math expectation ---------------------------
    x = np.zeros(flen, np.float64)
    x[n0] = A
    x = x - x.sum() / flen                     # remove DC offset
    y = np.empty_like(x)                       # kaldi preemphasis
    y[0] = x[0] - 0.97 * x[0]
    for i in range(1, flen):
        y[i] = x[i] - 0.97 * x[i - 1]
    hann = 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(flen) / (flen - 1)))
    y = y * hann ** 0.85                       # povey window
    power = np.empty(n_fft // 2 + 1)
    for kk in range(n_fft // 2 + 1):           # explicit real DFT
        ang = -2.0 * np.pi * kk * np.arange(flen) / n_fft
        power[kk] = (y @ np.cos(ang)) ** 2 + (y @ np.sin(ang)) ** 2
    expected = np.empty(num_bins)
    for b in range(num_bins):
        e = sum(bank_weight(b, kk, num_bins, n_fft) * power[kk]
                for kk in range(n_fft // 2 + 1))
        expected[b] = math.log(max(e, FLT_EPS))
    np.testing.assert_allclose(got, expected, atol=2e-3)


def test_amplitude_scaling_shifts_by_log_gain():
    """log-mel of 2x-amplitude signal = log-mel + ln(4), wherever above
    the floor — a pure structural invariant of the published definition."""
    cfg = FbankConfig(num_mel_bins=40, dither=0.0, snip_edges=True)
    fb = Fbank(cfg, use_pallas=False)
    rng = np.random.default_rng(7)
    pcm = rng.standard_normal(4000).astype(np.float32) * 0.1
    lens = jnp.asarray([4000], jnp.int32)
    f1, L = fb(jnp.asarray(pcm)[None], lens)
    f2, _ = fb(jnp.asarray(2.0 * pcm)[None], lens)
    T = int(L[0])
    a, b = np.asarray(f1[0, :T]), np.asarray(f2[0, :T])
    mask = a > LOG_FLOOR + 2
    assert mask.sum() > 100
    np.testing.assert_allclose((b - a)[mask], math.log(4.0), atol=1e-3)

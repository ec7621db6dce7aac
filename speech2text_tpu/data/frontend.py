"""Kaldi-compatible log-mel fbank, implemented in JAX for on-device batches.

TPU-first design: the reference extracts features per-utterance inside CPU
DataLoader workers (reference dataset/dataset.py:178, frontend.py:57-121);
here featurization is a jitted, batched function over fixed-shape padded PCM,
so it fuses into the training step and rides the MXU (mel projection is a
matmul) instead of burning host CPU.

Math follows the kaldi fbank computation the reference binds to via
torchaudio.compliance.kaldi.fbank / lhotse KaldifeatFbank
(reference frontend.py:86-94,106-110):
  frame 25ms / shift 10ms, remove-DC, preemphasis 0.97, povey window
  (hann^0.85), zero-pad to 512-point rfft, power spectrum, kaldi-mel
  (1127·ln(1+f/700)) triangular banks low=20Hz high=nyquist, natural log
  with float-eps floor. `snip_edges` selects deployment framing
  (True: causal frames from sample 0; False: centered frames w/ reflection).
"""

from __future__ import annotations

import dataclasses
import math
from enum import Enum
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

EPSILON = 1.1920928955078125e-07  # FLT_EPSILON, kaldi's log floor


@dataclasses.dataclass(frozen=True)
class FbankConfig:
    num_mel_bins: int = 80
    frame_length_ms: float = 25.0
    frame_shift_ms: float = 10.0
    sample_rate: int = 16000
    dither: float = 0.0
    preemphasis: float = 0.97
    remove_dc_offset: bool = True
    low_freq: float = 20.0
    high_freq: float = 0.0  # <=0 → offset from nyquist
    snip_edges: bool = True
    window_type: str = "povey"

    @property
    def frame_length(self) -> int:
        return int(self.sample_rate * self.frame_length_ms / 1000.0)

    @property
    def frame_shift(self) -> int:
        return int(self.sample_rate * self.frame_shift_ms / 1000.0)

    @property
    def padded_window_size(self) -> int:
        return 1 << (self.frame_length - 1).bit_length()  # next pow2

    def num_frames(self, num_samples: int) -> int:
        """Frame-count arithmetic (python ints, for host-side shape planning)."""
        if self.snip_edges:
            if num_samples < self.frame_length:
                return 0
            return 1 + (num_samples - self.frame_length) // self.frame_shift
        return (num_samples + self.frame_shift // 2) // self.frame_shift


def feat_lengths(cfg: FbankConfig, sample_lengths: jnp.ndarray) -> jnp.ndarray:
    """Vectorized num_frames for traced length tensors."""
    n = sample_lengths.astype(jnp.int32)
    if cfg.snip_edges:
        return jnp.maximum(0, 1 + (n - cfg.frame_length) // cfg.frame_shift)
    return (n + cfg.frame_shift // 2) // cfg.frame_shift


def povey_window(n: int) -> np.ndarray:
    i = np.arange(n, dtype=np.float64)
    hann = 0.5 - 0.5 * np.cos(2.0 * np.pi * i / (n - 1))
    return np.power(hann, 0.85).astype(np.float32)


def make_window(cfg: FbankConfig) -> np.ndarray:
    n = cfg.frame_length
    i = np.arange(n, dtype=np.float64)
    if cfg.window_type == "povey":
        return povey_window(n)
    if cfg.window_type == "hanning":
        return (0.5 - 0.5 * np.cos(2.0 * np.pi * i / (n - 1))).astype(np.float32)
    if cfg.window_type == "hamming":
        return (0.54 - 0.46 * np.cos(2.0 * np.pi * i / (n - 1))).astype(np.float32)
    if cfg.window_type == "rectangular":
        return np.ones(n, np.float32)
    raise ValueError(f"unknown window {cfg.window_type}")


def mel_scale(freq):
    return 1127.0 * np.log(1.0 + freq / 700.0)


def make_mel_banks(cfg: FbankConfig) -> np.ndarray:
    """(num_mel_bins, n_fft//2 + 1) kaldi-style triangular mel banks.

    kaldi iterates fft bins 0..n_fft/2-1; the nyquist bin gets weight 0.
    """
    n_fft = cfg.padded_window_size
    num_fft_bins = n_fft // 2
    nyquist = 0.5 * cfg.sample_rate
    high = cfg.high_freq if cfg.high_freq > 0 else nyquist + cfg.high_freq
    mel_low, mel_high = mel_scale(cfg.low_freq), mel_scale(high)
    delta = (mel_high - mel_low) / (cfg.num_mel_bins + 1)
    fft_freqs = np.arange(num_fft_bins, dtype=np.float64) * (cfg.sample_rate / n_fft)
    mel_f = mel_scale(fft_freqs)  # (num_fft_bins,)
    banks = np.zeros((cfg.num_mel_bins, num_fft_bins + 1), np.float64)
    for b in range(cfg.num_mel_bins):
        left = mel_low + b * delta
        center = left + delta
        right = center + delta
        up = (mel_f - left) / (center - left)
        down = (right - mel_f) / (right - center)
        banks[b, :num_fft_bins] = np.clip(np.minimum(up, down), 0.0, None)
    return banks.astype(np.float32)


def frame_signal(cfg: FbankConfig, pcm: jnp.ndarray, max_frames: int) -> jnp.ndarray:
    """(B, N) pcm → (B, max_frames, frame_length).

    Fast path (snip_edges, N divisible by frame_shift, frame_length within
    3 hops): overlapping frames built from reshape+concat of hop blocks —
    no gather, which is slow on TPU. Falls back to gather otherwise."""
    B, N = pcm.shape
    flen, shift = cfg.frame_length, cfg.frame_shift
    if cfg.snip_edges:
        n_hops_needed = -(-flen // shift)  # hops covering one frame
        n_fast = N // shift - (n_hops_needed - 1)  # = true frame count
        if N % shift == 0 and n_hops_needed <= 3 and n_fast >= 1:
            T_hops = N // shift
            h = pcm.reshape(B, T_hops, shift)
            frames = jnp.concatenate(
                [h[:, i:i + n_fast] for i in range(n_hops_needed)],
                axis=-1)[:, :, :flen]
            if frames.shape[1] >= max_frames:
                return frames[:, :max_frames]
            pad = max_frames - frames.shape[1]
            return jnp.pad(frames, ((0, 0), (0, pad), (0, 0)))
        starts = jnp.arange(max_frames, dtype=jnp.int32) * shift
        idx = starts[:, None] + jnp.arange(flen, dtype=jnp.int32)[None, :]
        idx = jnp.clip(idx, 0, N - 1)  # out-of-range frames read pad; masked later
        return pcm[:, idx]
    # centered frames with reflection at both edges (kaldi snip_edges=False)
    starts = (jnp.arange(max_frames, dtype=jnp.int32) * shift
              + shift // 2 - flen // 2)
    idx = starts[:, None] + jnp.arange(flen, dtype=jnp.int32)[None, :]
    idx = jnp.where(idx < 0, -idx - 1, idx)
    idx = jnp.where(idx >= N, 2 * N - 1 - idx, idx)
    idx = jnp.clip(idx, 0, N - 1)
    return pcm[:, idx]


def make_dft_matrices(cfg: FbankConfig) -> tuple:
    """Real-DFT as two (frame_length, n_fft//2+1) matmul operands: on TPU a
    fixed-size small DFT is far faster on the MXU than the FFT op (zero
    padding to n_fft is folded into the matrix: only the first
    frame_length rows of the DFT matter)."""
    n_fft = cfg.padded_window_size
    flen = cfg.frame_length
    k = np.arange(n_fft // 2 + 1)
    n = np.arange(flen)
    ang = -2.0 * np.pi * np.outer(n, k) / n_fft
    return (np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32))


@partial(jax.jit, static_argnames=("cfg", "max_frames"))
def _fbank_impl(cfg: FbankConfig, pcm: jnp.ndarray, max_frames: int,
                window: jnp.ndarray, banks: jnp.ndarray,
                dft_cos: jnp.ndarray, dft_sin: jnp.ndarray,
                dither_key: jax.Array | None) -> jnp.ndarray:
    frames = frame_signal(cfg, pcm.astype(jnp.float32), max_frames)
    if cfg.dither > 0.0 and dither_key is not None:
        frames = frames + cfg.dither * jax.random.normal(
            dither_key, frames.shape, jnp.float32)
    if cfg.remove_dc_offset:
        frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    if cfg.preemphasis > 0.0:
        prev = jnp.concatenate([frames[..., :1], frames[..., :-1]], axis=-1)
        frames = frames - cfg.preemphasis * prev
    frames = frames * window
    # power spectrum via matmul-DFT (MXU); fp32 accumulation
    hp = jax.lax.Precision.HIGHEST
    re = jnp.einsum("btn,nk->btk", frames, dft_cos, precision=hp,
                    preferred_element_type=jnp.float32)
    im = jnp.einsum("btn,nk->btk", frames, dft_sin, precision=hp,
                    preferred_element_type=jnp.float32)
    power = jnp.square(re) + jnp.square(im)
    mel = jnp.einsum("btf,mf->btm", power, banks, precision=hp,
                     preferred_element_type=jnp.float32)
    return jnp.log(jnp.maximum(mel, EPSILON))


class Fbank:
    """Batched on-device fbank extractor.

    __call__(pcm (B, N) float32 in [-1,1], sample_lengths (B,)) →
      (feats (B, T_max, num_mel_bins) float32, feat_lengths (B,))
    Frames beyond an utterance's true frame count contain garbage from pad
    samples; consumers must mask via feat_lengths (lengths-as-masks design).
    """

    def __init__(self, cfg: FbankConfig | None = None,
                 use_pallas: bool | None = None, **kwargs):
        self.cfg = cfg or FbankConfig(**kwargs)
        self._window = jnp.asarray(make_window(self.cfg))
        self._banks = jnp.asarray(make_mel_banks(self.cfg))
        dft_cos, dft_sin = make_dft_matrices(self.cfg)
        self._dft_cos = jnp.asarray(dft_cos)
        self._dft_sin = jnp.asarray(dft_sin)
        if use_pallas is None:
            use_pallas = jax.default_backend() not in ("cpu",)
        self._use_pallas = use_pallas
        if use_pallas:
            from ..ops.pallas.fbank_kernel import build_operands
            w, c, s, b = build_operands(
                make_window(self.cfg), dft_cos, dft_sin,
                make_mel_banks(self.cfg))
            self._pl_ops = tuple(jnp.asarray(a) for a in (w, c, s, b))

    @property
    def feat_dim(self) -> int:
        return self.cfg.num_mel_bins

    def __call__(
        self,
        pcm: jnp.ndarray,
        sample_lengths: jnp.ndarray,
        dither_key: jax.Array | None = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        max_frames = self.cfg.num_frames(int(pcm.shape[-1]))
        squeeze = pcm.ndim == 1
        if squeeze:
            pcm = pcm[None]
            sample_lengths = jnp.asarray(sample_lengths).reshape(1)
        cfg = self.cfg
        if max_frames == 0:
            # shorter than one frame: no frames (kaldi snip_edges semantics)
            feats = jnp.zeros((pcm.shape[0], 0, cfg.num_mel_bins),
                              jnp.float32)
        elif (self._use_pallas and cfg.snip_edges
              and dither_key is None
              and pcm.shape[-1] % cfg.frame_shift == 0
              and cfg.frame_length <= 3 * cfg.frame_shift):
            from ..ops.pallas.fbank_kernel import fbank_pallas
            w, c, s, b = self._pl_ops
            feats = fbank_pallas(
                pcm.astype(jnp.float32), w, c, s, b, max_frames,
                frame_length=cfg.frame_length,
                frame_shift=cfg.frame_shift,
                preemph=cfg.preemphasis, remove_dc=cfg.remove_dc_offset,
                n_mels=cfg.num_mel_bins)
        else:
            feats = _fbank_impl(cfg, pcm, max_frames, self._window,
                                self._banks, self._dft_cos, self._dft_sin,
                                dither_key)
        lens = feat_lengths(self.cfg, sample_lengths)
        if squeeze:
            return feats[0], lens[0]
        return feats, lens


class DummyFrontend:
    """Raw-PCM passthrough for wav2vec2-style models (reference
    frontend.py:34-54)."""

    feat_dim = -1

    def __init__(self, dummy: int = -1, **kwargs):
        del dummy, kwargs

    def __call__(self, pcm, sample_lengths, dither_key=None):
        return pcm, sample_lengths


class FeatType(Enum):
    """Feature-pipeline factory (reference frontend.py:146-152). Both fbank
    names map to the same JAX kernel; `lhotes_fbank` keeps the reference's
    (sic) spelling and its snip_edges switch."""
    pcm = "pcm"
    fbank = "fbank"
    lhotes_fbank = "lhotes_fbank"
    torchscript_fbank = "torchscript_fbank"


def FrontendSetup(feat_type: str, config: dict | None = None):
    config = dict(config or {})
    ft = FeatType[feat_type]
    if ft == FeatType.pcm:
        return DummyFrontend(**config)
    if ft in (FeatType.fbank, FeatType.lhotes_fbank, FeatType.torchscript_fbank):
        kw = {}
        if "num_mel_bins" in config:
            kw["num_mel_bins"] = config["num_mel_bins"]
        if "snip_edges" in config:
            kw["snip_edges"] = bool(config["snip_edges"])
        if "dither" in config:
            kw["dither"] = float(config["dither"])
        if ft == FeatType.fbank:
            kw.setdefault("snip_edges", True)
            if "frame_length" in config:
                kw["frame_length_ms"] = float(config["frame_length"])
            if "frame_shift" in config:
                kw["frame_shift_ms"] = float(config["frame_shift"])
            if "samplerate" in config:
                kw["sample_rate"] = int(config["samplerate"])
        return Fbank(FbankConfig(**kw))
    raise ValueError(f"unknown feat_type {feat_type}")


# ----------------------------------------------------------------- numpy ref
def fbank_numpy(cfg: FbankConfig, pcm: np.ndarray) -> np.ndarray:
    """Independent single-utterance numpy implementation (test oracle)."""
    n = len(pcm)
    T = cfg.num_frames(n)
    flen, shift = cfg.frame_length, cfg.frame_shift
    window = make_window(cfg).astype(np.float64)
    banks = make_mel_banks(cfg).astype(np.float64)
    out = np.zeros((T, cfg.num_mel_bins), np.float64)
    for t in range(T):
        if cfg.snip_edges:
            fr = pcm[t * shift:t * shift + flen].astype(np.float64).copy()
        else:
            start = t * shift + shift // 2 - flen // 2
            idx = np.arange(start, start + flen)
            idx = np.where(idx < 0, -idx - 1, idx)
            idx = np.where(idx >= n, 2 * n - 1 - idx, idx)
            fr = pcm[np.clip(idx, 0, n - 1)].astype(np.float64)
        if cfg.remove_dc_offset:
            fr -= fr.mean()
        if cfg.preemphasis > 0:
            fr = fr - cfg.preemphasis * np.concatenate([[fr[0]], fr[:-1]])
        fr = fr * window
        spec = np.fft.rfft(fr, n=cfg.padded_window_size)
        power = np.abs(spec) ** 2
        out[t] = np.log(np.maximum(banks @ power, EPSILON))
    return out.astype(np.float32)

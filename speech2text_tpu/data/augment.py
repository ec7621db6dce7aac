"""On-device, batched, jittable data augmentation.

TPU-first redesign of reference dataset/frontend/data_augmentation.py: the
reference augments one utterance at a time inside CPU dataloader workers;
here every transform is a pure function over the whole padded batch with an
explicit PRNG key, so augmentation fuses into the jitted train step.

- spec_augment (:150-196 parity): 2 time masks (≤50 frames) + 2 freq masks
  (≤10 bins), zeroed; mask positions independent per utterance.
- mix_feats (:59-118 parity, icefall idea): log-mel-domain energy-scaled
  mixing of a noise feature matrix at a random SNR from a fixed list.
- add_noise (:13-56 parity): waveform-domain SNR mixing; the noise clip is
  circularly shifted (random offset) to cover the utterance, gain-scaled to
  the target SNR, clipped to [-1, 1].
- speed perturbation stays host-side (resampling changes lengths;
  data/audio.py:speed_perturb).

Each transform takes `apply` — a per-utterance bernoulli mask — so the
"p(apply)" semantics of the reference live inside the same jitted call.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from jax import lax


def spec_augment(
    feats: jnp.ndarray,        # (B, T, D)
    feat_lens: jnp.ndarray,    # (B,)
    key: jax.Array,
    num_time_masks: int = 2,
    time_mask_max: int = 50,
    num_freq_masks: int = 2,
    freq_mask_max: int = 10,
    apply: jnp.ndarray | None = None,   # (B,) bool
) -> jnp.ndarray:
    B, T, D = feats.shape
    kt, kw, kf, kfw = jax.random.split(key, 4)
    t_idx = lax.broadcasted_iota(jnp.int32, (1, 1, T), 2)
    f_idx = lax.broadcasted_iota(jnp.int32, (1, 1, D), 2)

    # time masks: start ∈ [0, max(len - w, 1)), width ∈ [0, time_mask_max]
    tw = jax.random.randint(kw, (B, num_time_masks, 1), 0, time_mask_max + 1)
    max_start = jnp.maximum(feat_lens[:, None, None] - tw, 1)
    ts = (jax.random.uniform(kt, (B, num_time_masks, 1))
          * max_start.astype(jnp.float32)).astype(jnp.int32)
    time_masked = jnp.any((t_idx >= ts) & (t_idx < ts + tw), axis=1)  # (B,T)

    fw = jax.random.randint(kfw, (B, num_freq_masks, 1), 0, freq_mask_max + 1)
    fs = jax.random.randint(kf, (B, num_freq_masks, 1), 0,
                            jnp.maximum(D - freq_mask_max, 1))
    freq_masked = jnp.any((f_idx >= fs) & (f_idx < fs + fw), axis=1)  # (B,D)

    kill = time_masked[:, :, None] | freq_masked[:, None, :]
    if apply is not None:
        kill = kill & apply[:, None, None]
    return jnp.where(kill, 0.0, feats)


def mix_feats(
    feats: jnp.ndarray,        # (B, T, D) log-mel
    feat_lens: jnp.ndarray,
    noise_feats: jnp.ndarray,  # (B, Tn, D) log-mel noise (padded/cropped)
    noise_lens: jnp.ndarray,
    key: jax.Array,
    snrs: Sequence[float] = (10.0, 20.0),
    apply: jnp.ndarray | None = None,
) -> jnp.ndarray:
    B, T, D = feats.shape
    Tn = noise_feats.shape[1]
    k_snr, k_off = jax.random.split(key)
    snr = jnp.asarray(snrs, jnp.float32)[
        jax.random.randint(k_snr, (B,), 0, len(snrs))]

    # tile noise over time with a random circular offset to cover T
    off = jax.random.randint(k_off, (B,), 0, jnp.maximum(noise_lens, 1))
    t = jnp.arange(T, dtype=jnp.int32)
    idx = (off[:, None] + t[None, :]) % jnp.maximum(noise_lens, 1)[:, None]
    noise = jnp.take_along_axis(noise_feats, idx[:, :, None], axis=1)

    valid = (t[None, :] < feat_lens[:, None]).astype(jnp.float32)
    lin_s = jnp.exp(feats)
    lin_n = jnp.exp(noise)
    e_s = jnp.sum(lin_s * valid[..., None], axis=(1, 2)) / jnp.maximum(
        jnp.sum(valid, axis=1) * D, 1.0)
    e_n = jnp.sum(lin_n * valid[..., None], axis=(1, 2)) / jnp.maximum(
        jnp.sum(valid, axis=1) * D, 1.0)
    factor = e_s / (e_n * jnp.power(10.0, snr / 10.0) + 1e-10)
    mixed = jnp.log(jnp.maximum(lin_s + factor[:, None, None] * lin_n,
                                1.1920929e-07))
    if apply is not None:
        mixed = jnp.where(apply[:, None, None], mixed, feats)
    return mixed


def add_noise(
    pcm: jnp.ndarray,          # (B, N) float32 [-1, 1]
    pcm_lens: jnp.ndarray,
    noise_pcm: jnp.ndarray,    # (B, Nn)
    noise_lens: jnp.ndarray,
    key: jax.Array,
    min_snr_db: float = 10.0,
    max_snr_db: float = 50.0,
    apply: jnp.ndarray | None = None,
) -> jnp.ndarray:
    B, N = pcm.shape
    k_snr, k_off = jax.random.split(key)
    snr = jax.random.uniform(k_snr, (B,), minval=min_snr_db,
                             maxval=max_snr_db)
    off = jax.random.randint(k_off, (B,), 0, jnp.maximum(noise_lens, 1))
    t = jnp.arange(N, dtype=jnp.int32)
    idx = (off[:, None] + t[None, :]) % jnp.maximum(noise_lens, 1)[:, None]
    noise = jnp.take_along_axis(noise_pcm, idx, axis=1)

    valid = (t[None, :] < pcm_lens[:, None]).astype(jnp.float32)
    p_s = jnp.sum(jnp.square(pcm) * valid, axis=1) / jnp.maximum(
        jnp.sum(valid, axis=1), 1.0)
    p_n = jnp.sum(jnp.square(noise) * valid, axis=1) / jnp.maximum(
        jnp.sum(valid, axis=1), 1.0)
    gain = jnp.sqrt(p_s / (p_n * jnp.power(10.0, snr / 10.0) + 1e-12))
    out = pcm + gain[:, None] * noise * valid
    out = jnp.clip(out, -1.0, 1.0)
    if apply is not None:
        out = jnp.where(apply[:, None], out, pcm)
    return out

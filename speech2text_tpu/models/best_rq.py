"""BEST-RQ: random-projection quantizer for SSL pretraining.

Capability parity with reference model/ssl/best_rq.py:70-405:
- frozen random projector + N frozen random codebooks (:91-107); labels are
  the nearest codebook entry (euclidean argmin / cosine argmax) of the
  projected *stacked* features — stacking by the encoder subsampling rate
  aligns label rate with encoder output rate (:168-217)
- span masking of the input features over the non-padded region (static /
  uniform / normal / poisson span lengths); masked frames are replaced by
  N(0, 0.1) noise (:219-257, 296-405)

TPU redesign: the reference draws masks with per-worker numpy RNG; here
everything is a pure jittable function of an explicit PRNG key, batched.
Frozen tensors are generated once (numpy, seeded) and closed over as
constants — they are not trainable params and never need checkpoint sync.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class MaskingStrategyConfig:
    mask_proportion: float = 0.5      # fraction of (label-rate) frames
    mean_span_length: int = 2         # in label-rate frames
    span_distribution: str = "static"  # static|uniform|normal|poisson
    noise_std: float = 0.1


@dataclasses.dataclass
class BestRQConfig:
    feature_dim: int = 80
    stack_size: int = 4               # = encoder subsampling rate
    num_codebooks: int = 16
    codebook_size: int = 8192
    codebook_dim: int = 16
    distance: str = "euclidean"       # euclidean | cosine
    seed: int = 1234
    masking: MaskingStrategyConfig = dataclasses.field(
        default_factory=MaskingStrategyConfig)


class BestRQLayer:
    """Pure-function BEST-RQ layer (not an nn.Module: nothing trainable)."""

    def __init__(self, config: BestRQConfig):
        self.cfg = config
        rng = np.random.default_rng(config.seed)
        d_in = config.feature_dim * config.stack_size
        # frozen projector ~ xavier-uniform; frozen normalized codebooks
        limit = np.sqrt(6.0 / (d_in + config.codebook_dim))
        self.projector = jnp.asarray(
            rng.uniform(-limit, limit, (d_in, config.codebook_dim)),
            jnp.float32)
        books = rng.standard_normal(
            (config.num_codebooks, config.codebook_size,
             config.codebook_dim)).astype(np.float32)
        self.codebooks = jnp.asarray(books)

    # ------------------------------------------------------------- stacking
    def stack_feats(self, feats: jnp.ndarray,
                    feat_lens: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(B, T, D) → (B, T//s, s·D) frame stacking (reference
        _get_subsampling_arrangment, best_rq.py:168-217)."""
        B, T, D = feats.shape
        s = self.cfg.stack_size
        T2 = T // s
        stacked = feats[:, :T2 * s].reshape(B, T2, s * D)
        return stacked, feat_lens // s

    # --------------------------------------------------------------- labels
    def labels(self, raw_feats: jnp.ndarray, feat_lens: jnp.ndarray):
        """Quantize raw (unmasked) features → (num_books, B, T2) labels."""
        stacked, lens2 = self.stack_feats(raw_feats, feat_lens)
        proj = jnp.einsum("btd,dc->btc", stacked, self.projector,
                          preferred_element_type=jnp.float32)
        if self.cfg.distance == "cosine":
            p = proj / (jnp.linalg.norm(proj, axis=-1, keepdims=True) + 1e-8)
            c = self.codebooks / (jnp.linalg.norm(
                self.codebooks, axis=-1, keepdims=True) + 1e-8)
            sim = jnp.einsum("btc,nkc->nbtk", p, c,
                             preferred_element_type=jnp.float32)
            labels = jnp.argmax(sim, axis=-1)
        else:
            # ||p − c||² = ||p||² − 2 p·c + ||c||²; ||p||² constant in argmin
            pc = jnp.einsum("btc,nkc->nbtk", proj, self.codebooks,
                            preferred_element_type=jnp.float32)
            c2 = jnp.sum(jnp.square(self.codebooks), axis=-1)  # (n, k)
            labels = jnp.argmin(c2[:, None, None, :] - 2.0 * pc, axis=-1)
        return labels.astype(jnp.int32), lens2

    # -------------------------------------------------------------- masking
    def span_mask(self, key: jax.Array, B: int, T2: int,
                  lens2: jnp.ndarray) -> jnp.ndarray:
        """(B, T2) bool span mask over valid frames (reference
        _random_mask / masking strategies, best_rq.py:219-257,296-405)."""
        m = self.cfg.masking
        k_start, k_len = jax.random.split(key)
        mean_span = max(m.mean_span_length, 1)
        # expected starts so that starts·span ≈ proportion·len
        p_start = m.mask_proportion / mean_span
        starts = jax.random.bernoulli(k_start, p_start, (B, T2))
        if m.span_distribution == "static":
            span = jnp.full((B, T2), mean_span, jnp.int32)
        elif m.span_distribution == "uniform":
            span = jax.random.randint(k_len, (B, T2), 1, 2 * mean_span + 1)
        elif m.span_distribution == "normal":
            span = jnp.clip(jnp.round(
                mean_span + jax.random.normal(k_len, (B, T2)) * mean_span
                * 0.5), 1, 4 * mean_span).astype(jnp.int32)
        elif m.span_distribution == "poisson":
            span = jnp.clip(jax.random.poisson(k_len, mean_span, (B, T2)),
                            1, 6 * mean_span).astype(jnp.int32)
        else:
            raise ValueError(m.span_distribution)
        # span expansion: frame t is masked if ∃ start s ≤ t < s + span(s).
        # cheap trick: scatter +1 at starts, −1 at ends, cumsum > 0
        t_idx = jnp.arange(T2)
        delta = jnp.zeros((B, T2 + 4 * mean_span + 8), jnp.int32)
        b_idx = jnp.arange(B)[:, None]
        starts_i = starts.astype(jnp.int32)
        delta = delta.at[b_idx, t_idx[None, :]].add(starts_i)
        ends = jnp.minimum(t_idx[None, :] + span, delta.shape[1] - 1)
        delta = delta.at[b_idx, ends].add(-starts_i)
        mask = jnp.cumsum(delta, axis=1)[:, :T2] > 0
        valid = t_idx[None, :] < lens2[:, None]
        return mask & valid

    def apply_mask(self, key: jax.Array, feats: jnp.ndarray,
                   mask2: jnp.ndarray) -> jnp.ndarray:
        """Replace masked frames (at label rate, expanded ×stack) of the
        (B, T, D) features by N(0, noise_std) noise."""
        B, T, D = feats.shape
        s = self.cfg.stack_size
        frame_mask = jnp.repeat(mask2, s, axis=1)
        frame_mask = jnp.pad(frame_mask,
                             ((0, 0), (0, max(T - frame_mask.shape[1], 0))))
        frame_mask = frame_mask[:, :T]
        noise = jax.random.normal(key, feats.shape) * self.cfg.masking.noise_std
        return jnp.where(frame_mask[..., None], noise, feats)

    # --------------------------------------------------------------- __call__
    def __call__(self, key: jax.Array, raw_feats: jnp.ndarray,
                 auged_feats: jnp.ndarray, feat_lens: jnp.ndarray):
        """Returns (masked_feats, labels (n,B,T2), mask2 (B,T2), lens2)."""
        k_mask, k_noise = jax.random.split(key)
        labels, lens2 = self.labels(raw_feats, feat_lens)
        T2 = labels.shape[-1]
        mask2 = self.span_mask(k_mask, raw_feats.shape[0], T2, lens2)
        masked = self.apply_mask(k_noise, auged_feats, mask2)
        return masked, labels, mask2, lens2

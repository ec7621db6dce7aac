"""Wav2Vec2-style raw-waveform encoder.

Capability parity with reference model/encoder/wav2vec2.py:25-110 (which
wraps a HuggingFace pretrained torch model): per-utterance zero-mean /
unit-variance PCM normalization (:69-87), conv feature extractor with the
standard wav2vec2 stride schedule and its output-length arithmetic
(:45-67), transformer encoder with convolutional relative positional
embedding, and a linear head to `output_dim`.

This environment has no network egress, so pretrained weights load only
from a local flax msgpack path (`pretrained_path`); otherwise the encoder
trains from scratch (documented deviation — the reference downloads HF
weights at construction time).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..ops.masking import make_non_pad_mask
from .conformer import FeedForward, MaskedMHSA

# standard wav2vec2-base feature-extractor schedule: (dim, kernel, stride)
_CONV_SCHEDULE = ((512, 10, 5), (512, 3, 2), (512, 3, 2), (512, 3, 2),
                  (512, 3, 2), (512, 2, 2), (512, 2, 2))


@dataclasses.dataclass
class Wav2Vec2Config:
    hidden_dim: int = 768
    num_layers: int = 12
    num_heads: int = 8
    ffn_dim: int = 3072
    output_dim: int = 256
    dropout: float = 0.1
    conv_pos_kernel: int = 128
    conv_pos_groups: int = 16
    freeze_feature_extractor: bool = True
    pretrained_path: str | None = None
    dtype: str = "float32"


def conv_output_lengths(lengths: jnp.ndarray) -> jnp.ndarray:
    """wav2vec2 conv-stack length arithmetic (reference wav2vec2.py:45-67)."""
    out = lengths.astype(jnp.int32)
    for _, k, s in _CONV_SCHEDULE:
        out = (out - k) // s + 1
    return jnp.maximum(out, 0)


class FeatureExtractor(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pcm):  # (B, N) → (B, T, 512)
        h = pcm[:, :, None].astype(self.dtype)
        for i, (dim, k, s) in enumerate(_CONV_SCHEDULE):
            h = nn.Conv(dim, (k,), strides=(s,), padding="VALID",
                        use_bias=False, dtype=self.dtype,
                        name=f"conv{i}")(h)
            if i == 0:
                h = nn.GroupNorm(num_groups=dim, dtype=self.dtype)(h)
            h = nn.gelu(h)
        return h


class Wav2Vec2Encoder(nn.Module):
    config: Wav2Vec2Config

    @nn.compact
    def __call__(self, pcm: jnp.ndarray, sample_lengths: jnp.ndarray,
                 deterministic: bool = True
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        cfg = self.config
        dt = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32

        # per-utterance zero-mean/unit-var normalization over valid samples
        valid = make_non_pad_mask(sample_lengths, pcm.shape[1]).astype(
            jnp.float32)
        n = jnp.maximum(jnp.sum(valid, axis=1, keepdims=True), 1.0)
        mean = jnp.sum(pcm * valid, axis=1, keepdims=True) / n
        var = jnp.sum(jnp.square(pcm - mean) * valid, axis=1,
                      keepdims=True) / n
        pcm = (pcm - mean) / jnp.sqrt(var + 1e-7) * valid

        feats = FeatureExtractor(dt, name="feature_extractor")(pcm)
        if cfg.freeze_feature_extractor:
            import jax
            feats = jax.lax.stop_gradient(feats)
        out_lens = conv_output_lengths(sample_lengths)
        h = nn.LayerNorm(dtype=dt)(feats)
        h = nn.Dense(cfg.hidden_dim, dtype=dt, name="feature_projection")(h)

        # convolutional positional embedding
        pos = nn.Conv(cfg.hidden_dim, (cfg.conv_pos_kernel,),
                      padding="SAME",
                      feature_group_count=cfg.conv_pos_groups, dtype=dt,
                      name="pos_conv")(h)
        h = h + nn.gelu(pos)
        h = nn.LayerNorm(dtype=dt)(h)

        pad_mask = make_non_pad_mask(out_lens, h.shape[1])
        for i in range(cfg.num_layers):
            a = MaskedMHSA(cfg.num_heads, dt, name=f"attn{i}")(
                nn.LayerNorm(dtype=dt)(h), pad_mask, deterministic,
                cfg.dropout)
            h = h + a
            f = FeedForward(cfg.ffn_dim, cfg.dropout, dt, name=f"ffn{i}")(
                nn.LayerNorm(dtype=dt)(h), deterministic)
            h = h + f
        out = nn.Dense(cfg.output_dim, dtype=dt, name="head")(h)
        out = jnp.where(pad_mask[..., None], out, 0.0)
        return out.astype(jnp.float32), out_lens

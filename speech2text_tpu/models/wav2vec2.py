"""Wav2Vec2 raw-waveform encoder, HF-checkpoint compatible.

Capability parity with reference model/encoder/wav2vec2.py:25-110 (which
wraps a HuggingFace pretrained torch model): per-utterance zero-mean /
unit-variance PCM normalization (:69-87), conv feature extractor with the
standard wav2vec2 stride schedule and its output-length arithmetic
(:45-67), transformer encoder with convolutional relative positional
embedding, and a linear head to `output_dim`.

The module structure mirrors the HF `Wav2Vec2Model` exactly — both the
post-norm "base" layout and the pre-norm `do_stable_layer_norm` "large"
layout, and both `feat_extract_norm` modes ("group": GroupNorm after conv0
only, no conv bias; "layer": per-layer LayerNorm + conv bias) — so that
weights converted from a local HF safetensors checkpoint
(tools/convert_wav2vec2.py; this environment has no network egress)
reproduce the torch forward numerically. `pretrained_path` points at the
converted flax msgpack; the task init merges it over the random init.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.masking import make_non_pad_mask

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
    # HF layout switches: base = ("group", False); large = ("layer", True)
    feat_extract_norm: str = "group"
    do_stable_layer_norm: bool = False
    pretrained_path: str | None = None
    dtype: str = "float32"


def conv_output_lengths(lengths: jnp.ndarray) -> jnp.ndarray:
    """wav2vec2 conv-stack length arithmetic (reference wav2vec2.py:45-67)."""
    out = lengths.astype(jnp.int32)
    for _, k, s in _CONV_SCHEDULE:
        out = (out - k) // s + 1
    return jnp.maximum(out, 0)


class FeatureExtractor(nn.Module):
    norm_mode: str = "group"  # "group" | "layer"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pcm):  # (B, N) → (B, T, 512)
        h = pcm[:, :, None].astype(self.dtype)
        layer_mode = self.norm_mode == "layer"
        for i, (dim, k, s) in enumerate(_CONV_SCHEDULE):
            h = nn.Conv(dim, (k,), strides=(s,), padding="VALID",
                        use_bias=layer_mode, dtype=self.dtype,
                        name=f"conv{i}")(h)
            if layer_mode:
                h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"norm{i}")(h)
            elif i == 0:
                h = nn.GroupNorm(num_groups=dim, epsilon=1e-5, dtype=self.dtype,
                                 name="norm0")(h)
            h = nn.gelu(h, approximate=False)
        return h


class Wav2Vec2Attention(nn.Module):
    """HF-layout MHA: separate q/k/v/out projections, scale on q."""
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pad_mask):
        B, T, D = x.shape
        H = self.num_heads
        hd = D // H
        q = nn.Dense(D, dtype=self.dtype, name="q_proj")(x) * (hd ** -0.5)
        k = nn.Dense(D, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(D, dtype=self.dtype, name="v_proj")(x)
        q = q.reshape(B, T, H, hd).transpose(0, 2, 1, 3)
        k = k.reshape(B, T, H, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, T, H, hd).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        scores = jnp.where(pad_mask[:, None, None, :], scores, -1e30)
        attn = nn.softmax(scores, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v,
                         preferred_element_type=jnp.float32)
        out = out.transpose(0, 2, 1, 3).reshape(B, T, D).astype(self.dtype)
        return nn.Dense(D, dtype=self.dtype, name="out_proj")(out)


class Wav2Vec2FeedForward(nn.Module):
    ffn_dim: int
    dropout: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        D = x.shape[-1]
        h = nn.Dense(self.ffn_dim, dtype=self.dtype,
                     name="intermediate_dense")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dropout(rate=self.dropout)(h, deterministic=deterministic)
        return nn.Dense(D, dtype=self.dtype, name="output_dense")(h)


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

        feats = FeatureExtractor(cfg.feat_extract_norm, dt,
                                 name="feature_extractor")(pcm)
        if cfg.freeze_feature_extractor:
            feats = jax.lax.stop_gradient(feats)
        out_lens = conv_output_lengths(sample_lengths)
        h = nn.LayerNorm(epsilon=1e-5, dtype=dt, name="fp_layer_norm")(feats)
        h = nn.Dense(cfg.hidden_dim, dtype=dt, name="feature_projection")(h)

        # zero padded positions so pad energy cannot leak through pos_conv
        pad_mask = make_non_pad_mask(out_lens, h.shape[1])
        h = jnp.where(pad_mask[..., None], h, 0.0)

        # convolutional positional embedding: HF pads k//2 both sides then
        # trims the trailing frame for even kernels ⇒ (k//2, k//2 − 1)
        kp = cfg.conv_pos_kernel
        pos_pad = ((kp // 2, kp // 2 - (1 if kp % 2 == 0 else 0)),)
        pos = nn.Conv(cfg.hidden_dim, (kp,), padding=pos_pad,
                      feature_group_count=cfg.conv_pos_groups, dtype=dt,
                      name="pos_conv")(h)
        h = h + nn.gelu(pos, approximate=False)
        if not cfg.do_stable_layer_norm:
            h = nn.LayerNorm(epsilon=1e-5, dtype=dt, name="encoder_layer_norm")(h)

        for i in range(cfg.num_layers):
            if cfg.do_stable_layer_norm:  # pre-norm ("large"/robust layout)
                a = Wav2Vec2Attention(cfg.num_heads, dt, name=f"attn{i}")(
                    nn.LayerNorm(epsilon=1e-5, dtype=dt, name=f"layer_norm{i}")(h),
                    pad_mask)
                a = nn.Dropout(rate=cfg.dropout)(
                    a, deterministic=deterministic)
                h = h + a
                f = Wav2Vec2FeedForward(cfg.ffn_dim, cfg.dropout, dt,
                                        name=f"ffn{i}")(
                    nn.LayerNorm(epsilon=1e-5, dtype=dt, name=f"final_layer_norm{i}")(h),
                    deterministic)
                h = h + f
            else:  # post-norm ("base" layout)
                a = Wav2Vec2Attention(cfg.num_heads, dt, name=f"attn{i}")(
                    h, pad_mask)
                a = nn.Dropout(rate=cfg.dropout)(
                    a, deterministic=deterministic)
                h = nn.LayerNorm(epsilon=1e-5, dtype=dt, name=f"layer_norm{i}")(h + a)
                f = Wav2Vec2FeedForward(cfg.ffn_dim, cfg.dropout, dt,
                                        name=f"ffn{i}")(h, deterministic)
                h = nn.LayerNorm(epsilon=1e-5, dtype=dt,
                                 name=f"final_layer_norm{i}")(h + f)
        if cfg.do_stable_layer_norm:
            h = nn.LayerNorm(epsilon=1e-5, dtype=dt, name="encoder_layer_norm")(h)

        out = nn.Dense(cfg.output_dim, dtype=dt, name="head")(h)
        out = jnp.where(pad_mask[..., None], out, 0.0)
        return out.astype(jnp.float32), out_lens

"""Zipformer2 encoder (flax.linen) — the flagship ASR encoder.

A from-scratch TPU implementation of the Zipformer architecture
(arXiv 2310.11230; capability parity with reference
model/encoder/zipformer.py:48-899):

- Conv2d frontend at ½ frame rate → N sequential stacks, each running at
  its own time resolution `downsampling_factor[i]` (SimpleDownsample =
  learned-weight average pooling; SimpleUpsample = repeat), with
  per-stack width `encoder_dim[i]` and a bypass connection around every
  stack and layer (learnable per-channel scale, clamped).
- Each layer computes multi-head attention **weights once** and reuses
  them three ways (two value-attentions + one nonlinear attention), has
  three feedforwards (¾×, 1×, 5/4× ff_dim) and two convolution modules
  (chunk-causal when `causal`), with BiasNorm and Swoosh activations
  (reference zipformer.py:909-1338, scaling.py SwooshL/R & BiasNorm).
- Final output recombines the widest stack dimension from the last
  stacks that produce each channel range (`_get_full_dim_output`
  semantics, zipformer.py:450-463) and downsamples ×2.
- Training-time regularization: whole-sequence feature masking of the
  dims above `encoder_unmasked_dim` (zipformer.py:229-288) and random
  chunked-causal attention masks (zipformer.py:290-317,409-448) for
  streaming-capable models. Simulated-streaming `streaming_forward`
  applies a fixed chunk mask (zipformer.py:391-407).

Design deviations from icefall (intentional, TPU-first):
- Balancer/Whiten gradient shapers and int8-compressed activation
  memory are training heuristics for fp16 CUDA; bf16 on TPU with XLA
  rematerialization covers their role. Hooks kept as config flags.
- BatchNorm-free everywhere (BiasNorm/LayerNorm only) → no cross-batch
  state to sync under SPMD.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.masking import make_non_pad_mask


# ------------------------------------------------------------- primitives
def swoosh_l(x):
    """SwooshL(x) = log(1 + e^(x-4)) − 0.08x − 0.035 (zipformer paper)."""
    return jnp.logaddexp(0.0, x - 4.0) - 0.08 * x - 0.035


def swoosh_r(x):
    """SwooshR(x) = log(1 + e^(x-1)) − 0.08x − 0.313261687."""
    return jnp.logaddexp(0.0, x - 1.0) - 0.08 * x - 0.313261687


class BiasNorm(nn.Module):
    """x / RMS(x − b) · e^s with learnable per-channel bias b and scalar
    log-scale s (reference scaling.py:347-477) — cheaper than LayerNorm
    (no mean subtraction on the output path)."""
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        bias = self.param("bias", nn.initializers.zeros, (d,))
        log_scale = self.param("log_scale", nn.initializers.zeros, ())
        x32 = x.astype(jnp.float32)
        rms = jnp.sqrt(jnp.mean(jnp.square(x32 - bias), axis=-1,
                                keepdims=True) + 1e-8)
        return ((x32 / rms) * jnp.exp(log_scale)).astype(self.dtype)


class BypassModule(nn.Module):
    """Learnable per-channel interpolation y = x + c·(m(x) − x), c clamped
    to [min, 1] (reference zipformer.py:1499-1555)."""
    min_scale: float = 0.25

    @nn.compact
    def __call__(self, x_orig, x_new):
        d = x_new.shape[-1]
        scale = self.param("bypass_scale",
                           nn.initializers.constant(0.5), (d,))
        c = jnp.clip(scale, self.min_scale, 1.0)
        return x_orig + c * (x_new - x_orig)


def convert_num_channels(x: jnp.ndarray, num_channels: int) -> jnp.ndarray:
    """Pad with zeros or truncate the channel dim (reference
    scaling.py:1153-1668 convert_num_channels)."""
    d = x.shape[-1]
    if num_channels <= d:
        return x[..., :num_channels]
    pad = [(0, 0)] * (x.ndim - 1) + [(0, num_channels - d)]
    return jnp.pad(x, pad)


class SimpleDownsample(nn.Module):
    """Downsample ×f over time by a learned softmax-weighted average of
    each group of f frames (reference zipformer.py:1653-1690)."""
    factor: int

    @nn.compact
    def __call__(self, x):
        if self.factor == 1:
            return x
        B, T, D = x.shape
        f = self.factor
        T2 = -(-T // f)
        pad = T2 * f - T
        # pad by repeating the last frame (keeps averages sane at the tail)
        x = jnp.concatenate([x, jnp.repeat(x[:, -1:], pad, axis=1)], axis=1) \
            if pad else x
        w = self.param("weights", nn.initializers.zeros, (f,))
        w = jax.nn.softmax(w)
        x = x.reshape(B, T2, f, D)
        return jnp.einsum("btfd,f->btd", x, w)


class SimpleUpsample(nn.Module):
    """Upsample ×f by frame repetition (reference zipformer.py:1693-1719)."""
    factor: int

    def __call__(self, x, out_len: int):
        if self.factor == 1:
            return x[:, :out_len]
        x = jnp.repeat(x, self.factor, axis=1)
        return x[:, :out_len]


# ------------------------------------------------------ frontend (½ rate)
class ConvNeXtBlock(nn.Module):
    """Residual depthwise-conv block used inside the subsampling frontend
    (reference model/layer/subsampling.py:26-178)."""
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, T, F, C)
        h = nn.Conv(self.channels, kernel_size=(7, 7), padding="SAME",
                    feature_group_count=self.channels, dtype=self.dtype)(x)
        h = nn.Dense(self.channels * 3, dtype=self.dtype)(h)
        h = swoosh_l(h)
        h = nn.Dense(self.channels, dtype=self.dtype)(h)
        return x + h


class Conv2dSubsampling(nn.Module):
    """fbank (B, T, F) → (B, (T−7)//2, out_dim): conv (k3,s1) → conv
    (k3,s2) → conv (k3,s1) + ConvNeXt, then linear (reference
    model/layer/subsampling.py:181-414 length arithmetic)."""
    out_dim: int
    mid_channels: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, lengths):
        h = x[..., None].astype(self.dtype)                # (B, T, F, 1)
        h = nn.Conv(self.mid_channels, (3, 3), strides=(1, 1),
                    padding="VALID", dtype=self.dtype)(h)
        h = swoosh_r(h)
        h = nn.Conv(self.mid_channels, (3, 3), strides=(2, 2),
                    padding="VALID", dtype=self.dtype)(h)
        h = swoosh_r(h)
        h = nn.Conv(self.mid_channels, (3, 3), strides=(1, 1),
                    padding="VALID", dtype=self.dtype)(h)
        h = swoosh_r(h)
        h = ConvNeXtBlock(self.mid_channels, self.dtype)(h)
        B, T2, F2, C = h.shape
        h = nn.Dense(self.out_dim, dtype=self.dtype)(h.reshape(B, T2,
                                                               F2 * C))
        h = BiasNorm(self.dtype)(h)
        lengths = lengths.astype(jnp.int32)
        out_len = (((lengths - 2) - 3) // 2 + 1) - 2       # (T−7)//2 − 1
        return h, jnp.maximum(out_len, 0)


# ------------------------------------------------------------- attention
class CompactRelPositionalEncoding(nn.Module):
    """Compact relative positional embedding: relative offsets are
    log-compressed then Fourier-embedded (reference zipformer.py:1722-1833
    behavior: resolution concentrates near offset 0)."""
    pos_dim: int = 48
    length_factor: float = 1.0

    def __call__(self, T: int) -> jnp.ndarray:
        # offsets −(T−1) .. (T−1)
        x = jnp.arange(-(T - 1), T, dtype=jnp.float32)
        compression = 8.0
        c = jnp.sign(x) * jnp.log1p(jnp.abs(x) / compression) * compression
        d = self.pos_dim // 2
        freqs = jnp.exp(jnp.arange(d, dtype=jnp.float32)
                        * (-np.log(200.0) / max(d - 1, 1)))
        ang = c[:, None] * freqs[None, :]
        return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


class AttentionWeights(nn.Module):
    """Shared attention-weight computation: content (q·k) + positional
    (q_p · rel-pos) scores → softmax (reference
    RelPositionMultiheadAttentionWeights, zipformer.py:1836-2208)."""
    embed_dim: int
    num_heads: int
    query_head_dim: int
    pos_head_dim: int
    pos_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pos_emb, attn_mask=None):
        B, T, D = x.shape
        H, qd, pd = self.num_heads, self.query_head_dim, self.pos_head_dim
        q = nn.Dense(H * qd, dtype=self.dtype, name="q_proj")(x)
        k = nn.Dense(H * qd, dtype=self.dtype, name="k_proj")(x)
        qp = nn.Dense(H * pd, dtype=self.dtype, name="qpos_proj")(x)
        q = q.reshape(B, T, H, qd)
        k = k.reshape(B, T, H, qd)
        qp = qp.reshape(B, T, H, pd)
        scores = jnp.einsum("bthd,bshd->bhts", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores / jnp.sqrt(jnp.float32(qd))
        # positional scores: project pos_emb (2T−1, pos_dim) → (2T−1, H, pd),
        # then gather the batch-independent relative table FIRST (T² · H · pd,
        # small) so no (B, H, T, 2T−1) intermediate is ever materialized
        p = nn.Dense(H * pd, use_bias=False, dtype=self.dtype,
                     name="pos_proj")(pos_emb).reshape(-1, H, pd)
        t_idx = jnp.arange(T)[:, None]
        s_idx = jnp.arange(T)[None, :]
        rel = (t_idx - s_idx) + (T - 1)                      # (T, T)
        p_rel = p[rel]                                       # (T, T, H, pd)
        pos_scores = jnp.einsum("bthd,tshd->bhts", qp, p_rel,
                                preferred_element_type=jnp.float32)
        scores = scores + pos_scores / jnp.sqrt(jnp.float32(pd))
        scores = jnp.clip(scores, -100.0, 100.0)  # attn-score limiting
        if attn_mask is not None:
            scores = jnp.where(attn_mask[:, None, :, :], scores, -1e30)
        return jax.nn.softmax(scores, axis=-1).astype(self.dtype)


class SelfAttention(nn.Module):
    """Value path reusing precomputed attention weights (reference
    zipformer.py:2211-2378)."""
    embed_dim: int
    num_heads: int
    value_head_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attn_weights):
        B, T, D = x.shape
        H, vd = self.num_heads, self.value_head_dim
        v = nn.Dense(H * vd, dtype=self.dtype)(x).reshape(B, T, H, vd)
        out = jnp.einsum("bhts,bshd->bthd", attn_weights, v,
                         preferred_element_type=jnp.float32)
        out = out.reshape(B, T, H * vd).astype(self.dtype)
        return nn.Dense(D, dtype=self.dtype)(out)


class NonlinAttention(nn.Module):
    """Gated attention: (tanh(s) ⊙ x) attended by shared weights
    (reference zipformer.py:2381-2544)."""
    embed_dim: int
    hidden: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attn_weights_1head):
        B, T, D = x.shape
        h = nn.Dense(3 * self.hidden, dtype=self.dtype)(x)
        s, a, b = jnp.split(h, 3, axis=-1)
        a = jnp.tanh(s) * a
        # attend with the first head's weights (reference uses one head)
        out = jnp.einsum("bts,bsd->btd", attn_weights_1head, b,
                         preferred_element_type=jnp.float32)
        out = (jnp.tanh(s) * out.astype(self.dtype))
        return nn.Dense(D, dtype=self.dtype)(out)


class FeedforwardModule(nn.Module):
    ff_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True, dropout=0.1):
        D = x.shape[-1]
        h = nn.Dense(self.ff_dim, dtype=self.dtype)(x)
        h = swoosh_l(h)
        h = nn.Dropout(rate=dropout)(h, deterministic=deterministic)
        return nn.Dense(D, dtype=self.dtype)(h)


class ConvolutionModule(nn.Module):
    """pointwise-GLU → depthwise (causal left-pad when `causal`) →
    SwooshR → pointwise (reference zipformer.py:2547-2737)."""
    kernel_size: int
    causal: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pad_mask):
        B, T, D = x.shape
        h = nn.Dense(2 * D, dtype=self.dtype)(x)
        h = nn.glu(h, axis=-1)
        h = jnp.where(pad_mask[..., None], h, 0.0)
        if self.causal:
            h = jnp.pad(h, ((0, 0), (self.kernel_size - 1, 0), (0, 0)))
            h = nn.Conv(D, (self.kernel_size,), padding="VALID",
                        feature_group_count=D, dtype=self.dtype)(h)
        else:
            h = nn.Conv(D, (self.kernel_size,), padding="SAME",
                        feature_group_count=D, dtype=self.dtype)(h)
        h = swoosh_r(h)
        return nn.Dense(D, dtype=self.dtype)(h)


# ----------------------------------------------------------------- layer
class Zipformer2EncoderLayer(nn.Module):
    embed_dim: int
    ff_dim: int
    num_heads: int
    query_head_dim: int
    value_head_dim: int
    pos_head_dim: int
    pos_dim: int
    kernel_size: int
    causal: bool
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    use_balancer: bool = False
    use_whiten: bool = False

    @nn.compact
    def __call__(self, x, pos_emb, pad_mask, attn_mask=None,
                 deterministic=True):
        from ..ops.regularizers import balancer, whiten
        D = self.embed_dim
        attn_w = AttentionWeights(
            D, self.num_heads, self.query_head_dim, self.pos_head_dim,
            self.pos_dim, self.dtype, name="attn_weights")(
                x, pos_emb, attn_mask)
        src = x
        x = x + FeedforwardModule(self.ff_dim * 3 // 4, self.dtype,
                                  name="ff1")(x, deterministic,
                                              self.dropout)
        x = x + NonlinAttention(D, D * 3 // 4, self.dtype,
                                name="nonlin_attn")(x, attn_w[:, 0])
        x = x + SelfAttention(D, self.num_heads, self.value_head_dim,
                              self.dtype, name="self_attn1")(x, attn_w)
        x = x + ConvolutionModule(self.kernel_size, self.causal, self.dtype,
                                  name="conv1")(x, pad_mask)
        x = x + FeedforwardModule(self.ff_dim, self.dtype, name="ff2")(
            x, deterministic, self.dropout)
        if self.use_balancer and not deterministic:
            x = balancer(x)
        x = BypassModule(name="bypass_mid")(src, x)
        x = x + SelfAttention(D, self.num_heads, self.value_head_dim,
                              self.dtype, name="self_attn2")(x, attn_w)
        x = x + ConvolutionModule(self.kernel_size, self.causal, self.dtype,
                                  name="conv2")(x, pad_mask)
        x = x + FeedforwardModule(self.ff_dim * 5 // 4, self.dtype,
                                  name="ff3")(x, deterministic,
                                              self.dropout)
        x = BiasNorm(self.dtype, name="norm")(x)
        if self.use_whiten and not deterministic:
            x = whiten(x)
        x = BypassModule(name="bypass")(src, x)
        return x


class Zipformer2Stack(nn.Module):
    """One resolution stack: downsample → layers → upsample → bypass."""
    num_layers: int
    downsample: int
    embed_dim: int
    ff_dim: int
    num_heads: int
    query_head_dim: int
    value_head_dim: int
    pos_head_dim: int
    pos_dim: int
    kernel_size: int
    causal: bool
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    remat: bool = False
    use_balancer: bool = False
    use_whiten: bool = False

    @nn.compact
    def __call__(self, x, lengths, attn_mask_fn, deterministic=True):
        B, T, D_in = x.shape
        x_orig = x
        x = convert_num_channels(x, self.embed_dim)
        x = SimpleDownsample(self.downsample, name="downsample")(x)
        ds_len = -(-lengths // self.downsample)
        Td = x.shape[1]
        pad_mask = make_non_pad_mask(ds_len, Td)
        attn_mask = attn_mask_fn(Td, self.downsample, pad_mask)
        pos_emb = CompactRelPositionalEncoding(self.pos_dim)(Td)
        layer_cls = Zipformer2EncoderLayer
        if self.remat:
            layer_cls = nn.remat(Zipformer2EncoderLayer,
                                 static_argnums=(5,))
        for i in range(self.num_layers):
            x = layer_cls(
                self.embed_dim, self.ff_dim, self.num_heads,
                self.query_head_dim, self.value_head_dim, self.pos_head_dim,
                self.pos_dim, self.kernel_size, self.causal, self.dropout,
                self.dtype, self.use_balancer, self.use_whiten,
                name=f"layer{i}")(
                    x, pos_emb, pad_mask, attn_mask, deterministic)
        x = SimpleUpsample(self.downsample)(x, T)
        x = jnp.where(make_non_pad_mask(lengths, T)[..., None], x, 0.0)
        # bypass around the whole stack at the common width
        d_common = min(D_in, self.embed_dim)
        out = BypassModule(name="stack_bypass")(
            x_orig[..., :d_common], x[..., :d_common])
        if self.embed_dim > d_common:
            out = jnp.concatenate([out, x[..., d_common:]], axis=-1)
        return out


# ------------------------------------------------------------------ model
@dataclasses.dataclass
class Zipformer2Config:
    feature_dim: int = 80
    downsampling_factor: Tuple[int, ...] = (1, 2, 4, 8, 4, 2)
    num_encoder_layers: Tuple[int, ...] = (2, 2, 2, 2, 2, 2)
    feedforward_dim: Tuple[int, ...] = (512, 768, 768, 768, 768, 768)
    encoder_dim: Tuple[int, ...] = (192, 256, 256, 256, 256, 256)
    encoder_unmasked_dim: Tuple[int, ...] = (192, 192, 192, 192, 192, 192)
    num_heads: Tuple[int, ...] = (4, 4, 4, 8, 4, 4)
    query_head_dim: int = 32
    value_head_dim: int = 12
    pos_head_dim: int = 4
    pos_dim: int = 48
    cnn_module_kernel: Tuple[int, ...] = (31, 31, 15, 15, 15, 31)
    causal: bool = False
    chunk_size: Tuple[int, ...] = (-1,)
    left_context_frames: Tuple[int, ...] = (-1,)
    output_downsampling_factor: int = 2
    dropout: float = 0.1
    feature_mask_dropout_prob: float = 0.15
    for_ctc: bool = False          # reference: optional CTC projection
    ctc_out_dim: int = -1
    dtype: str = "float32"
    remat: bool = False            # jax.checkpoint each layer (memory↓)
    # icefall-style gradient shapers (ops/regularizers.py); off by default
    use_balancer: bool = False
    use_whiten: bool = False

    @classmethod
    def from_config(cls, cfg: dict) -> "Zipformer2Config":
        cfg = dict(cfg)
        for k in ("downsampling_factor", "num_encoder_layers",
                  "feedforward_dim", "encoder_dim", "encoder_unmasked_dim",
                  "num_heads", "cnn_module_kernel", "chunk_size",
                  "left_context_frames"):
            if k in cfg and isinstance(cfg[k], list):
                cfg[k] = tuple(cfg[k])
        valid = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in cfg.items() if k in valid})

    @property
    def output_dim(self) -> int:
        return max(self.encoder_dim)


class Zipformer2(nn.Module):
    config: Zipformer2Config

    def _dtype(self):
        return jnp.bfloat16 if self.config.dtype == "bfloat16" \
            else jnp.float32

    @nn.compact
    def __call__(self, feats, lengths, deterministic: bool = True,
                 chunk_size: Optional[jnp.ndarray] = None,
                 left_context_chunks: Optional[jnp.ndarray] = None):
        """feats (B, T, F) → (out (B, T', max(encoder_dim)), out_lens).

        chunk_size: traced scalar (frames at the post-frontend rate); <= 0
        or None → full attention. During causal training the task samples
        it per step (reference zipformer.py:290-317 random chunk sizes).
        """
        cfg = self.config
        dt = self._dtype()
        x, lens = Conv2dSubsampling(cfg.encoder_dim[0], dtype=dt,
                                    name="embed")(feats, lengths)
        B, T, _ = x.shape

        # whole-sequence feature masking above unmasked_dim (train only)
        if not deterministic and cfg.feature_mask_dropout_prob > 0:
            rng = self.make_rng("dropout")
            keep = jax.random.bernoulli(
                rng, 1.0 - cfg.feature_mask_dropout_prob, (B, 1, 1))
        else:
            keep = None

        if chunk_size is None:
            chunk_size = jnp.asarray(-1, jnp.int32)
        if left_context_chunks is None:
            left_context_chunks = jnp.asarray(-1, jnp.int32)

        def attn_mask_fn(Td, ds_factor, pad_mask):
            # chunk size is defined at the base (post-frontend) rate;
            # convert to this stack's rate (reference zipformer.py:409-448)
            from ..ops.masking import chunk_causal_mask
            if not cfg.causal:
                return pad_mask[:, None, :] & pad_mask[:, :, None]
            cs = jnp.where(chunk_size > 0,
                           jnp.maximum(chunk_size // ds_factor, 1), -1)
            cm = chunk_causal_mask(Td, cs, left_context_chunks)
            return (pad_mask[:, None, :] & pad_mask[:, :, None]
                    & cm[None, :, :])

        outputs = []
        for i in range(len(cfg.encoder_dim)):
            x = Zipformer2Stack(
                num_layers=cfg.num_encoder_layers[i],
                downsample=cfg.downsampling_factor[i],
                embed_dim=cfg.encoder_dim[i],
                ff_dim=cfg.feedforward_dim[i],
                num_heads=cfg.num_heads[i],
                query_head_dim=cfg.query_head_dim,
                value_head_dim=cfg.value_head_dim,
                pos_head_dim=cfg.pos_head_dim,
                pos_dim=cfg.pos_dim,
                kernel_size=cfg.cnn_module_kernel[i],
                causal=cfg.causal,
                dropout=cfg.dropout,
                dtype=dt,
                remat=cfg.remat,
                use_balancer=cfg.use_balancer,
                use_whiten=cfg.use_whiten,
                name=f"stack{i}")(x, lens, attn_mask_fn, deterministic)
            if keep is not None:
                um = cfg.encoder_unmasked_dim[i]
                d_idx = jnp.arange(x.shape[-1])
                mask = jnp.where(d_idx[None, None, :] < um, 1.0,
                                 keep.astype(x.dtype))
                x = x * mask
            outputs.append(x)

        # full-dim recombination (zipformer.py:450-463): for each channel
        # range, take it from the LAST stack wide enough to produce it
        full_dim = max(cfg.encoder_dim)
        pieces = []
        cur = 0
        dims = list(cfg.encoder_dim)
        while cur < full_dim:
            # widest requirement first: find last stack with dim > cur
            candidates = [j for j, d in enumerate(dims) if d > cur]
            j = candidates[-1]
            hi = dims[j]
            pieces.append(outputs[j][..., cur:hi])
            cur = hi
        out = jnp.concatenate(pieces, axis=-1)

        # final ×2 time downsample
        f = cfg.output_downsampling_factor
        out = SimpleDownsample(f, name="out_downsample")(out)
        out_lens = -(-lens // f)
        out = jnp.where(make_non_pad_mask(out_lens, out.shape[1])[..., None],
                        out, 0.0)
        return out.astype(jnp.float32), out_lens

    def streaming_forward(self, feats, lengths, chunk_size: int = 32,
                          left_context_chunks: int = 4):
        """Simulated streaming: full forward under a fixed chunk-causal
        mask (reference zipformer.py:391-407)."""
        return self(feats, lengths, deterministic=True,
                    chunk_size=jnp.asarray(chunk_size, jnp.int32),
                    left_context_chunks=jnp.asarray(left_context_chunks,
                                                    jnp.int32))

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
  (causal when `causal`), with BiasNorm and Swoosh activations
  (reference zipformer.py:909-1338, scaling.py SwooshL/R & BiasNorm).
- Final output recombines the widest stack dimension (`_get_full_dim_output`
  semantics, zipformer.py:450-463) and downsamples ×2.
- Training-time regularization: whole-sequence feature masking above
  `encoder_unmasked_dim` (zipformer.py:229-288) and random chunked-causal
  attention masks (zipformer.py:290-317,409-448). Simulated streaming
  `streaming_forward` applies a fixed chunk mask (zipformer.py:391-407).
- **True cached streaming** (`init_streaming_state`/`streaming_prime`/
  `streaming_step`, reference zipformer.py:528-663): per layer the same
  six caches as the reference — attention key, nonlin-attention value,
  two attention values, two convolution left-contexts — plus frontend
  caches (8 raw frames for the stride-2 conv stack, 6 sub-frames for the
  causal ConvNeXt). Streaming reproduces the chunk-masked full forward
  EXACTLY from frame 0 (tested in tests/test_zipformer_streaming.py).
- Training dynamics (`dynamics: true`): ScheduledFloat-driven
  attention/conv/ff skip-rate schedules, const-attention, bypass
  scale_min/skip schedules, and per-module Balancer/Whiten placements
  with the reference's limits (zipformer.py:937-950,1015-1072,1499-1555,
  2405-2437), all evaluated on the traced global step inside one
  compiled program.

Design deviations from icefall (intentional, TPU-first):
- The frontend ConvNeXt is causal (left-pad 6) when `causal=True`,
  replacing the reference's centered kernel + 3-frame streaming holdback
  (subsampling.py:300-414) — exact streaming with fixed shapes.
- Balancer/Whiten apply their expected gradient (prob-scaled) every step
  instead of host-side Bernoulli application (see ops/regularizers.py).
- BatchNorm-free everywhere → no cross-batch state to sync under SPMD.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

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
    log-scale s (reference scaling.py:347-477)."""
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
    """y = x + c·(m(x) − x), c learnable per channel, clamped to [min, 1]
    (reference zipformer.py:1499-1555).

    In dynamics mode `scale_min` is the traced ScheduledFloat value
    ((0, 0.9) → (20000, 0.2)) applied as a straight-through clamp
    (reference `limit_param_value`), and `skip_mask` (B, 1, 1) implements
    the per-sequence layer-skip (`skip_rate`)."""
    min_scale: float = 0.25

    @nn.compact
    def __call__(self, x_orig, x_new, scale_min=None, skip_mask=None):
        d = x_new.shape[-1]
        scale = self.param("bypass_scale",
                           nn.initializers.constant(0.5), (d,))
        if scale_min is None:
            c = jnp.clip(scale, self.min_scale, 1.0)
        else:
            from ..ops.regularizers import limit_param_value
            c = limit_param_value(scale, scale_min, 1.0)
        if skip_mask is not None:
            c = c * skip_mask
        return x_orig + c * (x_new - x_orig)


def scaled_init(scale: float):
    """ScaledLinear-equivalent kernel init (reference scaling.py:479-550):
    default init shrunk by `initial_scale` so residual-branch outputs start
    small."""
    return nn.initializers.variance_scaling(scale * scale, "fan_in",
                                            "truncated_normal")


def convert_num_channels(x: jnp.ndarray, num_channels: int) -> jnp.ndarray:
    d = x.shape[-1]
    if num_channels <= d:
        return x[..., :num_channels]
    pad = [(0, 0)] * (x.ndim - 1) + [(0, num_channels - d)]
    return jnp.pad(x, pad)


class SimpleDownsample(nn.Module):
    """×f time downsample by learned softmax-weighted averaging of each
    f-frame group (reference zipformer.py:1653-1690)."""
    factor: int

    @nn.compact
    def __call__(self, x):
        if self.factor == 1:
            return x
        B, T, D = x.shape
        f = self.factor
        T2 = -(-T // f)
        pad = T2 * f - T
        x = jnp.concatenate([x, jnp.repeat(x[:, -1:], pad, axis=1)], axis=1) \
            if pad else x
        w = self.param("weights", nn.initializers.zeros, (f,))
        w = jax.nn.softmax(w)
        x = x.reshape(B, T2, f, D)
        return jnp.einsum("btfd,f->btd", x, w)


class SimpleUpsample(nn.Module):
    """×f upsample by frame repetition (reference zipformer.py:1693-1719)."""
    factor: int

    def __call__(self, x, out_len: int):
        if self.factor == 1:
            return x[:, :out_len]
        x = jnp.repeat(x, self.factor, axis=1)
        return x[:, :out_len]


# ------------------------------------------------------ frontend (½ rate)
class ConvNeXtBlock(nn.Module):
    """Residual depthwise-conv block inside the subsampling frontend
    (reference model/layer/subsampling.py:26-178).

    When `causal`, the 7-tap time kernel is left-padded (6, 0) instead of
    centered — a TPU-first replacement for the reference's centered kernel
    + 3-frame streaming holdback (subsampling.py:300-414): streaming then
    needs only a 6-sub-frame left cache (`step`) and reproduces the full
    forward exactly."""
    channels: int
    dtype: jnp.dtype = jnp.float32
    causal: bool = False

    CONTEXT = 6  # time receptive field − 1

    def setup(self):
        self.dw = nn.Conv(self.channels, kernel_size=(7, 7),
                          padding="VALID",
                          feature_group_count=self.channels,
                          dtype=self.dtype)
        self.pw1 = nn.Dense(self.channels * 3, dtype=self.dtype)
        # reference ScaledConv2d initial_scale=0.01 (subsampling.py:67-72)
        self.pw2 = nn.Dense(self.channels, dtype=self.dtype,
                            kernel_init=scaled_init(0.01))

    def _h(self, xw):
        """xw: time already padded/windowed; freq padded SAME here."""
        xp = jnp.pad(xw, ((0, 0), (0, 0), (3, 3), (0, 0)))
        h = self.dw(xp)
        return self.pw2(swoosh_l(self.pw1(h)))

    def __call__(self, x):  # (B, T, F, C)
        pad_t = (self.CONTEXT, 0) if self.causal else (3, 3)
        xw = jnp.pad(x, ((0, 0), pad_t, (0, 0), (0, 0)))
        return x + self._h(xw)

    def step(self, window):
        """Causal streaming: window (B, CONTEXT + c, F, C) of consecutive
        sub-frames (cache ++ new) → outputs for the c new frames, exactly
        equal to the causal `__call__` on the full stream."""
        return window[:, self.CONTEXT:] + self._h(window)


class Conv2dSubsampling(nn.Module):
    """fbank (B, T, F) → (B, (T−7)//2 − 1, out_dim) (reference
    model/layer/subsampling.py:181-414 length arithmetic).

    Streaming (causal=True only): the conv stack consumes raw frames with
    a 9-frame receptive field at stride 2, so `stream_prime` takes the
    first `2c + RAW_TAIL` raw frames (emitting sub-frames from s₀ with no
    boundary error) and `stream_step` takes `2c` raw frames per chunk,
    carrying an 8-raw-frame tail + 6-sub-frame ConvNeXt cache. Outputs are
    bit-identical to `__call__` on the whole stream (the zero-initialized
    ConvNeXt cache coincides with the causal `__call__`'s left padding).

    Perf note (v5e, measured — do NOT re-attempt): reformulating these
    small-channel convs as MXU matmuls LOSES to XLA's native conv
    lowering at the full-step level, even though standalone piece
    timings suggest otherwise. Banded-matmul conv1 (C_in=1): 48.6 →
    47.4 ms/step as plain nn.Conv; space-to-depth conv2 + 9-tap-matmul
    conv3: 47.4 → 51.6 ms/step. im2col with strided slices is ~10×
    worse still. Sub-frontend stop-grad ablation numbers carry ±5 ms
    fusion artifacts (docs/evidence/backprof_r3_lattice.json) — trust
    only full-step A/Bs here."""
    out_dim: int
    mid_channels: int = 32
    dtype: jnp.dtype = jnp.float32
    causal: bool = False

    # raw frames carried between chunks for the stride-2 conv stack
    RAW_TAIL = 8
    MID_CHANNELS = 32  # default mid_channels, for cache construction

    def setup(self):
        self.conv1 = nn.Conv(self.mid_channels, (3, 3), strides=(1, 1),
                             padding="VALID", dtype=self.dtype)
        self.conv2 = nn.Conv(self.mid_channels, (3, 3), strides=(2, 2),
                             padding="VALID", dtype=self.dtype)
        self.conv3 = nn.Conv(self.mid_channels, (3, 3), strides=(1, 1),
                             padding="VALID", dtype=self.dtype)
        self.convnext = ConvNeXtBlock(self.mid_channels, self.dtype,
                                      self.causal)
        self.out = nn.Dense(self.out_dim, dtype=self.dtype)
        self.out_norm = BiasNorm(self.dtype)

    def _stack(self, x):  # (B, T, F) → (B, (T−9)//2+1, F2, C)
        from ..stopgrad_probe import tag
        h = x[..., None].astype(self.dtype)
        h = tag(swoosh_r(self.conv1(h)), "sub_conv1")
        h = tag(swoosh_r(self.conv2(h)), "sub_conv2")
        return tag(swoosh_r(self.conv3(h)), "sub_conv3")

    def _head(self, h):  # (B, T2, F2, C) → (B, T2, out_dim)
        from ..stopgrad_probe import tag
        B, T2, F2, C = h.shape
        return self.out_norm(self.out(tag(h, "sub_convnext").reshape(
            B, T2, F2 * C)))

    @staticmethod
    def freq_dim(feature_dim: int) -> int:
        return ((feature_dim - 2 - 3) // 2 + 1) - 2

    def __call__(self, x, lengths):
        h = self._head(self.convnext(self._stack(x)))
        lengths = lengths.astype(jnp.int32)
        out_len = (((lengths - 2) - 3) // 2 + 1) - 2       # (T−7)//2 − 1
        return h, jnp.maximum(out_len, 0)

    # ------------------------------------------------------------ streaming
    def init_cache(self, batch_size: int, feature_dim: int):
        assert self.causal, "exact streaming requires causal ConvNeXt"
        F2 = self.freq_dim(feature_dim)
        return {
            "raw_tail": jnp.zeros((batch_size, self.RAW_TAIL, feature_dim),
                                  jnp.float32),
            "sub": jnp.zeros((batch_size, ConvNeXtBlock.CONTEXT, F2,
                              self.mid_channels), self.dtype),
        }

    def stream_prime(self, feats, cache):
        """First chunk: (B, 2c + RAW_TAIL, F) raw frames → (B, c, out_dim).
        The zero `sub` cache reproduces the causal left padding exactly."""
        h = self._stack(feats)                      # (B, c, F2, C)
        win = jnp.concatenate([cache["sub"], h], axis=1)
        out = self._head(self.convnext.step(win))
        return out, {"raw_tail": feats[:, -self.RAW_TAIL:],
                     "sub": win[:, -ConvNeXtBlock.CONTEXT:]}

    def stream_step(self, feats, cache):
        """Steady state: (B, 2c, F) raw frames → (B, c, out_dim)."""
        raw = jnp.concatenate([cache["raw_tail"], feats], axis=1)
        h = self._stack(raw)                        # (B, c, F2, C)
        win = jnp.concatenate([cache["sub"], h], axis=1)
        out = self._head(self.convnext.step(win))
        return out, {"raw_tail": raw[:, -self.RAW_TAIL:],
                     "sub": win[:, -ConvNeXtBlock.CONTEXT:]}


# ------------------------------------------------------------- attention
class CompactRelPositionalEncoding(nn.Module):
    """Compact relative positional embedding: log-compressed offsets →
    Fourier features (reference zipformer.py:1722-1833).

    `variant`:
      - "fourier" (default): this repo's own basis — log-compressed offset
        × geometric frequency ladder, sin‖cos concatenated.
      - "icefall": bit-parity with the reference's formula
        (zipformer.py:1765-1813: atan(log-compressed/length_scale) phase,
        integer freqs, interleaved cos/sin, trailing bias channel 1.0).
        Used by the reference-weight parity oracle
        (tests/test_zipformer_ref_oracle.py): with converted reference
        weights the attention pos-scores match the torch model exactly.
        Note the sign flip: this repo indexes the table by
        (query−key) offset everywhere, the reference by (key−query)."""
    pos_dim: int = 48
    variant: str = "fourier"

    def table(self, max_offset: int) -> jnp.ndarray:
        """Embeddings for offsets −max_offset..max_offset
        (shape (2·max_offset+1, pos_dim)); row o+max_offset is the
        embedding consumed for query−key offset o."""
        x = jnp.arange(-max_offset, max_offset + 1, dtype=jnp.float32)
        if self.variant == "icefall":
            x = -x  # reference convention: row indexed by key−query
            cl = float(self.pos_dim) ** 0.5
            x_c = cl * jnp.sign(x) * (jnp.log(jnp.abs(x) + cl) - np.log(cl))
            length_scale = self.pos_dim / (2.0 * np.pi)  # length_factor=1
            phase = jnp.arctan(x_c / length_scale)
            freqs = 1.0 + jnp.arange(self.pos_dim // 2, dtype=jnp.float32)
            ang = phase[:, None] * freqs[None, :]
            pe = jnp.stack([jnp.cos(ang), jnp.sin(ang)], axis=-1)
            pe = pe.reshape(x.shape[0], self.pos_dim)
            return pe.at[:, -1].set(1.0)
        if self.variant != "fourier":
            raise ValueError(f"unknown pos variant {self.variant!r}")
        compression = 8.0
        c = jnp.sign(x) * jnp.log1p(jnp.abs(x) / compression) * compression
        d = self.pos_dim // 2
        freqs = jnp.exp(jnp.arange(d, dtype=jnp.float32)
                        * (-np.log(200.0) / max(d - 1, 1)))
        ang = c[:, None] * freqs[None, :]
        return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)

    def __call__(self, T: int) -> jnp.ndarray:
        return self.table(T - 1)


class AttentionWeights(nn.Module):
    """Shared attention-weight computation: content + positional scores →
    softmax (reference RelPositionMultiheadAttentionWeights,
    zipformer.py:1836-2208)."""
    embed_dim: int
    num_heads: int
    query_head_dim: int
    pos_head_dim: int
    pos_dim: int
    dtype: jnp.dtype = jnp.float32
    # dtype of the two big score einsum OUTPUTS on the training path (the
    # (B,H,T,T) content scores and the (T,2T−1,B,H) rel-pos tensor — the
    # largest HBM tensors in the step). bf16 halves their traffic through
    # the rel-shift reindex + transpose; the add/clip/mask/softmax still
    # run in f32 (upcast fuses into the consumer, costing no extra HBM).
    score_dtype: jnp.dtype = jnp.float32
    # smallest (static, trace-time) batch at which `fused` actually uses
    # the Pallas kernel; below it, per-kernel overheads aren't amortized
    # and the kernel LOSES (B=24: 42.1 vs 40.3 ms/step; B=96: 128.0 vs
    # 131.3 — docs/evidence/r4_perf_ab.json), so `fused` silently routes
    # to the materialized path. 0 forces the kernel (tests).
    flash_min_batch: int = 48

    def setup(self):
        H, qd, pd = self.num_heads, self.query_head_dim, self.pos_head_dim
        self.q_proj = nn.Dense(H * qd, dtype=self.dtype)
        self.k_proj = nn.Dense(H * qd, dtype=self.dtype)
        self.qpos_proj = nn.Dense(H * pd, dtype=self.dtype)
        self.pos_proj = nn.Dense(H * pd, use_bias=False, dtype=self.dtype)

    def _scores(self, q, k, qp, p_rel):
        """q (B,Tq,H,qd), k (B,Tk,H,qd), qp (B,Tq,H,pd),
        p_rel (Tq,Tk,H,pd) → softmax-ready scores (B,H,Tq,Tk).
        (streaming-step path; training uses `_toeplitz_windows`)"""
        qd, pd = self.query_head_dim, self.pos_head_dim
        scores = jnp.einsum("bthd,bshd->bhts", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores / jnp.sqrt(jnp.float32(qd))
        pos_scores = jnp.einsum("bthd,tshd->bhts", qp, p_rel,
                                preferred_element_type=jnp.float32)
        scores = scores + pos_scores / jnp.sqrt(jnp.float32(pd))
        return jnp.clip(scores, -100.0, 100.0)

    # History of the rel-pos score path (v5e, all measured — the current
    # form is `_toeplitz_windows` + direct einsum in `__call__`):
    # 1. (T,T,H,pd) table GATHER: backward is a scatter-add into the
    #    table — 67 ms encoder backward (5.4× forward). Rejected.
    # 2. Transformer-XL skew (einsum "bthd,rhd->trbh" + pad/reshape/
    #    slice/transpose): skew axes must be MAJOR — skewing
    #    (B,H,T,2T−1) merges the minor dims, crossing the (8,128) tile
    #    layout and relayouting ~190 MB twice per layer (~11 ms/step at
    #    T=495); with (T,2T−1) leading it was the round-2 winner. Its
    #    remaining cost: the (T,2T−1,B,H) intermediate + its relayouts,
    #    forward AND backward. (ops/pallas/flash_attn.py keeps its own
    #    copy of this skew for the fused kernel's backward.)
    # 3. Current: materialize the batch-free (T,T,H,pd) Toeplitz window
    #    tensor instead and contract it directly into (B,H,T,T).

    def project(self, x, pos_emb):
        """Shared projections (q, k, qp, p) — consumed either by the
        materialized-weights path (`__call__`) or by the fused Pallas
        weights kernel (`fused` → ops/pallas/flash_attn.zip_weights)."""
        B, T, D = x.shape
        H, qd, pd = self.num_heads, self.query_head_dim, self.pos_head_dim
        q = self.q_proj(x).reshape(B, T, H, qd)
        k = self.k_proj(x).reshape(B, T, H, qd)
        qp = self.qpos_proj(x).reshape(B, T, H, pd)
        p = self.pos_proj(pos_emb).reshape(-1, H, pd)      # (2T−1, H, pd)
        return q, k, qp, p

    @staticmethod
    def _toeplitz_windows(p_rev, T):
        """(2T−1, H, pd) offset-reversed table → (T, T, H, pd) with
        out[t, s] = p_rev[(s−t)+(T−1)], built gather-free: broadcast the
        table to T identical rows of width 2T, flatten, and re-read with
        row stride 2T+1 — each row lands shifted one slot further
        (i = t'·(2T+1)+s ≡ t'+s mod 2T), giving sliding windows
        V[t', s] = p_rev[t'+s]; the target is V flipped on t' = T−1−t.
        t'+s ≤ 2T−2 always indexes real table rows, never pad."""
        H, pd = p_rev.shape[1], p_rev.shape[2]
        buf = jnp.pad(p_rev, ((0, 1), (0, 0), (0, 0)))        # (2T, H, pd)
        flat = jnp.broadcast_to(buf[None], (T, 2 * T, H, pd))
        flat = flat.reshape(T * 2 * T, H, pd)
        flat = jnp.pad(flat, ((0, T), (0, 0), (0, 0)))
        v = flat[:T * (2 * T + 1)].reshape(T, 2 * T + 1, H, pd)[:, :T]
        return v[::-1]

    def __call__(self, x, pos_emb, attn_mask=None):
        B, T, D = x.shape
        qd, pd = self.query_head_dim, self.pos_head_dim
        q, k, qp, p = self.project(x, pos_emb)
        sd = self.score_dtype
        scores = jnp.einsum("bthd,bshd->bhts", q, k,
                            preferred_element_type=sd)
        scores = scores / jnp.sqrt(sd(qd))
        # pos scores via a batch-free (T,T,H,pd) Toeplitz window tensor:
        # same 4-term dot per element as the old einsum+skew route, but
        # the (T,2T−1,B,H) intermediate and its pad/slice/transpose
        # relayouts (the step's biggest HBM tensors after the content
        # scores) never exist, forward or backward.
        p2 = self._toeplitz_windows(p[::-1], T)
        pos_scores = jnp.einsum("bthd,tshd->bhts", qp, p2,
                                preferred_element_type=sd)
        scores = (scores.astype(jnp.float32)
                  + pos_scores.astype(jnp.float32)
                  / jnp.sqrt(jnp.float32(pd)))
        scores = jnp.clip(scores, -100.0, 100.0)
        if attn_mask is not None:
            scores = jnp.where(attn_mask[:, None, :, :], scores, -1e30)
        from jax.ad_checkpoint import checkpoint_name

        from ..stopgrad_probe import tag
        # checkpoint_name: under the selective remat policy ("dots") the
        # weights are force-saved — recomputing them would redo the whole
        # score pipeline. No-op outside jax.checkpoint.
        return checkpoint_name(
            tag(jax.nn.softmax(scores, axis=-1).astype(self.dtype),
                "attn_weights"), "attn_weights")

    def fused(self, x, pos_emb, attn_mask=None):
        """Fused Pallas weights (ops/pallas/flash_attn.zip_weights): one
        kernel computes scores + Toeplitz rel-pos + clip + mask + softmax
        and writes the (B,H,T,T) weights ONCE — the two score-einsum HBM
        round trips of `__call__` never happen. All consumers reuse the
        result exactly like the materialized path. Scores are computed in
        f32 in-kernel (score_dtype's bf16 rounding doesn't apply — the
        fused path is strictly more precise).

        Batch dispatch: B is static at trace time (one program per
        bucket shape), so when B < flash_min_batch this falls back to
        the materialized path — the kernel's per-invocation overheads
        only win past the measured B≈48 crossover
        (docs/evidence/r4_perf_ab.json)."""
        B, T, D = x.shape
        if B < self.flash_min_batch:
            return self(x, pos_emb, attn_mask)
        q, k, qp, p = self.project(x, pos_emb)
        from jax.ad_checkpoint import checkpoint_name

        from ..ops.pallas.flash_attn import zip_weights
        from ..stopgrad_probe import tag
        return checkpoint_name(
            tag(zip_weights(q, k, qp, p, attn_mask,
                            w_dtype=self.dtype), "attn_weights"),
            "attn_weights")

    def step(self, x_chunk, pos_emb_table, cached_k, valid_cache):
        """Streaming: queries = chunk (C), keys = [cache (L) | chunk].
        cached_k (B, L, H·qd) projected keys; valid_cache scalar count of
        real frames in the cache. Returns (weights (B,H,C,L+C), new_cache).
        pos_emb_table: table for offsets −C+1..L+C−1 (from
        CompactRelPositionalEncoding.table(L+C−1))."""
        B, C, D = x_chunk.shape
        H, qd, pd = self.num_heads, self.query_head_dim, self.pos_head_dim
        L = cached_k.shape[1]
        q = self.q_proj(x_chunk).reshape(B, C, H, qd)
        k_new = self.k_proj(x_chunk)
        k = jnp.concatenate([cached_k, k_new], axis=1).reshape(
            B, L + C, H, qd)
        qp = self.qpos_proj(x_chunk).reshape(B, C, H, pd)
        p = self.pos_proj(pos_emb_table).reshape(-1, H, pd)
        max_off = (p.shape[0] - 1) // 2
        # query abs pos = L + i, key abs pos = s → offset (L+i−s)
        i_idx = jnp.arange(C)[:, None]
        s_idx = jnp.arange(L + C)[None, :]
        rel = jnp.clip((L + i_idx - s_idx) + max_off, 0, p.shape[0] - 1)
        p_rel = p[rel]                                     # (C, L+C, H, pd)
        scores = self._scores(q, k, qp, p_rel)
        # mask out not-yet-filled cache slots (cache fills from the right)
        key_pos = jnp.arange(L + C)
        valid = key_pos >= (L - jnp.minimum(valid_cache, L))
        scores = jnp.where(valid[None, None, None, :], scores, -1e30)
        weights = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
        new_cache = jnp.concatenate([cached_k, k_new], axis=1)[:, -L:]
        return weights, new_cache


class SelfAttention(nn.Module):
    """Value path reusing precomputed attention weights (reference
    zipformer.py:2211-2378)."""
    embed_dim: int
    num_heads: int
    value_head_dim: int
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.v_proj = nn.Dense(self.num_heads * self.value_head_dim,
                               dtype=self.dtype)
        self.out_proj = nn.Dense(self.embed_dim, dtype=self.dtype,
                                 kernel_init=scaled_init(0.05))

    def _attend(self, weights, v, B, Tq):
        H, vd = self.num_heads, self.value_head_dim
        out = jnp.einsum("bhts,bshd->bthd", weights,
                         v.reshape(B, -1, H, vd),
                         preferred_element_type=jnp.float32)
        out = out.reshape(B, Tq, H * vd).astype(self.dtype)
        return self.out_proj(out)

    def __call__(self, x, attn_weights):
        B, T, D = x.shape
        return self._attend(attn_weights, self.v_proj(x), B, T)

    def step(self, x_chunk, weights, cached_v):
        B, C, D = x_chunk.shape
        L = cached_v.shape[1]
        v_new = self.v_proj(x_chunk)
        v = jnp.concatenate([cached_v, v_new], axis=1)
        out = self._attend(weights, v, B, C)
        return out, v[:, -L:] if L else cached_v


class NonlinAttention(nn.Module):
    """Gated single-head attention (reference zipformer.py:2381-2544):
    in_proj → (s, a, b); values = a·tanh(s) attended by the first head's
    weights, then gated post-attention by the third chunk b
    (reference zipformer.py:2455-2478: ``x = x * y``)."""
    embed_dim: int
    hidden: int
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.in_proj = nn.Dense(3 * self.hidden, dtype=self.dtype)
        self.out_proj = nn.Dense(self.embed_dim, dtype=self.dtype,
                                 kernel_init=scaled_init(0.05))

    def __call__(self, x, attn_weights_1head, dyn_step=None):
        """dyn_step: traced global step enabling the reference's internal
        balancer on the sigmoid branch + whiten1/whiten2 placements
        (zipformer.py:2405-2437) with their scheduled limits."""
        h = self.in_proj(x)
        s, a, b = jnp.split(h, 3, axis=-1)
        if dyn_step is not None:
            from ..ops.regularizers import (ScheduledFloat, balancer,
                                            whiten, whitening_schedule)
            s = balancer(
                s,
                min_positive=ScheduledFloat((0.0, 0.25),
                                            (20000.0, 0.05))(dyn_step),
                max_positive=ScheduledFloat((0.0, 0.75),
                                            (20000.0, 0.95))(dyn_step),
                min_abs=0.5, max_abs=5.0,
                prob=ScheduledFloat((0.0, 0.5), (8000.0, 0.125))(dyn_step))
            a = whiten(a, whitening_schedule(5.0)(dyn_step), 0.01, 0.25)
        v = a * jnp.tanh(s)
        out = jnp.einsum("bts,bsd->btd", attn_weights_1head, v,
                         preferred_element_type=jnp.float32)
        out = b * out.astype(self.dtype)
        out = self.out_proj(out)
        if dyn_step is not None:
            from ..ops.regularizers import whiten, whitening_schedule
            out = whiten(out, whitening_schedule(5.0, 3.0)(dyn_step),
                         0.01, 0.25)
        return out

    def step(self, x_chunk, weights_1head, cached_v):
        """weights_1head (B, C, L+C); cached_v (B, L, hidden)."""
        L = cached_v.shape[1]
        h = self.in_proj(x_chunk)
        s, a, b = jnp.split(h, 3, axis=-1)
        v_new = a * jnp.tanh(s)
        v = jnp.concatenate([cached_v, v_new], axis=1)
        out = jnp.einsum("bts,bsd->btd", weights_1head, v,
                         preferred_element_type=jnp.float32)
        out = b * out.astype(self.dtype)
        return self.out_proj(out), v[:, -L:] if L else cached_v


class FeedforwardModule(nn.Module):
    ff_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True, dropout=0.1):
        D = x.shape[-1]
        h = nn.Dense(self.ff_dim, dtype=self.dtype, name="in")(x)
        h = swoosh_l(h)
        h = nn.Dropout(rate=dropout)(h, deterministic=deterministic)
        return nn.Dense(D, dtype=self.dtype, name="out",
                        kernel_init=scaled_init(0.1))(h)


class ConvolutionModule(nn.Module):
    """pointwise-GLU → depthwise (causal left-pad when `causal`) →
    SwooshR → pointwise (reference zipformer.py:2547-2737)."""
    dim: int
    kernel_size: int
    causal: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.in_proj = nn.Dense(2 * self.dim, dtype=self.dtype)
        self.dw = nn.Conv(self.dim, (self.kernel_size,), padding="VALID",
                          feature_group_count=self.dim, dtype=self.dtype)
        self.out_proj = nn.Dense(self.dim, dtype=self.dtype,
                                 kernel_init=scaled_init(0.05))

    def _post(self, h):
        return self.out_proj(swoosh_r(h))

    def __call__(self, x, pad_mask):
        h = nn.glu(self.in_proj(x), axis=-1)
        h = jnp.where(pad_mask[..., None], h, 0.0)
        if self.causal:
            h = jnp.pad(h, ((0, 0), (self.kernel_size - 1, 0), (0, 0)))
        else:
            p = (self.kernel_size - 1) // 2
            h = jnp.pad(h, ((0, 0), (p, self.kernel_size - 1 - p), (0, 0)))
        return self._post(self.dw(h))

    def step(self, x_chunk, cache):
        """cache (B, kernel−1, dim) post-GLU left context (causal only)."""
        h = nn.glu(self.in_proj(x_chunk), axis=-1)
        full = jnp.concatenate([cache, h], axis=1)
        out = self._post(self.dw(full))
        return out, full[:, -(self.kernel_size - 1):]


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
    dynamics: bool = False
    # fused Pallas attention-weights kernel: scores+rel-pos+clip+mask+
    # softmax in one kernel, weights written once (ops/pallas/flash_attn)
    flash: bool = False
    score_dtype: jnp.dtype = jnp.float32
    flash_min_batch: int = 48

    def setup(self):
        D = self.embed_dim
        self.attn_weights = AttentionWeights(
            D, self.num_heads, self.query_head_dim, self.pos_head_dim,
            self.pos_dim, self.dtype, score_dtype=self.score_dtype,
            flash_min_batch=self.flash_min_batch)
        self.ff1 = FeedforwardModule(self.ff_dim * 3 // 4, self.dtype)
        self.nonlin_attn = NonlinAttention(D, D * 3 // 4, self.dtype)
        self.self_attn1 = SelfAttention(D, self.num_heads,
                                        self.value_head_dim, self.dtype)
        self.conv1 = ConvolutionModule(D, self.kernel_size, self.causal,
                                       self.dtype)
        self.ff2 = FeedforwardModule(self.ff_dim, self.dtype)
        self.bypass_mid = BypassModule()
        self.self_attn2 = SelfAttention(D, self.num_heads,
                                        self.value_head_dim, self.dtype)
        self.conv2 = ConvolutionModule(D, self.kernel_size, self.causal,
                                       self.dtype)
        self.ff3 = FeedforwardModule(self.ff_dim * 5 // 4, self.dtype)
        self.norm = BiasNorm(self.dtype)
        self.bypass = BypassModule()

    def __call__(self, x, pos_emb, pad_mask, attn_mask=None,
                 deterministic=True, step=None):
        """`step`: traced global-step scalar driving the icefall training
        dynamics when `dynamics` is on and training: ScheduledFloat
        skip-rate schedules for attention/conv/ff modules + const-attention
        + bypass scale_min/skip (reference zipformer.py:937-950,
        1139-1221, 1499-1555) and per-module Balancer/Whiten placements
        with the reference's limits (zipformer.py:1015-1072)."""
        from ..ops.regularizers import (ScheduledFloat, balancer, whiten,
                                        whitening_schedule)
        B = x.shape[0]
        dyn = self.dynamics and not deterministic
        if dyn:
            s = (step if step is not None
                 else jnp.asarray(10 ** 9, jnp.float32))
            attn_skip = ScheduledFloat((0.0, 0.2), (4000.0, 0.05),
                                       (16000.0, 0.0))(s)
            conv_skip = attn_skip  # same schedule (zipformer.py:937-941)
            const_attn = ScheduledFloat((0.0, 0.25), (4000.0, 0.025))(s)
            ff2_skip = ScheduledFloat((0.0, 0.1), (4000.0, 0.01),
                                      (50000.0, 0.0))(s)
            ff3_skip = ff2_skip
            bypass_skip = ScheduledFloat((0.0, 0.5), (4000.0, 0.02))(s)
            bypass_min = ScheduledFloat((0.0, 0.9), (20000.0, 0.2))(s)
            bal_prob = ScheduledFloat((0.0, 0.5), (8000.0, 0.125))(s)
            keys = jax.random.split(self.make_rng("dropout"), 7)

            def seq_keep(key, rate):
                # per-sequence module skipping, no 1/(1-p) rescale
                # (reference sequence_dropout, zipformer.py:1074-1092)
                return (jax.random.uniform(key, (B, 1, 1))
                        >= rate).astype(x.dtype)

            m_attn = seq_keep(keys[0], attn_skip)
            m_conv1 = seq_keep(keys[1], conv_skip)
            m_conv2 = seq_keep(keys[2], conv_skip)
            m_ff2 = seq_keep(keys[3], ff2_skip)
            m_ff3 = seq_keep(keys[4], ff3_skip)
            m_bypass = seq_keep(keys[5], bypass_skip)
            use_const = jax.random.bernoulli(keys[6], const_attn)

        # `flash` switches only how the weights are COMPUTED (fused Pallas
        # kernel vs materialized einsums); every consumer below is shared.
        attn_w = (self.attn_weights.fused(x, pos_emb, attn_mask)
                  if self.flash
                  else self.attn_weights(x, pos_emb, attn_mask))
        na_w = attn_w[:, 0]
        if dyn:
            # const-attention: averaging-over-allowed-positions weights
            # (reference zipformer.py:1143-1155)
            wc = (na_w > 0).astype(na_w.dtype)
            wc = wc / jnp.maximum(wc.sum(-1, keepdims=True), 1e-9)
            na_w = jnp.where(use_const, wc, na_w)
        from ..stopgrad_probe import tag
        src = x
        x = x + tag(self.ff1(x, deterministic, self.dropout), "ff")
        na = self.nonlin_attn(x, na_w, dyn_step=(s if dyn else None))
        na = tag(na, "nonlin")
        if dyn:
            na = balancer(na, 0.3, 0.7,
                          min_abs=ScheduledFloat((0.0, 0.004),
                                                 (4000.0, 0.02))(s),
                          prob=0.05)
            x = x + na * m_attn
        else:
            x = x + na
        sa1 = tag(self.self_attn1(x, attn_w), "selfattn")
        x = x + (sa1 * m_attn if dyn else sa1)
        c1 = tag(self.conv1(x, pad_mask), "conv")
        x = x + (c1 * m_conv1 if dyn else c1)
        f2 = tag(self.ff2(x, deterministic, self.dropout), "ff")
        if dyn:
            f2 = balancer(f2, 0.3, 0.7,
                          min_abs=ScheduledFloat((0.0, 0.0),
                                                 (4000.0, 0.1))(s),
                          max_abs=2.0, prob=0.05)
            x = x + f2 * m_ff2
        else:
            x = x + f2
        x = (self.bypass_mid(src, x, scale_min=bypass_min) if dyn
             else self.bypass_mid(src, x))
        sa2 = tag(self.self_attn2(x, attn_w), "selfattn")
        x = x + (sa2 * m_attn if dyn else sa2)
        c2 = tag(self.conv2(x, pad_mask), "conv")
        x = x + (c2 * m_conv2 if dyn else c2)
        f3 = tag(self.ff3(x, deterministic, self.dropout), "ff")
        if dyn:
            f3 = balancer(f3, 0.3, 0.7,
                          min_abs=ScheduledFloat((0.0, 0.0),
                                                 (4000.0, 0.2))(s),
                          max_abs=4.0, prob=0.05)
            x = x + f3 * m_ff3
        else:
            x = x + f3
        if dyn:
            x = balancer(x, 0.45, 0.55, min_abs=0.2, max_abs=4.0,
                         prob=bal_prob)
        x = self.norm(x)
        if dyn:
            x = self.bypass(src, x, scale_min=bypass_min,
                            skip_mask=m_bypass)
            x = balancer(x, 0.45, 0.55, min_abs=0.1, max_abs=4.0,
                         prob=bal_prob)
            x = whiten(x, whitening_schedule(4.0, 3.0)(s), 0.01, 0.25)
        else:
            x = self.bypass(src, x)
        return x

    # ------------------------------------------------------------ streaming
    def init_cache(self, batch_size: int, left: int) -> Dict[str, Any]:
        D = self.embed_dim
        H = self.num_heads
        dt = self.dtype
        k = self.kernel_size
        return {
            "key": jnp.zeros((batch_size, left, H * self.query_head_dim),
                             dt),
            "nonlin": jnp.zeros((batch_size, left, D * 3 // 4), dt),
            "val1": jnp.zeros((batch_size, left,
                               H * self.value_head_dim), dt),
            "val2": jnp.zeros((batch_size, left,
                               H * self.value_head_dim), dt),
            "conv1": jnp.zeros((batch_size, k - 1, D), dt),
            "conv2": jnp.zeros((batch_size, k - 1, D), dt),
        }

    def streaming_step(self, x, pos_table, cache, valid_cache):
        """x (B, C, D) chunk; cache = the six per-layer tensors;
        valid_cache: scalar count of real cached frames. Returns
        (out, new_cache). Matches __call__ with a left-context window."""
        attn_w, new_key = self.attn_weights.step(x, pos_table,
                                                 cache["key"], valid_cache)
        src = x
        x = x + self.ff1(x, True)
        out, new_nonlin = self.nonlin_attn.step(x, attn_w[:, 0],
                                                cache["nonlin"])
        x = x + out
        out, new_v1 = self.self_attn1.step(x, attn_w, cache["val1"])
        x = x + out
        out, new_c1 = self.conv1.step(x, cache["conv1"])
        x = x + out
        x = x + self.ff2(x, True)
        x = self.bypass_mid(src, x)
        out, new_v2 = self.self_attn2.step(x, attn_w, cache["val2"])
        x = x + out
        out, new_c2 = self.conv2.step(x, cache["conv2"])
        x = x + out
        x = x + self.ff3(x, True)
        x = self.norm(x)
        x = self.bypass(src, x)
        new_cache = {"key": new_key, "nonlin": new_nonlin, "val1": new_v1,
                     "val2": new_v2, "conv1": new_c1, "conv2": new_c2}
        return x, new_cache


class _ScanLayer(Zipformer2EncoderLayer):
    """Zipformer2EncoderLayer with an (carry, y) return for `nn.scan`."""

    def __call__(self, x, pos_emb, pad_mask, attn_mask=None,
                 deterministic=True, step=None):
        y = Zipformer2EncoderLayer.__call__(self, x, pos_emb, pad_mask,
                                            attn_mask, deterministic, step)
        # f32 bypass/norm scales upcast the residual stream; cast back so
        # the scan carry dtype is stable (keeps the stack in bf16, which
        # the unrolled form silently lost after layer 0)
        return y.astype(x.dtype), None


class Zipformer2Stack(nn.Module):
    """One resolution stack: downsample → layers → upsample → bypass.

    `scan_layers=True` compiles the (identical) layers of this stack as ONE
    `nn.scan` loop body instead of unrolling them — the idiomatic JAX way
    to keep executable size and compile time independent of depth. Math is
    identical to the unrolled form (`tests/test_zipformer.py` asserts it);
    only the parameter layout changes: `layers/...: (L, ...)` stacked
    leaves instead of `layer{i}/...` subtrees. Convert checkpoints between
    the layouts with `stack_layer_params` / `unstack_layer_params`.
    Streaming decode uses the unrolled layout (convert first).
    """
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
    # "full": classic remat (save only layer inputs, recompute everything).
    # "dots": selective — save every matmul/einsum output plus the named
    # attention weights; recompute only cheap elementwise chains (GLU,
    # Swoosh, norms, masks) and the depthwise conv in the backward pass.
    # Targets the B>128 activation-spill cliff (docs/evidence/
    # r4_perf_ab.json batch sweep) without full-remat's recompute cost.
    remat_policy: str = "full"
    dynamics: bool = False
    scan_layers: bool = False
    flash: bool = False
    score_dtype: jnp.dtype = jnp.float32
    flash_min_batch: int = 48
    pos_variant: str = "fourier"
    # Reference semantics for the stack output bypass (zipformer.py:438-441
    # + 1600-1650): src_orig is convert_num_channels(x) — the bypass scale
    # applies over the FULL stack width, including channels zero-padded up
    # from a narrower previous stack. This repo's default instead bypasses
    # only the common channels and passes the new ones through unscaled.
    # The parity oracle enables this to match the reference bit-for-bit.
    full_dim_bypass: bool = False

    def _remat_kwargs(self):
        kw = {"static_argnums": (5,)}
        if self.remat_policy not in ("full", "dots"):
            raise ValueError(
                f"remat_policy must be 'full' or 'dots', got "
                f"{self.remat_policy!r}")
        if self.remat_policy == "dots":
            # NOTE: designed for the fused (use_flash_attn) path, where
            # the only (B,H,T,T) residual is the named weights (the
            # pallas_call is not a dot, so dots_saveable skips it). On
            # the materialized path dots_saveable ALSO saves the two raw
            # score einsum outputs — three T² buffers/layer, defeating
            # the spill-reduction goal; prefer "full" there.
            cp = jax.checkpoint_policies
            kw["policy"] = cp.save_from_both_policies(
                cp.dots_saveable,
                cp.save_only_these_names("attn_weights"))
        return kw

    def setup(self):
        layer_args = (self.embed_dim, self.ff_dim, self.num_heads,
                      self.query_head_dim, self.value_head_dim,
                      self.pos_head_dim, self.pos_dim, self.kernel_size,
                      self.causal, self.dropout, self.dtype, self.dynamics,
                      self.flash, self.score_dtype, self.flash_min_batch)
        if self.scan_layers and self.num_layers > 1:
            body = _ScanLayer
            if self.remat:
                body = nn.remat(body, **self._remat_kwargs())
            self.layers_scan = nn.scan(
                body,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=nn.broadcast,
                length=self.num_layers)(*layer_args, name="layers")
            self.layers = ()
        else:
            layer_cls = Zipformer2EncoderLayer
            if self.remat:
                layer_cls = nn.remat(Zipformer2EncoderLayer,
                                     **self._remat_kwargs())
            self.layers = [
                layer_cls(*layer_args, name=f"layer{i}")
                for i in range(self.num_layers)
            ]
        self.down = SimpleDownsample(self.downsample, name="downsample")
        self.up = SimpleUpsample(self.downsample)
        self.penc = CompactRelPositionalEncoding(self.pos_dim,
                                                 self.pos_variant)
        self.stack_bypass = BypassModule(name="stack_bypass")

    def __call__(self, x, lengths, attn_mask_fn, deterministic=True,
                 step=None):
        B, T, D_in = x.shape
        x_orig = x
        x = convert_num_channels(x, self.embed_dim)
        x = self.down(x)
        ds_len = -(-lengths // self.downsample)
        Td = x.shape[1]
        pad_mask = make_non_pad_mask(ds_len, Td)
        attn_mask = attn_mask_fn(Td, self.downsample, pad_mask)
        pos_emb = self.penc(Td)
        if self.scan_layers and self.num_layers > 1:
            x, _ = self.layers_scan(x, pos_emb, pad_mask, attn_mask,
                                    deterministic, step)
        else:
            for layer in self.layers:
                x = layer(x, pos_emb, pad_mask, attn_mask, deterministic,
                          step)
        x = self.up(x, T)
        x = jnp.where(make_non_pad_mask(lengths, T)[..., None], x, 0.0)
        if self.dynamics and not deterministic:
            from ..ops.regularizers import ScheduledFloat
            s = (step if step is not None
                 else jnp.asarray(10 ** 9, jnp.float32))
            smin = ScheduledFloat((0.0, 0.9), (20000.0, 0.2))(s)
        else:
            smin = None
        if self.full_dim_bypass:
            return self.stack_bypass(
                convert_num_channels(x_orig, self.embed_dim), x,
                scale_min=smin)
        d_common = min(D_in, self.embed_dim)
        out = self.stack_bypass(x_orig[..., :d_common],
                                x[..., :d_common], scale_min=smin)
        if self.embed_dim > d_common:
            out = jnp.concatenate([out, x[..., d_common:]], axis=-1)
        return out

    # ------------------------------------------------------------ streaming
    def init_cache(self, batch_size: int, chunk: int, left_chunks: int):
        """Pure function of constructor fields (callable outside apply)."""
        c = max(chunk // self.downsample, 1)
        left = left_chunks * c
        D, H, k, dt = (self.embed_dim, self.num_heads, self.kernel_size,
                       self.dtype)

        def one():
            return {
                "key": jnp.zeros((batch_size, left,
                                  H * self.query_head_dim), dt),
                "nonlin": jnp.zeros((batch_size, left, D * 3 // 4), dt),
                "val1": jnp.zeros((batch_size, left,
                                   H * self.value_head_dim), dt),
                "val2": jnp.zeros((batch_size, left,
                                   H * self.value_head_dim), dt),
                "conv1": jnp.zeros((batch_size, k - 1, D), dt),
                "conv2": jnp.zeros((batch_size, k - 1, D), dt),
            }

        return [one() for _ in range(self.num_layers)]

    def streaming_step(self, x, caches, valid_cache):
        """x (B, chunk, D_in) at the base rate; valid_cache: scalar count
        of cached frames at THIS stack's rate."""
        B, T, D_in = x.shape
        x_orig = x
        x = convert_num_channels(x, self.embed_dim)
        x = self.down(x)
        C = x.shape[1]
        L = caches[0]["key"].shape[1]
        pos_table = self.penc.table(L + C - 1)
        new_caches = []
        for layer, cache in zip(self.layers, caches):
            x, nc = layer.streaming_step(x, pos_table, cache, valid_cache)
            new_caches.append(nc)
        x = self.up(x, T)
        d_common = min(D_in, self.embed_dim)
        out = self.stack_bypass(x_orig[..., :d_common], x[..., :d_common])
        if self.embed_dim > d_common:
            out = jnp.concatenate([out, x[..., d_common:]], axis=-1)
        return out, new_caches


# -------------------------------------------------- scan-layout conversion
def stack_layer_params(params):
    """Convert a zipformer param tree from the unrolled `layer{i}` layout
    to the `scan_layers=True` layout (`layers` with leading L axis).
    Works on any subtree; returns a new tree."""
    if not isinstance(params, dict):
        return params
    out = {}
    layer_keys = sorted(k for k in params if k.startswith("layer")
                        and k[5:].isdigit())
    for k, v in params.items():
        if k in layer_keys:
            continue
        out[k] = stack_layer_params(v)
    if layer_keys:
        subtrees = [params[f"layer{i}"] for i in range(len(layer_keys))]
        out["layers"] = jax.tree_util.tree_map(
            lambda *leaves: jnp.stack(leaves, axis=0), *subtrees)
    return out


def unstack_layer_params(params):
    """Inverse of `stack_layer_params`: `layers` (L, ...) → `layer{i}`.
    Needed before streaming decode, which runs the unrolled layout."""
    if not isinstance(params, dict):
        return params
    out = {}
    for k, v in params.items():
        if k == "layers":
            n = jax.tree_util.tree_leaves(v)[0].shape[0]
            for i in range(n):
                out[f"layer{i}"] = jax.tree_util.tree_map(
                    lambda leaf: leaf[i], v)
        else:
            out[k] = unstack_layer_params(v)
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
    for_ctc: bool = False
    ctc_out_dim: int = -1
    dtype: str = "float32"
    remat: bool = False
    # remat flavor when `remat` is on: "full" (save layer inputs only) or
    # "dots" (save matmul outputs + attention weights, recompute cheap
    # elementwise/depthwise-conv chains) — see Zipformer2Stack.remat_policy
    remat_policy: str = "full"
    # icefall training dynamics: skip-rate/bypass schedules + per-module
    # Balancer/Whiten placements (reference zipformer.py:937-950,1015-1072)
    dynamics: bool = False
    # compile each stack's layers as one nn.scan loop (smaller executable,
    # faster compile; same math — see Zipformer2Stack docstring)
    scan_layers: bool = False
    # fused Pallas attention-weights kernel for training/offline forward
    # (SURVEY §7's chunk-masked flash attention, round-4 weights-producer
    # redesign — see ops/pallas/flash_attn.py): scores never hit HBM;
    # streaming .step keeps the materialized path — its windows are small.
    # Same math (f32 in-kernel scores), tolerance-tested.
    use_flash_attn: bool = False
    # static-batch crossover for the fused kernel: programs traced with
    # B < this use the materialized path even when use_flash_attn is on
    # (the kernel loses below B≈48 — docs/evidence/r4_perf_ab.json), so
    # small-batch recipes can't silently regress. 0 forces the kernel.
    flash_min_batch: int = 48
    # "bfloat16" halves HBM traffic of the two big attention-score
    # tensors (einsum outputs) while keeping clip/mask/softmax in f32 —
    # see AttentionWeights.score_dtype. f32 default = bit-exact legacy.
    score_dtype: str = "float32"
    # relative-position embedding basis — "fourier" (this repo's default)
    # or "icefall" (bit-parity with the reference formula; used together
    # with full_dim_bypass by the reference-weight parity oracle,
    # tests/test_zipformer_ref_oracle.py)
    pos_variant: str = "fourier"
    # reference semantics for the stack output bypass (see
    # Zipformer2Stack.full_dim_bypass)
    full_dim_bypass: bool = False

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

    def setup(self):
        cfg = self.config
        dt = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
        self.embed = Conv2dSubsampling(cfg.encoder_dim[0], dtype=dt,
                                       causal=cfg.causal, name="embed")
        self.stacks = [
            Zipformer2Stack(
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
                remat_policy=cfg.remat_policy,
                dynamics=cfg.dynamics,
                scan_layers=cfg.scan_layers,
                flash=cfg.use_flash_attn,
                score_dtype=(jnp.bfloat16 if cfg.score_dtype == "bfloat16"
                             else jnp.float32),
                flash_min_batch=cfg.flash_min_batch,
                pos_variant=cfg.pos_variant,
                full_dim_bypass=cfg.full_dim_bypass,
                name=f"stack{i}")
            for i in range(len(cfg.encoder_dim))
        ]
        self.out_down = SimpleDownsample(cfg.output_downsampling_factor,
                                         name="out_downsample")

    def _recombine(self, outputs):
        """full-dim recombination (zipformer.py:450-463): each channel
        range comes from the LAST stack wide enough to produce it."""
        dims = list(self.config.encoder_dim)
        full_dim = max(dims)
        pieces = []
        cur = 0
        while cur < full_dim:
            j = [i for i, d in enumerate(dims) if d > cur][-1]
            pieces.append(outputs[j][..., cur:dims[j]])
            cur = dims[j]
        return jnp.concatenate(pieces, axis=-1)

    def __call__(self, feats, lengths, deterministic: bool = True,
                 chunk_size: Optional[jnp.ndarray] = None,
                 left_context_chunks: Optional[jnp.ndarray] = None,
                 step: Optional[jnp.ndarray] = None):
        x, lens = self.embed(feats, lengths)
        from ..stopgrad_probe import tag
        x = tag(x, "frontend")
        return self.encode_embedded(x, lens, deterministic, chunk_size,
                                    left_context_chunks, step)

    def encode_embedded(self, x, lens, deterministic: bool = True,
                        chunk_size: Optional[jnp.ndarray] = None,
                        left_context_chunks: Optional[jnp.ndarray] = None,
                        step: Optional[jnp.ndarray] = None):
        """Encoder stacks on post-subsampling features (B, T, dim0) —
        `__call__` minus the embed. Public so the reference-weight parity
        oracle (tests/test_zipformer_ref_oracle.py) can drive the exact
        stack chain the reference drives after its `_encoder_embed`."""
        cfg = self.config
        B, T, _ = x.shape

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
            from ..ops.masking import chunk_causal_mask
            if not cfg.causal:
                return pad_mask[:, None, :] & pad_mask[:, :, None]
            cs = jnp.where(chunk_size > 0,
                           jnp.maximum(chunk_size // ds_factor, 1), -1)
            cm = chunk_causal_mask(Td, cs, left_context_chunks)
            return (pad_mask[:, None, :] & pad_mask[:, :, None]
                    & cm[None, :, :])

        outputs = []
        for i, stack in enumerate(self.stacks):
            x = stack(x, lens, attn_mask_fn, deterministic, step)
            if keep is not None:
                um = cfg.encoder_unmasked_dim[i]
                d_idx = jnp.arange(x.shape[-1])
                mask = jnp.where(d_idx[None, None, :] < um, 1.0,
                                 keep.astype(x.dtype))
                x = x * mask
            outputs.append(x)

        out = self._recombine(outputs)
        f = cfg.output_downsampling_factor
        out = self.out_down(out)
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

    # -------------------------------------------------------- true streaming
    PRIME_EXTRA_RAW = Conv2dSubsampling.RAW_TAIL  # extra raw frames, chunk 0

    def init_streaming_state(self, batch_size: int, chunk_size: int = 32,
                             left_context_chunks: int = 4) -> Dict[str, Any]:
        """Streaming state (reference zipformer.py:575-599): six caches per
        layer + frontend caches + processed-chunk counter. chunk_size is in
        post-frontend frames and must be divisible by every downsampling
        factor.

        The first chunk must go through `streaming_prime` with
        `2·chunk_size + PRIME_EXTRA_RAW` raw frames; every later chunk
        through `streaming_step` with `2·chunk_size` raw frames. The
        emitted frames then reproduce the chunk-masked full forward
        EXACTLY from frame 0 (causal ConvNeXt — see Conv2dSubsampling)."""
        cfg = self.config
        assert cfg.causal, "true streaming requires a causal config"
        for f in cfg.downsampling_factor:
            assert chunk_size % f == 0, \
                f"chunk_size {chunk_size} not divisible by ds factor {f}"
        assert chunk_size % cfg.output_downsampling_factor == 0
        assert 2 * chunk_size >= Conv2dSubsampling.RAW_TAIL
        dt = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
        B = batch_size
        stack_caches = []
        for i in range(len(cfg.encoder_dim)):
            c = max(chunk_size // cfg.downsampling_factor[i], 1)
            left = left_context_chunks * c
            D = cfg.encoder_dim[i]
            H = cfg.num_heads[i]
            k = cfg.cnn_module_kernel[i]
            stack_caches.append([
                {"key": jnp.zeros((B, left, H * cfg.query_head_dim), dt),
                 "nonlin": jnp.zeros((B, left, D * 3 // 4), dt),
                 "val1": jnp.zeros((B, left, H * cfg.value_head_dim), dt),
                 "val2": jnp.zeros((B, left, H * cfg.value_head_dim), dt),
                 "conv1": jnp.zeros((B, k - 1, D), dt),
                 "conv2": jnp.zeros((B, k - 1, D), dt)}
                for _ in range(cfg.num_encoder_layers[i])
            ])
        F2 = Conv2dSubsampling.freq_dim(cfg.feature_dim)
        return {
            "embed": {
                "raw_tail": jnp.zeros(
                    (B, Conv2dSubsampling.RAW_TAIL, cfg.feature_dim),
                    jnp.float32),
                "sub": jnp.zeros((B, ConvNeXtBlock.CONTEXT, F2,
                                  Conv2dSubsampling.MID_CHANNELS), dt),
            },
            "stacks": stack_caches,
            "processed": jnp.zeros((), jnp.int32),
            "chunk_size": chunk_size,
        }

    def _stream_tail(self, x, state):
        """Shared post-frontend streaming path: stacks + output
        downsample."""
        cfg = self.config
        chunk = state["chunk_size"]
        processed = state["processed"]
        new_stack_caches = []
        for i, stack in enumerate(self.stacks):
            c_i = max(chunk // cfg.downsampling_factor[i], 1)
            valid = processed * c_i
            x, nc = stack.streaming_step(x, state["stacks"][i], valid)
            new_stack_caches.append(nc)
        out = self.out_down(x)
        return out.astype(jnp.float32), new_stack_caches

    def streaming_prime(self, feats_chunk, state):
        """First chunk: (B, 2·chunk_size + PRIME_EXTRA_RAW, F) raw fbank
        frames → (B, chunk // output_downsampling_factor, full_dim). The
        extra raw frames fill the stride-2 conv stack's receptive field so
        the sub-frame stream starts exactly at s₀."""
        cfg = self.config
        assert cfg.encoder_dim[-1] == max(cfg.encoder_dim), \
            "streaming requires the last stack to be the widest"
        chunk = state["chunk_size"]
        assert feats_chunk.shape[1] == 2 * chunk + self.PRIME_EXTRA_RAW
        x, embed_cache = self.embed.stream_prime(feats_chunk,
                                                 state["embed"])
        out, stack_caches = self._stream_tail(x, state)
        return out, {"embed": embed_cache, "stacks": stack_caches,
                     "processed": state["processed"] + 1,
                     "chunk_size": chunk}

    def streaming_step(self, feats_chunk, state):
        """Steady state: feats_chunk (B, 2·chunk_size, F) — the frontend
        halves the rate, so the sub-rate stream advances by exactly
        `chunk` frames per step (no drift). Returns
        (out (B, chunk // output_downsampling_factor, full_dim), state)."""
        cfg = self.config
        assert cfg.encoder_dim[-1] == max(cfg.encoder_dim), \
            "streaming requires the last stack to be the widest"
        chunk = state["chunk_size"]
        assert feats_chunk.shape[1] == 2 * chunk, \
            f"need {2*chunk} raw frames/step, got {feats_chunk.shape[1]}"
        x, embed_cache = self.embed.stream_step(feats_chunk, state["embed"])
        out, stack_caches = self._stream_tail(x, state)
        return out, {"embed": embed_cache, "stacks": stack_caches,
                     "processed": state["processed"] + 1,
                     "chunk_size": chunk}

"""Emformer-style streaming transformer encoder.

Capability parity with reference model/encoder/emformer.py:42-167 (which
wraps torchaudio.models.Emformer): segment-based processing with left
context, right-context lookahead, a bounded **memory bank** of past-segment
summaries (`max_memory_size`, reference emformer.py:36,70 — the shipped
reference config uses 0, but the capability exists), `init_state`/
`streaming_step` chunked inference, and a `streaming_forward` that
reproduces streaming outputs on full utterances.

TPU design: training runs the full utterance under a segment-structured
attention mask (each frame attends to its own segment ± configured
left/right context, plus the mean-pooled summaries of up to
`max_memory_size` preceding segments) — one fixed-shape masked attention
per layer, no per-segment Python loop (the reference loops chunks per
batch entry, :130-167). Streaming inference carries, per layer, the last
`left_context_length` activations and a rolling memory bank; a shared
step counter masks not-yet-filled cache/bank slots so early segments see
exactly what the training mask allows.
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax

from ..ops.masking import make_non_pad_mask
from .conformer import ConvSubsampling, FeedForward, MaskedMHSA


@dataclasses.dataclass
class EmformerConfig:
    feats_dim: int = 80
    subsampling_rate: int = 4
    input_dim: int = 256
    num_heads: int = 8
    ffn_dim: int = 1024
    num_layers: int = 12
    segment_length: int = 16        # frames at the subsampled rate
    left_context_length: int = 32
    right_context_length: int = 4
    max_memory_size: int = 0        # past-segment summaries in K/V (0 = off)
    output_dim: int = 256
    dropout: float = 0.1
    dtype: str = "float32"


def emformer_attention_mask(T: int, segment: int, left: int,
                            right: int) -> jnp.ndarray:
    """(T, T) bool: query i may attend key j iff j lies within
    [seg_start(i) − left, seg_end(i) + right]."""
    i = lax.broadcasted_iota(jnp.int32, (T, T), 0)
    j = lax.broadcasted_iota(jnp.int32, (T, T), 1)
    seg_start = (i // segment) * segment
    seg_end = seg_start + segment - 1
    return (j >= seg_start - left) & (j <= seg_end + right)


def emformer_memory_mask(T: int, segment: int,
                         max_memory: int) -> jnp.ndarray:
    """(T, S) bool over segment-summary slots: query i sees summary of
    segment s iff seg(i) − max_memory ≤ s ≤ seg(i) − 1."""
    S = -(-T // segment)
    i = lax.broadcasted_iota(jnp.int32, (T, S), 0)
    s = lax.broadcasted_iota(jnp.int32, (T, S), 1)
    seg = i // segment
    return (s >= seg - max_memory) & (s <= seg - 1)


def segment_summaries(h: jnp.ndarray, pad_mask: jnp.ndarray,
                      segment: int) -> jnp.ndarray:
    """(B, T, D) → (B, S, D) masked mean over each segment's valid frames."""
    B, T, D = h.shape
    S = -(-T // segment)
    pad_t = S * segment - T
    hp = jnp.pad(h, ((0, 0), (0, pad_t), (0, 0)))
    mp = jnp.pad(pad_mask.astype(h.dtype), ((0, 0), (0, pad_t)))
    hp = hp.reshape(B, S, segment, D) * mp.reshape(B, S, segment, 1)
    n = jnp.maximum(mp.reshape(B, S, segment).sum(-1, keepdims=True), 1.0)
    return hp.sum(axis=2) / n


class EmformerLayer(nn.Module):
    dim: int
    num_heads: int
    ffn_dim: int
    dropout: float
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.ln_attn = nn.LayerNorm(dtype=self.dtype)
        self.qkv = nn.Dense(3 * self.dim, dtype=self.dtype)
        self.attn_out = nn.Dense(self.dim, dtype=self.dtype)
        self.ln_ffn = nn.LayerNorm(dtype=self.dtype)
        self.ffn = FeedForward(self.ffn_dim, self.dropout, self.dtype)

    def _attend(self, x_q, x_kv, mask, deterministic):
        B, Tq, D = x_q.shape
        Tk = x_kv.shape[1]
        H = self.num_heads
        hd = D // H
        q = jnp.split(self.qkv(self.ln_attn(x_q)), 3, axis=-1)[0]
        _, k, v = jnp.split(self.qkv(self.ln_attn(x_kv)), 3, axis=-1)
        q = q.reshape(B, Tq, H, hd).transpose(0, 2, 1, 3)
        k = k.reshape(B, Tk, H, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, Tk, H, hd).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores / jnp.sqrt(jnp.float32(hd))
        if mask is not None:
            scores = jnp.where(mask, scores, -1e30)
        attn = nn.softmax(scores, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v,
                         preferred_element_type=jnp.float32)
        out = out.transpose(0, 2, 1, 3).reshape(B, Tq, D).astype(self.dtype)
        x = x_q + self.attn_out(out)
        return x + self.ffn(self.ln_ffn(x), deterministic)

    def __call__(self, x, attn_mask, pad_mask, deterministic=True,
                 memory=None, mem_mask=None):
        mask = attn_mask[None, None] & pad_mask[:, None, None, :]
        if memory is None:
            return self._attend(x, x, mask, deterministic)
        kv = jnp.concatenate([memory, x], axis=1)
        full = jnp.concatenate(
            [jnp.broadcast_to(mem_mask[None, None],
                              (x.shape[0], 1) + mem_mask.shape), mask],
            axis=-1)
        return self._attend(x, kv, full, deterministic)

    def step(self, x_chunk, cache, deterministic=True, cache_mask=None,
             bank=None, bank_mask=None):
        """x_chunk (B, C, D) current chunk; cache (B, L, D) previous
        activations (same layer input stream); optional rolling memory
        bank (B, M, D). Masks flag the not-yet-filled slots invalid so a
        fresh stream reproduces the training mask exactly."""
        B, C, D = x_chunk.shape
        L = cache.shape[1]
        parts, mparts = [cache, x_chunk], []
        ones_c = jnp.ones((B, 1, C, C), bool)
        if cache_mask is None:
            mparts.append(jnp.ones((B, 1, C, L), bool))
        else:
            mparts.append(jnp.broadcast_to(
                cache_mask[:, None, None, :], (B, 1, C, L)))
        mparts.append(ones_c)
        if bank is not None:
            parts.insert(0, bank)
            M = bank.shape[1]
            mparts.insert(0, jnp.broadcast_to(
                bank_mask[:, None, None, :], (B, 1, C, M)))
        ctx = jnp.concatenate(parts, axis=1)
        mask = jnp.concatenate(mparts, axis=-1)
        out = self._attend(x_chunk, ctx, mask, deterministic)
        new_cache = jnp.concatenate([cache, x_chunk], axis=1)[:, -L:]
        return out, new_cache


class Emformer(nn.Module):
    config: EmformerConfig

    def setup(self):
        cfg = self.config
        dt = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
        self._dt = dt
        self.subsample = ConvSubsampling(cfg.subsampling_rate,
                                         cfg.input_dim, dt)
        self.layers = [
            EmformerLayer(cfg.input_dim, cfg.num_heads, cfg.ffn_dim,
                          cfg.dropout, dt, name=f"layer{i}")
            for i in range(cfg.num_layers)
        ]
        self.out = nn.Dense(cfg.output_dim, dtype=dt)

    def __call__(self, feats, lengths, deterministic: bool = True):
        cfg = self.config
        h, out_lens = self.subsample(feats, lengths)
        T = h.shape[1]
        amask = emformer_attention_mask(T, cfg.segment_length,
                                        cfg.left_context_length,
                                        cfg.right_context_length)
        pad_mask = make_non_pad_mask(out_lens, T)
        mmask = (emformer_memory_mask(T, cfg.segment_length,
                                      cfg.max_memory_size)
                 if cfg.max_memory_size > 0 else None)
        for layer in self.layers:
            if mmask is not None:
                mem = segment_summaries(h, pad_mask, cfg.segment_length)
                h = layer(h, amask, pad_mask, deterministic,
                          memory=mem, mem_mask=mmask)
            else:
                h = layer(h, amask, pad_mask, deterministic)
        out = self.out(h)
        out = jnp.where(pad_mask[..., None], out, 0.0)
        return out.astype(jnp.float32), out_lens

    # ------------------------------------------------------------ streaming
    def init_state(self, batch_size: int) -> List[jnp.ndarray]:
        """Flat state list: num_layers activation caches, then (if
        max_memory_size > 0) num_layers memory banks, then a step
        counter that masks not-yet-filled slots."""
        cfg = self.config
        dt = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
        state = [jnp.zeros((batch_size, cfg.left_context_length,
                            cfg.input_dim), dt)
                 for _ in range(cfg.num_layers)]
        if cfg.max_memory_size > 0:
            state += [jnp.zeros((batch_size, cfg.max_memory_size,
                                 cfg.input_dim), dt)
                      for _ in range(cfg.num_layers)]
        state.append(jnp.zeros((batch_size,), jnp.int32))
        return state

    def streaming_step(self, chunk_feats, states,
                       deterministic: bool = True):
        """chunk_feats (B, T_chunk, F) raw fbank covering one segment (+
        lookahead); returns (out (B, C, output_dim), new_states).

        Matches the reference's chunked `streaming_step` surface
        (emformer.py:93-121); per-layer caches hold the last
        left_context_length activations, and with max_memory_size > 0 a
        rolling bank of past-segment summaries joins the K/V set
        (reference capability via torchaudio Emformer max_memory_size,
        emformer.py:36,70)."""
        cfg = self.config
        use_mem = cfg.max_memory_size > 0
        n = cfg.num_layers
        count = states[-1]
        h, _ = self.subsample(chunk_feats,
                              jnp.full((chunk_feats.shape[0],),
                                       chunk_feats.shape[1],
                                       jnp.int32))
        B, C, _ = h.shape
        if use_mem and C != cfg.segment_length:
            # The memory bank emits ONE summary per segment during training;
            # a chunk spanning k>1 segments would get a single mean over all
            # k (and `count * C` cache arithmetic assumes constant C),
            # silently diverging from the training-time mask.  Require
            # exact segment-sized chunks when the bank is on (reference
            # torchaudio Emformer has the same contract).
            raise ValueError(
                f"streaming_step chunk is {C} post-subsample frames but "
                f"max_memory_size>0 requires exactly segment_length="
                f"{cfg.segment_length} frames per step")
        L = cfg.left_context_length
        # validity of cached frames / bank slots given `count` prior steps
        n_cached = jnp.minimum(count * C, L)                    # (B,)
        cache_mask = (jnp.arange(L)[None, :]
                      >= (L - n_cached)[:, None])
        if use_mem:
            M = cfg.max_memory_size
            n_bank = jnp.minimum(count, M)
            bank_mask = jnp.arange(M)[None, :] >= (M - n_bank)[:, None]
        new_states: List[jnp.ndarray] = list(states)
        for i, layer in enumerate(self.layers):
            ones = jnp.ones((B, C), bool)
            summary = segment_summaries(h, ones, C) if use_mem else None
            out, new_cache = layer.step(
                h, states[i], deterministic, cache_mask=cache_mask,
                bank=states[n + i] if use_mem else None,
                bank_mask=bank_mask if use_mem else None)
            new_states[i] = new_cache
            if use_mem:
                new_states[n + i] = jnp.concatenate(
                    [states[n + i], summary], axis=1)[:, -M:]
            h = out
        new_states[-1] = count + 1
        return self.out(h).astype(jnp.float32), new_states

    def streaming_forward(self, feats, lengths, deterministic: bool = True):
        """Simulated streaming on a full utterance: identical to __call__
        (the training mask already enforces segment + context + memory
        visibility)."""
        return self(feats, lengths, deterministic)

"""Mask construction utilities (pure jnp, static shapes).

Parity surface with reference model/functions/masking.py:9-216 but returns
boolean masks computed from lengths — in the TPU design lengths are carried
alongside fixed-shape padded tensors and masks are materialized once per
step.

Convention: True = valid position (non-pad), matching the reference's
`make_non_pad_mask`; `make_pad_mask` is its negation.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def make_non_pad_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """(B,) lengths → (B, max_len) bool, True where t < length."""
    pos = lax.broadcasted_iota(jnp.int32, (1, max_len), 1)
    return pos < lengths.astype(jnp.int32)[:, None]


def make_pad_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """(B,) lengths → (B, max_len) bool, True where t >= length (padding)."""
    return ~make_non_pad_mask(lengths, max_len)


def subsequent_mask(size: int) -> jnp.ndarray:
    """(size, size) bool causal mask: True where key j <= query i."""
    i = lax.broadcasted_iota(jnp.int32, (size, size), 0)
    j = lax.broadcasted_iota(jnp.int32, (size, size), 1)
    return j <= i


def subsequent_chunk_mask(
    size: int,
    chunk_size: int,
    num_left_chunks: int = -1,
) -> jnp.ndarray:
    """Chunk-causal mask (reference masking.py:45-80): position i attends to
    everything in its chunk and up to `num_left_chunks` chunks of left
    context (-1 = unlimited left context)."""
    i = lax.broadcasted_iota(jnp.int32, (size, size), 0)
    j = lax.broadcasted_iota(jnp.int32, (size, size), 1)
    chunk_i = i // chunk_size
    chunk_j = j // chunk_size
    ok = chunk_j <= chunk_i
    if num_left_chunks >= 0:
        ok = ok & (chunk_j >= chunk_i - num_left_chunks)
    return ok


def chunk_causal_mask(
    size: int,
    chunk_size: jnp.ndarray | int,
    left_context_chunks: jnp.ndarray | int = -1,
) -> jnp.ndarray:
    """Traced-value-friendly chunk mask (chunk_size may be a traced scalar,
    as in zipformer's per-batch random chunk training, reference
    zipformer.py:409-448). chunk_size <= 0 means full attention."""
    chunk_size = jnp.asarray(chunk_size, jnp.int32)
    left = jnp.asarray(left_context_chunks, jnp.int32)
    cs = jnp.maximum(chunk_size, 1)
    i = lax.broadcasted_iota(jnp.int32, (size, size), 0)
    j = lax.broadcasted_iota(jnp.int32, (size, size), 1)
    chunk_i = i // cs
    chunk_j = j // cs
    ok = chunk_j <= chunk_i
    ok = ok & jnp.where(left >= 0, chunk_j >= chunk_i - left, True)
    return jnp.where(chunk_size > 0, ok, True)


def add_optional_chunk_mask(
    non_pad_mask: jnp.ndarray,
    chunk_size: jnp.ndarray | int,
    left_context_chunks: jnp.ndarray | int = -1,
) -> jnp.ndarray:
    """(B, T) valid mask → (B, T, T) attention mask combining padding with an
    optional chunk-causal structure (wenet-style dynamic chunks, reference
    masking.py:83-155)."""
    B, T = non_pad_mask.shape
    cm = chunk_causal_mask(T, chunk_size, left_context_chunks)  # (T, T)
    am = non_pad_mask[:, None, :] & non_pad_mask[:, :, None]
    return am & cm[None, :, :]


def lengths_after_conv(lengths: jnp.ndarray, kernel: int, stride: int,
                       pad: int = 0) -> jnp.ndarray:
    """Standard conv output-length arithmetic (floor)."""
    return (lengths.astype(jnp.int32) + 2 * pad - kernel) // stride + 1

"""Fused kaldi-fbank Pallas TPU kernel.

One kernel computes, per block of frames, the whole feature pipeline in
VMEM: framing → DC removal → preemphasis → povey window → real-DFT power
spectrum (two MXU matmuls against precomputed cos/sin operands) → mel
projection (MXU) → log. Replaces ~10 separate XLA elementwise/matmul
passes over the (B, T, 400) frame tensor with one read of the hop views
and one write of the features.

Framing: the caller reshapes PCM into hop blocks (B, T, shift) and passes
three views shifted by 0/1/2 hops; each grid block concatenates them in
VMEM to form its (BLK_T, frame_length) frames (frame_length ≤ 3·shift).
This keeps every BlockSpec aligned (overlapping windows are not
expressible as standard blocked indexing).

Layout: DFT operands padded to lane multiples — (400, 384) for 257 rfft
bins, mel banks (384, 128) for 80 mels; kernel writes (BLK_T, 128), caller
slices [:, :n_mels]. snip_edges=True framing only (deployment mode,
reference frontend.py:106-110); snip_edges=False uses the jnp path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
BLK_T = 128
EPSILON = 1.1920928955078125e-07


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def build_operands(window: np.ndarray, dft_cos: np.ndarray,
                   dft_sin: np.ndarray, banks: np.ndarray):
    """Pad DFT/mel operands to TPU lane multiples.

    window (flen,), dft_{cos,sin} (flen, n_bins), banks (n_mels, n_bins)
    → window (1, flen), dft (flen, Kp), banks (Kp, Mp)."""
    flen, n_bins = dft_cos.shape
    n_mels = banks.shape[0]
    Kp = _round_up(n_bins, LANES)
    Mp = _round_up(n_mels, LANES)
    cos_p = np.zeros((flen, Kp), np.float32)
    sin_p = np.zeros((flen, Kp), np.float32)
    cos_p[:, :n_bins] = dft_cos
    sin_p[:, :n_bins] = dft_sin
    banks_p = np.zeros((Kp, Mp), np.float32)
    banks_p[:n_bins, :n_mels] = banks.T
    return (window.reshape(1, -1).astype(np.float32), cos_p, sin_p, banks_p)


def _fbank_kernel(h1_ref, h2_ref, h3_ref, win_ref, cos_ref, sin_ref,
                  banks_ref, out_ref, *, frame_length: int,
                  preemph: float, remove_dc: bool):
    f = jnp.concatenate([h1_ref[0], h2_ref[0], h3_ref[0]],
                        axis=-1)[:, :frame_length]
    f = f.astype(jnp.float32)
    if remove_dc:
        f = f - jnp.mean(f, axis=-1, keepdims=True)
    if preemph > 0.0:
        prev = jnp.concatenate([f[:, :1], f[:, :-1]], axis=-1)
        f = f - preemph * prev
    f = f * win_ref[0, :]
    hp = jax.lax.Precision.HIGHEST  # audio needs f32 mantissa, not bf16 MXU
    re = jnp.dot(f, cos_ref[:, :], precision=hp,
                 preferred_element_type=jnp.float32)
    im = jnp.dot(f, sin_ref[:, :], precision=hp,
                 preferred_element_type=jnp.float32)
    power = re * re + im * im
    mel = jnp.dot(power, banks_ref[:, :], precision=hp,
                  preferred_element_type=jnp.float32)
    out_ref[0] = jnp.log(jnp.maximum(mel, EPSILON))


@partial(jax.jit,
         static_argnames=("frame_length", "frame_shift", "max_frames",
                          "preemph", "remove_dc", "n_mels", "interpret"))
def fbank_pallas(
    pcm: jnp.ndarray,            # (B, N) float32, N % frame_shift == 0
    window: jnp.ndarray,         # (1, flen)
    dft_cos: jnp.ndarray,        # (flen, Kp)
    dft_sin: jnp.ndarray,
    banks: jnp.ndarray,          # (Kp, Mp)
    max_frames: int,
    frame_length: int = 400,
    frame_shift: int = 160,
    preemph: float = 0.97,
    remove_dc: bool = True,
    n_mels: int = 80,
    interpret: bool = False,
) -> jnp.ndarray:
    B, N = pcm.shape
    assert N % frame_shift == 0 and frame_length <= 3 * frame_shift
    Mp = banks.shape[1]
    n_blocks = -(-max_frames // BLK_T)
    Tp = n_blocks * BLK_T
    T_hops = N // frame_shift
    h = pcm.reshape(B, T_hops, frame_shift)
    pad = Tp + 2 - T_hops
    if pad > 0:
        h = jnp.pad(h, ((0, 0), (0, pad), (0, 0)))
    h1 = h[:, :Tp]
    h2 = h[:, 1:Tp + 1]
    h3 = h[:, 2:Tp + 2]

    kernel = partial(_fbank_kernel, frame_length=frame_length,
                     preemph=preemph, remove_dc=remove_dc)
    hop_spec = pl.BlockSpec((1, BLK_T, frame_shift),
                            lambda b, t: (b, t, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, Tp, Mp), jnp.float32),
        grid=(B, n_blocks),
        in_specs=[
            hop_spec, hop_spec, hop_spec,
            pl.BlockSpec((1, frame_length), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(dft_cos.shape, lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(dft_sin.shape, lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(banks.shape, lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BLK_T, Mp), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(h1, h2, h3, window, dft_cos, dft_sin, banks)
    return out[:, :max_frames, :n_mels]

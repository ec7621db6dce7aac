"""Decoder heads: Identity passthrough and Projector logits head.

Parity with reference model/decoder/ (decoder.py:15-40, identity.py:21-46,
projector.py:25-57): Identity forwards (x, lengths) unchanged (CTC on a
joint-trained encoder); Projector is dropout + Linear to vocab logits.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
from flax import linen as nn


@dataclasses.dataclass
class IdentityDecoderConfig:
    dummy: int = -1


class IdentityDecoder(nn.Module):
    config: IdentityDecoderConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths: jnp.ndarray,
                 deterministic: bool = True):
        return x, lengths


@dataclasses.dataclass
class ProjectorDecoderConfig:
    input_dim: int = 256
    num_classes: int = 128
    dropout_p: float = 0.1
    dtype: str = "float32"


class ProjectorDecoder(nn.Module):
    config: ProjectorDecoderConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths: jnp.ndarray,
                 deterministic: bool = True):
        cfg = self.config
        dt = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
        h = nn.Dropout(rate=cfg.dropout_p)(x.astype(dt),
                                           deterministic=deterministic)
        logits = nn.Dense(cfg.num_classes, dtype=dt)(h)
        return logits.astype(jnp.float32), lengths

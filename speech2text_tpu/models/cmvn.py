"""Global CMVN: (x - mean) * istd with precomputed corpus statistics.

Parity with reference model/layer/global_cmvn.py:12-37 (registered buffers,
no-op for pcm frontend) and callbacks/callbacks.py:44-97 (full-trainset
mean/istd computation). Stats are stored in a JSON file and baked into the
jitted step as constants — nothing to sync across ranks (the reference
needed an FSDP buffer-broadcast workaround; sharded-constant semantics make
that moot here)."""

from __future__ import annotations

import json
from typing import Iterable, Tuple

import jax.numpy as jnp
import numpy as np


class GlobalCmvn:

    def __init__(self, mean: np.ndarray | None = None,
                 istd: np.ndarray | None = None):
        self.mean = None if mean is None else jnp.asarray(mean, jnp.float32)
        self.istd = None if istd is None else jnp.asarray(istd, jnp.float32)

    @classmethod
    def from_file(cls, path: str) -> "GlobalCmvn":
        with open(path) as f:
            obj = json.load(f)
        return cls(np.asarray(obj["mean"], np.float32),
                   np.asarray(obj["istd"], np.float32))

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump({"mean": np.asarray(self.mean).tolist(),
                       "istd": np.asarray(self.istd).tolist()}, f)

    def __call__(self, feats: jnp.ndarray) -> jnp.ndarray:
        if self.mean is None:
            return feats
        return (feats - self.mean) * self.istd


def compute_cmvn_stats(
    feat_batches: Iterable[Tuple[np.ndarray, np.ndarray]],
) -> GlobalCmvn:
    """Streaming mean/istd over (feats (B,T,D), lengths (B,)) batches."""
    total = None
    total_sq = None
    count = 0
    for feats, lens in feat_batches:
        feats = np.asarray(feats, np.float64)
        mask = (np.arange(feats.shape[1])[None, :]
                < np.asarray(lens)[:, None]).astype(np.float64)
        s = (feats * mask[..., None]).sum(axis=(0, 1))
        sq = (feats ** 2 * mask[..., None]).sum(axis=(0, 1))
        total = s if total is None else total + s
        total_sq = sq if total_sq is None else total_sq + sq
        count += mask.sum()
    mean = total / count
    var = np.maximum(total_sq / count - mean ** 2, 1e-8)
    return GlobalCmvn(mean.astype(np.float32),
                      (1.0 / np.sqrt(var)).astype(np.float32))

"""Device mesh + sharding policy.

TPU-native replacement for the reference's NCCL/Lightning distributed stack
(SURVEY §2.11): one global `jax.sharding.Mesh` with axes

  ("data", "model")

- **data** axis = DDP parity: the batch is sharded here; gradients are
  reduced by XLA collectives inserted automatically by pjit (replacing
  Lightning's `strategy: ddp` NCCL all-reduce).
- FSDP parity: parameter/optimizer sharding along "data" via
  `shard_params(..., fsdp=True)` — each tensor's largest divisible axis is
  sharded (ZeRO-3 style), all-gathered on use by XLA.
- **model** axis = tensor parallelism (an extension the reference lacks):
  vocab/FFN projections can shard here; kept size 1 by default.

Multi-host: call `jax.distributed.initialize()` once per process before
`make_mesh()`; data loading shards by `jax.process_index()` (see
data/batcher.py) replacing DistributedSampler.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass
class MeshConfig:
    data: int = -1     # -1 → all remaining devices
    model: int = 1


def make_mesh(config: MeshConfig | None = None,
              devices: list | None = None) -> Mesh:
    config = config or MeshConfig()
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    model = max(config.model, 1)
    data = config.data if config.data > 0 else n // model
    assert data * model == n, (
        f"mesh {data}x{model} != {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis sharded over 'data'."""
    return NamedSharding(mesh, P("data"))


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Device-put a host batch with the batch axis sharded over 'data'.
    Non-array leaves (strings for test reports) pass through.

    Single-device meshes use a plain uncommitted device_put: committing
    inputs with NamedShardings routes every consumer jit through the SPMD
    partitioner, which multiplies XLA compile time ~4x on the flagship
    step (see train/loop.py sharding note)."""
    if mesh.size == 1:
        return jax.tree.map(
            lambda x: jax.device_put(x)
            if hasattr(x, "ndim") and x.ndim >= 1 else x, batch)
    sh = batch_sharding(mesh)

    def put(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            return jax.device_put(x, sh)
        return x

    return jax.tree.map(put, batch)


def _fsdp_spec(shape, n_shard: int) -> P:
    """Shard the largest axis divisible by n_shard (ZeRO-3 style); replicate
    tensors too small to shard."""
    if not shape:
        return P()
    order = sorted(range(len(shape)), key=lambda i: -shape[i])
    for i in order:
        if shape[i] % n_shard == 0 and shape[i] >= n_shard:
            spec = [None] * len(shape)
            spec[i] = "data"
            return P(*spec)
    return P()


def shard_params(mesh: Mesh, params: Any, fsdp: bool = False,
                 tp_rules=None) -> Any:
    """Return a pytree of NamedShardings for params.

    - default: replicated (DDP parity)
    - fsdp=True: each tensor's largest divisible axis sharded on 'data'
    - tp_rules: [(path_substring, PartitionSpec), ...] — tensor-parallel
      overrides on the 'model' axis (e.g. vocab projections); matched
      against the '/'-joined param path, first hit wins.
    """
    n = mesh.shape["data"]
    n_model = mesh.shape.get("model", 1)
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)

    def spec_for(path, p):
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        if tp_rules and n_model > 1:
            for pat, spec in tp_rules:
                if pat in name:
                    ok = all(ax is None or (p.shape[i] % mesh.shape[ax] == 0)
                             for i, ax in enumerate(spec))
                    if ok and len(spec) == len(p.shape):
                        return NamedSharding(mesh, spec)
        if fsdp and n > 1:
            return NamedSharding(mesh, _fsdp_spec(p.shape, n))
        return NamedSharding(mesh, P())

    shardings = [spec_for(path, p) for path, p in flat]
    return jax.tree_util.tree_unflatten(treedef, shardings)

"""Deployment export via jax.export (StableHLO).

Replaces the reference's torchscript/ONNX export surfaces:
- FrontendExport callback (reference callbacks/callbacks.py:20-41 traces the
  fbank frontend to `frontend.script`) → `export_frontend` serializes the
  jitted fbank to portable StableHLO bytes.
- PrunedRnntInference ONNX export (reference rnnt_task.py:753-809: encoder
  streaming graph + predictor + joiner) → `export_asr_modules` serializes
  encoder forward, predictor streaming step, and joiner step.

Artifacts are `jax.export` serialized functions (.stablehlo); they reload
with `jax.export.deserialize` and run on any XLA backend.
"""

from __future__ import annotations

import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jexport

from .utils.logging import get_logger

log = get_logger(__name__)


def _serialize(fn, args, path: str) -> None:
    exported = jexport.export(jax.jit(fn))(*args)
    data = exported.serialize()
    with open(path, "wb") as f:
        f.write(data)
    log.info("exported %s (%d bytes)", path, len(data))


def load_exported(path: str):
    with open(path, "rb") as f:
        return jexport.deserialize(f.read())


def export_frontend(frontend, export_dir: str,
                    max_seconds: float = 30.0,
                    sample_rate: int = 16000) -> str:
    """Serialize the batched fbank frontend (B=1, fixed max length)."""
    os.makedirs(export_dir, exist_ok=True)
    n = int(max_seconds * sample_rate)
    path = os.path.join(export_dir, "frontend.stablehlo")

    def fn(pcm, lens):
        return frontend(pcm, lens)

    pcm = jnp.zeros((1, n), jnp.float32)
    lens = jnp.asarray([n], jnp.int32)
    _serialize(fn, (pcm, lens), path)
    return path


def export_asr_modules(task, params, export_dir: str,
                       max_frames: int = 2000,
                       max_label: int = 128) -> Dict[str, str]:
    """Export encoder forward + predictor streaming step + joiner step for
    a transducer task (deployment parity with the reference's ONNX trio)."""
    from .tasks.rnnt import RnntModel
    os.makedirs(export_dir, exist_ok=True)
    model = task.model
    feat_dim = task.frontend.feat_dim
    out: Dict[str, str] = {}

    def enc_fn(params, feats, lens):
        return model.apply({"params": params}, feats, lens,
                           method=RnntModel.encode)

    feats = jnp.zeros((1, max_frames, feat_dim), jnp.float32)
    lens = jnp.asarray([max_frames], jnp.int32)
    path = os.path.join(export_dir, "encoder.stablehlo")
    _serialize(enc_fn, (params, feats, lens), path)
    out["encoder"] = path

    state = model.predictor.init_state(1)

    def pred_fn(params, token, state):
        return model.apply({"params": params}, token, state,
                           method=RnntModel.predictor_step)

    token = jnp.zeros((1,), jnp.int32)
    path = os.path.join(export_dir, "predictor.stablehlo")
    _serialize(pred_fn, (params, token, state), path)
    out["predictor"] = path

    d = task.config["joiner"]["input_dim"]

    def join_fn(params, enc_frame, pred_out):
        return model.apply({"params": params}, enc_frame, pred_out,
                           method=RnntModel.joiner_step)

    enc_frame = jnp.zeros((1, d), jnp.float32)
    pred_out = jnp.zeros((1, d), jnp.float32)
    path = os.path.join(export_dir, "joiner.stablehlo")
    _serialize(join_fn, (params, enc_frame, pred_out), path)
    out["joiner"] = path
    return out

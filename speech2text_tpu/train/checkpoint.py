"""Checkpointing: orbax-backed top-k-by-metric save/restore + averaging.

Parity targets:
- PL ModelCheckpoint top-k on a monitored metric (reference
  build_task.py:97-103, monitor config yaml `callbacks.model_chkpt_config`)
- resume (full train state) vs finetune (params only, accepts a directory
  → averaged checkpoint) (build_task.py:82-94)
- tools/model_average.py:36-66: uniform state-dict average of the best k
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from ..utils.logging import get_logger

log = get_logger(__name__)


class CheckpointManager:
    """Top-k checkpoint manager over {params, opt_state, step} pytrees."""

    def __init__(self, directory: str, save_top_k: int = 10,
                 monitor: str = "wer", mode: str = "min"):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.save_top_k = save_top_k
        self.monitor = monitor
        self.mode = mode
        self._ckptr = ocp.StandardCheckpointer()
        self._index_path = os.path.join(self.directory, "index.json")
        self._index: Dict[str, Any] = {"checkpoints": {}}
        if os.path.exists(self._index_path):
            with open(self._index_path) as f:
                self._index = json.load(f)

    def _path(self, step: int) -> str:
        return os.path.join(self.directory, f"step_{step:08d}")

    def save(self, step: int, state: Any,
             metrics: Optional[Dict[str, float]] = None) -> None:
        path = self._path(step)
        self._ckptr.save(path, state, force=True)
        self._ckptr.wait_until_finished()
        self._index["checkpoints"][str(step)] = dict(metrics or {})
        self._prune()
        with open(self._index_path, "w") as f:
            json.dump(self._index, f, indent=1)

    def _prune(self) -> None:
        ckpts = self._index["checkpoints"]
        if len(ckpts) <= self.save_top_k:
            return
        sign = 1.0 if self.mode == "min" else -1.0
        latest = max(int(s) for s in ckpts)

        def score(item):
            s, m = item
            v = m.get(self.monitor)
            if v is None:
                v = 0.0 if self.mode == "max" else float("inf")
            # tie-break toward the LATER checkpoint: on a flat monitor
            # (e.g. dev WER pinned at 1.0 early in training) keeping the
            # earliest checkpoints would freeze top-k at the least-trained
            # params
            return (sign * v, -int(s))

        ranked = sorted(ckpts.items(), key=score)
        keep = {s for s, _ in ranked[:self.save_top_k]}
        keep.add(str(latest))  # always keep latest for resume
        for s in list(ckpts):
            if s not in keep:
                del ckpts[s]
                path = self._path(int(s))
                if os.path.exists(path):
                    import shutil
                    shutil.rmtree(path, ignore_errors=True)

    def latest_step(self) -> Optional[int]:
        ckpts = self._index["checkpoints"]
        return max((int(s) for s in ckpts), default=None)

    def best_steps(self, k: Optional[int] = None) -> List[int]:
        ckpts = self._index["checkpoints"]
        sign = 1.0 if self.mode == "min" else -1.0
        ranked = sorted(
            ((s, m) for s, m in ckpts.items() if self.monitor in m),
            key=lambda kv: (sign * kv[1][self.monitor], -int(kv[0])))
        steps = [int(s) for s, _ in ranked]
        return steps[:k] if k else steps

    def restore(self, step: int, abstract_state: Any = None) -> Any:
        """abstract_state=None restores the full saved tree as host arrays
        (used for params-only loads where opt_state structure is unknown)."""
        if abstract_state is None:
            return self._ckptr.restore(self._path(step))
        return self._ckptr.restore(self._path(step), abstract_state)

    def restore_latest(self, abstract_state: Any) -> Optional[Any]:
        step = self.latest_step()
        if step is None:
            return None
        log.info("restoring checkpoint step %d", step)
        return step, self.restore(step, abstract_state)


def average_checkpoints(directory: str, abstract_params: Any = None,
                        best_k: int = 5, monitor: str = "wer",
                        mode: str = "min") -> Any:
    """Uniform average of the best-k checkpoints' params (reference
    tools/model_average.py:36-66 semantics)."""
    mgr = CheckpointManager(directory, monitor=monitor, mode=mode)
    steps = mgr.best_steps(best_k)
    if not steps:
        latest = mgr.latest_step()
        assert latest is not None, f"no checkpoints in {directory}"
        steps = [latest]
    log.info("averaging %d checkpoints: %s", len(steps), steps)
    acc = None
    for step in steps:
        state = mgr.restore(step)
        params = state["params"] if isinstance(state, dict) and "params" \
            in state else state
        if acc is None:
            acc = jax.tree.map(lambda x: np.asarray(x, np.float64), params)
        else:
            acc = jax.tree.map(lambda a, x: a + np.asarray(x, np.float64),
                               acc, params)
    return jax.tree.map(
        lambda a: (a / len(steps)).astype(np.float32), acc)

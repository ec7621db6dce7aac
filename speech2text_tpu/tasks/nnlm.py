"""NNLM task: RNN language model for decode rescoring.

Parity with reference task_factory/nnlm_task.py:27-196: teacher-forced
shift (input = t[:-1], label = t[1:], :105-116), masked label-smoothed KL
loss, top-k accuracy metric.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

from ..config import from_dict
from ..data.dataset import LmPipeline
from ..losses import Loss
from ..metrics import masked_topk_accuracy
from ..models.rnn_lm import RnnLm, RnnLmConfig
from .base import AsrTaskBase


class NnLmTask(AsrTaskBase):
    task_type = "NNLM"

    def __init__(self, config: Dict[str, Any]):
        super().__init__(config)
        lm_cfg = dict((config.get("lm", {}) or {}).get("config", {}) or {})
        lm_cfg.setdefault("num_symbols", len(self.tokenizer))
        self.model = RnnLm(from_dict(RnnLmConfig, lm_cfg))
        self.loss = Loss(config["loss"])
        self.topk = int((config.get("metric", {}) or {}).get("top_k", 1))

    # text pipelines instead of audio
    def make_train_pipeline(self, shard_index=0, num_shards=1, seed=17):
        return LmPipeline(self.data_config.train_data, self.tokenizer,
                          batch_size=self.data_config.batch_size, seed=seed,
                          shard_index=shard_index, num_shards=num_shards,
                          training=True)

    def make_eval_pipeline(self, shard_index=0, num_shards=1):
        return LmPipeline(self.data_config.eval_data, self.tokenizer,
                          batch_size=self.data_config.batch_size,
                          shard_index=shard_index, num_shards=num_shards,
                          training=False)

    def init(self, rng: jax.Array):
        tokens = jnp.ones((2, 8), jnp.int32)
        return self.model.init({"params": rng}, tokens)["params"]

    def _shift(self, batch):
        text = batch["text"].astype(jnp.int32)
        inputs, labels = text[:, :-1], text[:, 1:]
        mask = (jnp.arange(labels.shape[1])[None, :]
                < (batch["text_length"][:, None] - 1))
        return inputs, labels, mask

    def loss_fn(self, params, batch, rng, step
                ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        inputs, labels, mask = self._shift(batch)
        logits = self.model.apply({"params": params}, inputs)
        loss = self.loss({"logits": logits, "label": labels, "mask": mask})
        acc = masked_topk_accuracy(logits, labels, mask, k=self.topk)
        return loss, {"train_loss": loss, "acc": acc,
                      "frames": jnp.sum(mask)}

    def eval_forward(self, params, batch):
        inputs, labels, mask = self._shift(batch)
        logits = self.model.apply({"params": params}, inputs)
        loss = self.loss({"logits": logits, "label": labels, "mask": mask})
        acc = masked_topk_accuracy(logits, labels, mask, k=self.topk)
        return {"val_loss": loss, "acc": acc}

    def eval_hyps(self, eval_out, params=None) -> List[str]:
        return []

"""SSL task: BEST-RQ masked-prediction pretraining.

Parity with reference task_factory/ssl_task.py:31-301: dual-view batch
(raw vs augmented features), BestRQ labels from the raw view, masked input
to the encoder, per-codebook masked CE (or KL) losses averaged
(:140-162, 206-231), mask-rate telemetry, masked top-k accuracy metric.

TPU redesign: the reference's dataloader produces two feature tensors per
utterance on CPU; here both views are derived on device from one PCM batch
(raw = clean fbank; auged = noise/mix/specaug fbank) inside the jitted
step.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import from_dict
from ..losses import Loss
from ..metrics import masked_topk_accuracy
from ..models.best_rq import (BestRQConfig, BestRQLayer,
                              MaskingStrategyConfig)
from ..models.factories import EncoderFactory
from .base import AsrTaskBase


class SslModel(nn.Module):
    encoder: nn.Module
    num_codebooks: int
    codebook_size: int

    @nn.compact
    def __call__(self, feats, feat_lens, deterministic: bool = True):
        enc, enc_lens = self.encoder(feats, feat_lens, deterministic)
        logits = nn.Dense(self.num_codebooks * self.codebook_size,
                          name="logits_layer")(enc)
        B, T, _ = logits.shape
        logits = logits.reshape(B, T, self.num_codebooks,
                                self.codebook_size)
        return logits.transpose(2, 0, 1, 3), enc_lens  # (n, B, T, K)


class SslTask(AsrTaskBase):
    task_type = "SSL"

    def __init__(self, config: Dict[str, Any]):
        super().__init__(config)
        ssl_cfg = dict(config.get("ssl", {}) or {})
        brq = dict(ssl_cfg.get("best_rq", {}) or {})
        mask_cfg = from_dict(MaskingStrategyConfig,
                             brq.pop("masking", {}) or {})
        brq.setdefault("feature_dim", self.frontend.feat_dim)
        brq_cfg = from_dict(BestRQConfig, {**brq, "masking": {}})
        brq_cfg.masking = mask_cfg
        self.best_rq = BestRQLayer(brq_cfg)
        self.model = SslModel(EncoderFactory(config["encoder"]),
                              self.best_rq.cfg.num_codebooks,
                              self.best_rq.cfg.codebook_size)
        loss_cfg = dict(config["loss"])
        self.loss_selection = loss_cfg.pop("loss_selection", "mask_loss")
        self.loss = Loss(loss_cfg)
        self.topk = int((config.get("metric", {}) or {}).get("top_k", 1))

    def init(self, rng: jax.Array):
        batch = self.example_batch()
        feats, lens = self.featurize(batch, None, training=False)
        params = self.model.init({"params": rng}, feats, lens)["params"]
        return self.merge_pretrained_encoder(params)

    def loss_fn(self, params, batch, rng, step
                ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        k_aug, k_mask, k_drop = jax.random.split(rng, 3)
        raw_feats, feat_lens = self.featurize(batch, None, training=False)
        auged_feats, _ = self.featurize(batch, k_aug, training=True)
        masked, labels, mask2, lens2 = self.best_rq(
            k_mask, raw_feats, auged_feats, feat_lens)
        logits, enc_lens = self.model.apply(
            {"params": params}, masked, feat_lens, deterministic=False,
            rngs={"dropout": k_drop})
        # align encoder-rate outputs with label-rate targets
        T2 = min(logits.shape[2], labels.shape[2])
        logits = logits[:, :, :T2]
        labels = labels[:, :, :T2]
        mask2 = mask2[:, :T2]
        valid = jnp.arange(T2)[None, :] < jnp.minimum(
            lens2, enc_lens)[:, None]
        sel_mask = (mask2 & valid) if self.loss_selection == "mask_loss" \
            else valid

        n = logits.shape[0]
        losses = []
        accs = []
        for i in range(n):  # static small loop over codebooks
            losses.append(self.loss({"logits": logits[i],
                                     "label": labels[i],
                                     "mask": sel_mask}))
            accs.append(masked_topk_accuracy(logits[i], labels[i],
                                             sel_mask, k=self.topk))
        loss = jnp.mean(jnp.stack(losses))
        acc = jnp.mean(jnp.stack(accs))
        mask_rate = jnp.sum(mask2 & valid) / jnp.maximum(jnp.sum(valid), 1)
        return loss, {"train_loss": loss, "acc": acc,
                      "mask_rate": mask_rate,
                      "frames": jnp.sum(enc_lens)}

    # ---- eval: masked accuracy instead of WER
    def eval_forward(self, params, batch):
        rng = jax.random.PRNGKey(0)  # fixed mask for deterministic eval
        raw_feats, feat_lens = self.featurize(batch, None, training=False)
        masked, labels, mask2, lens2 = self.best_rq(
            rng, raw_feats, raw_feats, feat_lens)
        logits, enc_lens = self.model.apply({"params": params}, masked,
                                            feat_lens, deterministic=True)
        T2 = min(logits.shape[2], labels.shape[2])
        valid = jnp.arange(T2)[None, :] < jnp.minimum(
            lens2, enc_lens)[:, None]
        sel = mask2[:, :T2] & valid
        losses = [self.loss({"logits": logits[i, :, :T2],
                             "label": labels[i, :, :T2], "mask": sel})
                  for i in range(logits.shape[0])]
        accs = [masked_topk_accuracy(logits[i, :, :T2], labels[i, :, :T2],
                                     sel, k=self.topk)
                for i in range(logits.shape[0])]
        return {"val_loss": jnp.mean(jnp.stack(losses)),
                "acc": jnp.mean(jnp.stack(accs))}

    def eval_hyps(self, eval_out, params=None) -> List[str]:
        return []  # SSL has no transcripts; Trainer uses val metrics only

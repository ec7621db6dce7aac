"""CIF task: non-autoregressive continuous integrate-and-fire AED.

Parity with reference task_factory/cif_task.py:34-275:
- train: enc → CifLayer (alphas rescaled to target length) → decoder head;
  loss = mae_weight · MAE(token counts) + masked CE over AED logits
- validation re-runs CIF in inference mode (tail-threshold path) and
  computes WER from per-position greedy decode (:230-262)
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import from_dict
from ..decoding import CifGreedyDecoding
from ..losses import Loss
from ..models.cif import CifConfig, CifLayer
from ..models.factories import DecoderFactory, EncoderFactory
from .base import AsrTaskBase


class CifModel(nn.Module):
    encoder: nn.Module
    cif: CifLayer
    decoder: nn.Module

    def __call__(self, feats, feat_lens, target_lengths=None,
                 deterministic: bool = True):
        enc, enc_lens = self.encoder(feats, feat_lens, deterministic)
        embeds, pred_counts, emit_counts = self.cif(enc, enc_lens,
                                                    target_lengths)
        logits, _ = self.decoder(embeds, emit_counts, deterministic)
        return {"logits": logits, "pred_counts": pred_counts,
                "emit_counts": emit_counts, "enc_lens": enc_lens}


class CifTask(AsrTaskBase):
    task_type = "CIF"

    def __init__(self, config: Dict[str, Any]):
        super().__init__(config)
        cif_cfg = from_dict(CifConfig, (config.get("cif", {}) or {}).get(
            "config", config.get("cif", {}) or {}))
        self.model = CifModel(EncoderFactory(config["encoder"]),
                              CifLayer(cif_cfg),
                              DecoderFactory(config["decoder"]))
        loss_cfg = config["loss"]
        self.mae_weight = float(loss_cfg.get("mae_weight", 1.0))
        self.mae_loss = Loss({"model": "MaeLoss",
                              "config": loss_cfg.get("mae_config", {})})
        self.ce_loss = Loss({"model": "MaskedCELoss",
                             "config": loss_cfg.get("ce_config", {})})
        self.decode_session = CifGreedyDecoding(self.tokenizer)

    def init(self, rng: jax.Array):
        batch = self.example_batch()
        feats, lens = self.featurize(batch, None, training=False)
        params = self.model.init({"params": rng}, feats, lens,
                                 batch["label_length"])["params"]
        return self.merge_pretrained_encoder(params)

    def loss_fn(self, params, batch, rng, step
                ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        k_aug, k_drop = jax.random.split(rng)
        feats, feat_lens = self.featurize(batch, k_aug, training=True)
        out = self.model.apply({"params": params}, feats, feat_lens,
                               batch["label_length"], deterministic=False,
                               rngs={"dropout": k_drop})
        # Align the static label pad (bucket label_len) with the CIF
        # emission buffer (cif.max_tokens): score the overlap and clamp the
        # mask so neither a generous pad nor a tight U_cap broadcasts wrong.
        # (The reference runs dynamic shapes so the two always agree;
        # here both are static and may be configured independently.)
        L = min(batch["label"].shape[1], out["logits"].shape[1])
        ce = self.ce_loss({"logits": out["logits"][:, :L],
                           "label": batch["label"][:, :L],
                           "mask": jnp.minimum(batch["label_length"], L)})
        mae = self.mae_loss({"pred_token_counts": out["pred_counts"],
                             "true_token_counts": batch["label_length"]})
        loss = ce + self.mae_weight * mae
        return loss, {"train_loss": loss, "ce_loss": ce, "mae_loss": mae,
                      "frames": jnp.sum(out["enc_lens"])}

    # ---------------------------------------------------------- evaluation
    def eval_forward(self, params, batch):
        feats, feat_lens = self.featurize(batch, None, training=False)
        # loss pass (teacher-forced lengths) + inference pass for WER
        out = self.model.apply({"params": params}, feats, feat_lens,
                               batch["label_length"], deterministic=True)
        L = min(batch["label"].shape[1], out["logits"].shape[1])
        ce = self.ce_loss({"logits": out["logits"][:, :L],
                           "label": batch["label"][:, :L],
                           "mask": jnp.minimum(batch["label_length"], L)})
        infer = self.model.apply({"params": params}, feats, feat_lens, None,
                                 deterministic=True)
        log_probs = jax.nn.log_softmax(infer["logits"], axis=-1)
        return {"val_loss": ce, "log_probs": log_probs,
                "token_counts": infer["emit_counts"]}

    def eval_hyps(self, eval_out, params=None) -> List[str]:
        return self.decode_session.decode(eval_out["log_probs"],
                                          eval_out["token_counts"])

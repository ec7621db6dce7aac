"""CTC task: encoder → decoder head → CTC loss; eval WER via greedy decode.

Parity with reference task_factory/ctc_task.py:32-227 (cmvn→enc→dec→
CtcLoss; validation WER on log-softmax of decoder output), reorganized as a
pure `loss_fn(params, batch, rng, step)` for one jitted pjit train step.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..decoding import CtcGreedyDecoding, CtcPrefixBeamDecoding
from ..losses import Loss
from ..models.factories import DecoderFactory, EncoderFactory
from .base import AsrTaskBase


class CtcModel(nn.Module):
    encoder: nn.Module
    decoder: nn.Module

    def __call__(self, feats, feat_lens, deterministic: bool = True):
        enc, lens = self.encoder(feats, feat_lens, deterministic)
        logits, lens = self.decoder(enc, lens, deterministic)
        return logits, lens


class CtcTask(AsrTaskBase):
    task_type = "CTC"

    def __init__(self, config: Dict[str, Any]):
        super().__init__(config)
        self.model = CtcModel(EncoderFactory(config["encoder"]),
                              DecoderFactory(config["decoder"]))
        self.loss = Loss(config["loss"])
        metric_cfg = config.get("metric", {}) or {}
        method = metric_cfg.get("decode_method", "ctc_greedy_search")
        if method == "ctc_prefix_beam_search":
            self.decode_session = CtcPrefixBeamDecoding(
                self.tokenizer, beam_size=metric_cfg.get("beam_size", 8),
                cand_size=metric_cfg.get("cand_size", 8))
        elif method == "ctc_lexicon_beam_search":
            # deployment-grade lexicon(+ARPA LM) beam via the C++ runtime
            # (reference decoding.py:85-154 flashlight path); lexicon from
            # a word list spelled with this tokenizer
            from ..runtime_binding import CtcLexiconBeamDecoding
            with open(metric_cfg["word_list"]) as f:
                words = [w.strip() for w in f if w.strip()]
            lexicon = {w: self.tokenizer.encode(w).tolist() for w in words}
            self.decode_session = CtcLexiconBeamDecoding(
                lexicon, arpa_path=metric_cfg.get("arpa_lm"),
                beam_size=int(metric_cfg.get("beam_size", 16)),
                lm_weight=float(metric_cfg.get("lm_weight", 1.0)),
                word_score=float(metric_cfg.get("word_score", 0.0)))
        else:
            self.decode_session = CtcGreedyDecoding(self.tokenizer)

    # ---------------------------------------------------------------- init
    def init(self, rng: jax.Array):
        batch = self.example_batch()
        feats, lens = self.featurize(batch, None, training=False)
        params = self.model.init({"params": rng}, feats, lens)["params"]
        return self.merge_pretrained_encoder(params)

    # ------------------------------------------------------------- training
    def loss_fn(self, params, batch, rng, step
                ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        k_aug, k_drop = jax.random.split(rng)
        feats, feat_lens = self.featurize(batch, k_aug, training=True)
        logits, out_lens = self.model.apply(
            {"params": params}, feats, feat_lens, deterministic=False,
            rngs={"dropout": k_drop})
        loss = self.loss({"logits": logits, "logits_length": out_lens,
                          "label": batch["label"],
                          "label_length": batch["label_length"]})
        frames = jnp.sum(feat_lens)
        return loss, {"train_loss": loss, "frames": frames}

    # ------------------------------------------------------------ evaluation
    def eval_forward(self, params, batch):
        """Jit-safe eval tensor pass: returns arrays only."""
        feats, feat_lens = self.featurize(batch, None, training=False)
        logits, out_lens = self.model.apply({"params": params}, feats,
                                            feat_lens, deterministic=True)
        loss = self.loss({"logits": logits, "logits_length": out_lens,
                          "label": batch["label"],
                          "label_length": batch["label_length"]})
        log_probs = self.loss.predict(logits)
        return {"val_loss": loss, "log_probs": log_probs,
                "out_lens": out_lens}

    def eval_hyps(self, eval_out, params=None) -> List[str]:
        return self.decode_session.decode(eval_out["log_probs"],
                                          eval_out["out_lens"])

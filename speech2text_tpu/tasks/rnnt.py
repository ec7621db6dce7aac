"""Transducer tasks: vanilla RNN-T, CTC+RNN-T hybrid, pruned RNN-T.

Parity with reference task_factory/rnnt_task.py:
- RnntTask (:191-284): cmvn→enc→dec→predictor→joiner→RnntLoss; eval WER via
  greedy decode.
- CtcHybridRnnt (:287-420): joiner on encoder_out for the rnnt branch,
  decoder(Projector) logits for the CTC branch;
  loss = rnnt_weight·rnnt + ctc_weight·ctc (weights :296-302, combine :349).
- PrunedRnntTask (:423-644): joiner returns (pruned_logits, ranges,
  simple_loss); loss = simple_scale·simple + pruned_scale·pruned
  (+ optional aux CTC branch, :434-445, combine :485-499).
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..decoding import RnntBeamDecoding, RnntGreedyDecoding
from ..losses import Loss
from ..models.factories import (DecoderFactory, EncoderFactory,
                                JoinerFactory, PredictorFactory)
from .base import AsrTaskBase


class RnntModel(nn.Module):
    """encoder + decoder head + predictor + joiner in one param tree."""
    encoder: nn.Module
    decoder: nn.Module
    predictor: nn.Module
    joiner: nn.Module

    def __call__(self, feats, feat_lens, labels, label_lens,
                 deterministic: bool = True, chunk_size=None,
                 left_context_chunks=None, step=None):
        from ..models.zipformer import Zipformer2
        if isinstance(self.encoder, Zipformer2):
            enc, enc_lens = self.encoder(
                feats, feat_lens, deterministic,
                chunk_size=chunk_size,
                left_context_chunks=left_context_chunks, step=step)
        else:
            enc, enc_lens = self.encoder(feats, feat_lens, deterministic)
        from ..stopgrad_probe import tag
        enc = tag(enc, "encoder")
        dec, dec_lens = self.decoder(enc, enc_lens, deterministic)
        pred = self.predictor(labels)
        logits, ranges, simple_loss = self.joiner(
            enc, enc_lens, pred, label_lens, labels)
        return {"enc": enc, "enc_lens": enc_lens, "dec": dec,
                "dec_lens": dec_lens, "logits": logits, "ranges": ranges,
                "simple_loss": simple_loss}

    def encode(self, feats, feat_lens, deterministic: bool = True):
        return self.encoder(feats, feat_lens, deterministic)

    def predictor_step(self, token, state):
        return self.predictor.streaming_step(token, state)

    def joiner_step(self, enc_frame, pred_out):
        return self.joiner.streaming_step(enc_frame, pred_out)


class BaseRnntTask(AsrTaskBase):
    """Shared assembly + decode session (reference BaseRnntTask,
    rnnt_task.py:37-188)."""

    def __init__(self, config: Dict[str, Any]):
        super().__init__(config)
        self.model = RnntModel(
            encoder=EncoderFactory(config["encoder"]),
            decoder=DecoderFactory(config["decoder"]),
            predictor=PredictorFactory(config["predictor"]),
            joiner=JoinerFactory(config["joiner"]))
        metric_cfg = config.get("metric", {}) or {}

        def pred_step(params, token, state):
            return self.model.apply({"params": params}, token, state,
                                    method=RnntModel.predictor_step)

        def pred_init(batch_size):
            return self.model.predictor.init_state(batch_size)

        def join_step(params, enc_frame, pred_out):
            return self.model.apply({"params": params}, enc_frame, pred_out,
                                    method=RnntModel.joiner_step)

        # optional neural-LM shallow fusion for beam search (uses an NNLM
        # trained by the NNLM task; extension beyond the reference, which
        # trains the LM for rescoring but never wires it into decoding)
        lm_step = lm_init = None
        lm_weight = 0.0
        fusion = metric_cfg.get("lm_fusion") or {}
        if fusion.get("checkpoint_dir"):
            from ..config import from_dict
            from ..models.rnn_lm import RnnLm, RnnLmConfig
            from ..train.checkpoint import average_checkpoints
            lm_cfg = dict(fusion.get("lm_config", {}) or {})
            lm_cfg.setdefault("num_symbols", len(self.tokenizer))
            lm_model = RnnLm(from_dict(RnnLmConfig, lm_cfg))
            lm_params = average_checkpoints(
                fusion["checkpoint_dir"],
                best_k=int(fusion.get("best_k", 1)),
                monitor=fusion.get("monitor", "acc"),
                mode=fusion.get("mode", "max"))
            lm_weight = float(fusion.get("lm_weight", 0.3))

            def lm_step(params, token, state, _lm_params=lm_params):
                return lm_model.apply({"params": _lm_params}, token, state,
                                      method=RnnLm.score_step)

            def lm_init(batch_size):
                return lm_model.init_state(batch_size)

        # int8 quantized decode execution (reference rnnt_task.py:753-809
        # runs its exported ONNX dynamically int8-quantized; here the same
        # scheme executes on the MXU — see quant.py). Built lazily at
        # first eval_hyps because it snapshots the weights.
        self._int8_decode = bool(metric_cfg.get("int8", False))
        self._int8_session = None
        self._int8_max_token_step = int(metric_cfg.get("max_token_step", 1))
        method = metric_cfg.get("decode_method", "rnnt_greedy_search")
        if method == "rnnt_beam_search":
            self.decode_session = RnntBeamDecoding(
                self.tokenizer, pred_step, pred_init, join_step,
                beam_size=int(metric_cfg.get("beam_size", 4)),
                cutoff_top_k=int(metric_cfg.get("cutoff_top_k", 4)),
                lm_step=lm_step, lm_init=lm_init, lm_weight=lm_weight)
        else:
            self.decode_session = RnntGreedyDecoding(
                self.tokenizer, pred_step, pred_init, join_step,
                max_token_step=int(metric_cfg.get("max_token_step", 1)))

    def init(self, rng: jax.Array):
        batch = self.example_batch()
        feats, lens = self.featurize(batch, None, training=False)
        params = self.model.init({"params": rng}, feats, lens,
                                 batch["label"],
                                 batch["label_length"])["params"]
        return self.merge_pretrained_encoder(params)

    def _sample_chunk(self, k_chunk):
        """Random chunked-causal training (reference zipformer.py:290-317):
        sample (chunk_size, left_context_frames) per step from the config
        lists; -1 → full attention."""
        enc_cfg = self.config["encoder"].get("config", {})
        chunks = enc_cfg.get("chunk_size") or [-1]
        lefts = enc_cfg.get("left_context_frames") or [-1]
        if not enc_cfg.get("causal") or (len(chunks) == 1
                                         and chunks[0] == -1):
            return None, None
        kc, kl = jax.random.split(k_chunk)
        cs = jnp.asarray(chunks, jnp.int32)[
            jax.random.randint(kc, (), 0, len(chunks))]
        lf = jnp.asarray(lefts, jnp.int32)[
            jax.random.randint(kl, (), 0, len(lefts))]
        left_chunks = jnp.where((lf > 0) & (cs > 0),
                                jnp.maximum(lf // jnp.maximum(cs, 1), 1), -1)
        return cs, left_chunks

    def _forward(self, params, batch, rng=None, training=False, step=None):
        if training:
            k_aug, k_drop, k_chunk = jax.random.split(rng, 3)
            feats, feat_lens = self.featurize(batch, k_aug, training=True)
            cs, lc = self._sample_chunk(k_chunk)
            return self.model.apply(
                {"params": params}, feats, feat_lens, batch["label"],
                batch["label_length"], deterministic=False,
                chunk_size=cs, left_context_chunks=lc, step=step,
                rngs={"dropout": k_drop})
        feats, feat_lens = self.featurize(batch, None, training=False)
        return self.model.apply({"params": params}, feats, feat_lens,
                                batch["label"], batch["label_length"],
                                deterministic=True)

    # ------------------------------------------------------------ evaluation
    def eval_loss_metrics(self, out, batch) -> Dict[str, jnp.ndarray]:
        """Per-task validation losses (reference rnnt_task.py logs
        val_loss and per-branch losses in validation_step, e.g.
        :283,415-417,497-505). Overridden by each concrete task; the
        train loop averages every 0-d scalar returned by eval_forward,
        so checkpoint top-k can monitor `val_loss` on RNN-T tasks."""
        return {"val_loss": jnp.zeros(())}

    def eval_forward(self, params, batch):
        feats, feat_lens = self.featurize(batch, None, training=False)
        metric_cfg = self.config.get("metric", {}) or {}
        if metric_cfg.get("encoder_streaming"):
            # simulated-streaming encoder forward (reference
            # rnnt_task.py:814-819 test_step streaming branch)
            from ..models.zipformer import Zipformer2
            cs = int(metric_cfg.get("streaming_chunk_size", 32))
            lc = int(metric_cfg.get("streaming_left_chunks", 4))
            if isinstance(self.model.encoder, Zipformer2):
                enc, enc_lens = self.model.apply(
                    {"params": params}, feats, feat_lens,
                    deterministic=True,
                    chunk_size=jnp.asarray(cs, jnp.int32),
                    left_context_chunks=jnp.asarray(lc, jnp.int32),
                    method=lambda m, *a, **k: m.encoder(*a, **k))
            else:
                enc, enc_lens = self.model.apply(
                    {"params": params}, feats, feat_lens,
                    deterministic=True, method=RnntModel.encode)
            return {"enc": enc, "enc_lens": enc_lens}
        # full forward (predictor + joiner) so real validation losses are
        # computable; the encoder output is reused for decoding
        out = self.model.apply({"params": params}, feats, feat_lens,
                               batch["label"], batch["label_length"],
                               deterministic=True)
        return {"enc": out["enc"], "enc_lens": out["enc_lens"],
                **self.eval_loss_metrics(out, batch)}

    def eval_hyps(self, eval_out, params=None) -> List[str]:
        if self._int8_decode:
            if self._int8_session is None:
                from ..quant import (Int8RnntBeamDecoding,
                                     Int8RnntGreedyDecoding)
                metric_cfg = self.config.get("metric", {}) or {}
                common = dict(
                    predictor_model=self.config["predictor"]["model"],
                    min_size=int(metric_cfg.get("int8_min_size", 1024)))
                if (metric_cfg.get("decode_method", "rnnt_greedy_search")
                        == "rnnt_beam_search"):
                    self._int8_session = Int8RnntBeamDecoding(
                        self.tokenizer, params,
                        self.config["predictor"].get("config", {}),
                        self.config["joiner"],
                        beam_size=int(metric_cfg.get("beam_size", 4)),
                        cutoff_top_k=int(metric_cfg.get("cutoff_top_k", 4)),
                        **common)
                else:
                    self._int8_session = Int8RnntGreedyDecoding(
                        self.tokenizer, params,
                        self.config["predictor"].get("config", {}),
                        self.config["joiner"],
                        max_token_step=self._int8_max_token_step, **common)
            return self._int8_session.decode(None, eval_out["enc"],
                                             eval_out["enc_lens"])
        return self.decode_session.decode(params, eval_out["enc"],
                                          eval_out["enc_lens"])


class RnntTask(BaseRnntTask):
    task_type = "Rnnt"

    def __init__(self, config: Dict[str, Any]):
        assert config["joiner"].get("prune_range", -1) <= 0, \
            "vanilla RnntTask requires prune_range <= 0 (use Pruned_Rnnt)"
        super().__init__(config)
        self.loss = Loss(config["loss"])

    def loss_fn(self, params, batch, rng, step
                ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        out = self._forward(params, batch, rng, training=True, step=step)
        loss = self.loss({"logits": out["logits"],
                          "logits_length": out["enc_lens"],
                          "label": batch["label"],
                          "label_length": batch["label_length"]})
        return loss, {"train_loss": loss,
                      "frames": jnp.sum(out["enc_lens"])}

    def eval_loss_metrics(self, out, batch):
        # reference rnnt_task.py:283 logs val_loss in validation_step
        loss = self.loss({"logits": out["logits"],
                          "logits_length": out["enc_lens"],
                          "label": batch["label"],
                          "label_length": batch["label_length"]})
        return {"val_loss": loss}


class CtcHybridRnntTask(BaseRnntTask):
    task_type = "CTC_Hybrid_Rnnt"

    def __init__(self, config: Dict[str, Any]):
        assert config["joiner"].get("prune_range", -1) <= 0
        super().__init__(config)
        loss_cfg = config["loss"]
        self.rnnt_weight = float(loss_cfg.get("rnnt_weight", 0.5))
        self.ctc_weight = float(loss_cfg.get("ctc_weight", 0.5))
        self.rnnt_loss = Loss({"model": "Rnnt",
                               "config": loss_cfg.get("rnnt_config", {})})
        self.ctc_loss = Loss({"model": "CTC",
                              "config": loss_cfg.get("ctc_config", {})})

    def loss_fn(self, params, batch, rng, step):
        out = self._forward(params, batch, rng, training=True, step=step)
        rnnt = self.rnnt_loss({"logits": out["logits"],
                               "logits_length": out["enc_lens"],
                               "label": batch["label"],
                               "label_length": batch["label_length"]})
        ctc = self.ctc_loss({"logits": out["dec"],
                             "logits_length": out["dec_lens"],
                             "label": batch["label"],
                             "label_length": batch["label_length"]})
        loss = self.rnnt_weight * rnnt + self.ctc_weight * ctc
        return loss, {"train_loss": loss, "rnnt_loss": rnnt,
                      "ctc_loss": ctc, "frames": jnp.sum(out["enc_lens"])}

    def eval_loss_metrics(self, out, batch):
        # reference rnnt_task.py:415-417 logs val_loss + branch losses
        rnnt = self.rnnt_loss({"logits": out["logits"],
                               "logits_length": out["enc_lens"],
                               "label": batch["label"],
                               "label_length": batch["label_length"]})
        ctc = self.ctc_loss({"logits": out["dec"],
                             "logits_length": out["dec_lens"],
                             "label": batch["label"],
                             "label_length": batch["label_length"]})
        return {"val_loss": self.rnnt_weight * rnnt + self.ctc_weight * ctc,
                "val_rnnt_loss": rnnt, "val_ctc_loss": ctc}


class PrunedRnntTask(BaseRnntTask):
    task_type = "Pruned_Rnnt"

    def __init__(self, config: Dict[str, Any]):
        assert config["joiner"].get("prune_range", -1) > 0, \
            "PrunedRnntTask requires joiner.prune_range > 0"
        super().__init__(config)
        loss_cfg = config["loss"]
        self.simple_scale = float(loss_cfg.get("simple_loss_scale", 0.5))
        self.pruned_scale = float(loss_cfg.get("pruned_loss_scale", 0.5))
        self.pruned_loss = Loss({"model": "Pruned_Rnnt",
                                 "config": loss_cfg.get("config", {})})
        self.enable_ctc = bool(loss_cfg.get("enable_ctc", False))
        if self.enable_ctc:
            self.ctc_weight = float(loss_cfg.get("ctc_weight", 0.3))
            self.ctc_loss = Loss({"model": "CTC",
                                  "config": loss_cfg.get("ctc_config", {})})

    def loss_fn(self, params, batch, rng, step):
        out = self._forward(params, batch, rng, training=True, step=step)
        simple = out["simple_loss"]
        pruned = self.pruned_loss({"logits": out["logits"],
                                   "ranges": out["ranges"],
                                   "logits_length": out["enc_lens"],
                                   "label": batch["label"],
                                   "label_length": batch["label_length"]})
        loss = self.simple_scale * simple + self.pruned_scale * pruned
        metrics = {"simple_loss": simple, "pruned_loss": pruned}
        if self.enable_ctc:
            ctc = self.ctc_loss({"logits": out["dec"],
                                 "logits_length": out["dec_lens"],
                                 "label": batch["label"],
                                 "label_length": batch["label_length"]})
            loss = loss + self.ctc_weight * ctc
            metrics["ctc_loss"] = ctc
        metrics["train_loss"] = loss
        metrics["frames"] = jnp.sum(out["enc_lens"])
        return loss, metrics

    def eval_loss_metrics(self, out, batch):
        # reference rnnt_task.py:574-577 logs val simple/pruned(/ctc) losses
        simple = out["simple_loss"]
        pruned = self.pruned_loss({"logits": out["logits"],
                                   "ranges": out["ranges"],
                                   "logits_length": out["enc_lens"],
                                   "label": batch["label"],
                                   "label_length": batch["label_length"]})
        loss = self.simple_scale * simple + self.pruned_scale * pruned
        metrics = {"val_simple_loss": simple, "val_pruned_loss": pruned}
        if self.enable_ctc:
            ctc = self.ctc_loss({"logits": out["dec"],
                                 "logits_length": out["dec_lens"],
                                 "label": batch["label"],
                                 "label_length": batch["label_length"]})
            loss = loss + self.ctc_weight * ctc
            metrics["val_ctc_loss"] = ctc
        metrics["val_loss"] = loss
        return metrics

"""Shared ASR task plumbing: tokenizer/frontend/cmvn assembly + the
device-side featurization stage (fbank → noise-mix → CMVN → SpecAugment)
that replaces the reference's CPU dataloader feature pipeline
(reference dataset/dataset.py:141-208 runs all of this per-utterance in
worker processes; here it's one jitted batched stage inside the step).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..data import augment
from ..data.dataset import AsrPipeline, DataConfig
from ..data.frontend import Fbank, FrontendSetup
from ..data.tokenizer import TokenizerSetup
from ..models.cmvn import GlobalCmvn
from ..config import from_dict


def _dequant_pcm(pcm: jnp.ndarray) -> jnp.ndarray:
    """int16 wire format → float32 waveform (see DataConfig.pcm_dtype:
    audio ships as int16 to halve host→device transfer)."""
    if pcm.dtype == jnp.int16:
        return pcm.astype(jnp.float32) * (1.0 / 32768.0)
    return pcm


class AsrTaskBase:
    """Builds tokenizer, frontend, CMVN, augmentation config from the YAML
    tree (reference BaseRnntTask.__init__ parity, rnnt_task.py:56-67)."""

    def __init__(self, config: Dict[str, Any]):
        self.config = config
        self.tokenizer = TokenizerSetup(config["tokenizer"])
        ds = dict(config.get("dataset", {}))
        self.data_config = from_dict(DataConfig, {
            k: v for k, v in ds.items()
            if k in DataConfig.__dataclass_fields__})
        self.frontend = FrontendSetup(ds.get("feat_type", "lhotes_fbank"),
                                      ds.get("feat_config", {}))
        self.aug = dict(ds.get("data_aug_config", {}) or {})
        cmvn_cfg = (config.get("callbacks", {}) or {}).get("global_cmvn", {})
        self.cmvn = GlobalCmvn()
        if cmvn_cfg and cmvn_cfg.get("apply"):
            path = cmvn_cfg.get("pre_compute_cmvn")
            if path and os.path.exists(path):
                self.cmvn = GlobalCmvn.from_file(path)

    # ------------------------------------------------------------- pipeline
    def make_train_pipeline(self, shard_index=0, num_shards=1, seed=17):
        return AsrPipeline(self.data_config.train_data, self.tokenizer,
                           self.data_config, training=True, seed=seed,
                           shard_index=shard_index, num_shards=num_shards)

    def make_eval_pipeline(self, shard_index=0, num_shards=1):
        return AsrPipeline(self.data_config.eval_data, self.tokenizer,
                           self.data_config, training=False,
                           shard_index=shard_index, num_shards=num_shards)

    def make_test_pipeline(self):
        return AsrPipeline(self.data_config.test_data, self.tokenizer,
                           self.data_config, training=False, keep_text=True)

    # ----------------------------------------------------------- featurize
    def featurize(
        self,
        batch: Dict[str, jnp.ndarray],
        rng: Optional[jax.Array],
        training: bool,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """pcm batch → (feats (B,T,D), feat_lens). Pure/jit-safe. Applies
        (in reference order, dataset.py:141-208): add_noise(p) → fbank →
        mix_feats(p) → CMVN → SpecAugment."""
        pcm = _dequant_pcm(batch["pcm"])
        pcm_lens = batch["pcm_length"]
        if not training or rng is None:
            feats, lens = self.frontend(pcm, pcm_lens)
            return self.cmvn(feats), lens

        k_noise, k_apply1, k_mix, k_apply2, k_spec, k_dither = \
            jax.random.split(rng, 6)
        if self.aug.get("use_add_noise") and "noise_pcm" in batch:
            nc = self.aug.get("add_noise_config", {})
            p = float(self.aug.get("add_noise_proportion", 0.5))
            apply = jax.random.bernoulli(k_apply1, p, (pcm.shape[0],))
            pcm = augment.add_noise(
                pcm, pcm_lens, _dequant_pcm(batch["noise_pcm"]),
                batch["noise_length"],
                k_noise, min_snr_db=float(nc.get("min_snr_db", 10)),
                max_snr_db=float(nc.get("max_snr_db", 50)), apply=apply)
        feats, lens = self.frontend(pcm, pcm_lens, dither_key=k_dither)
        if self.aug.get("use_mix_feats") and "noise_pcm" in batch \
                and isinstance(self.frontend, Fbank):
            mc = self.aug.get("mix_feats_config", {})
            p = float(self.aug.get("mix_feats_proportion", 0.5))
            napply = jax.random.bernoulli(k_apply2, p, (pcm.shape[0],))
            nfeats, nlens = self.frontend(_dequant_pcm(batch["noise_pcm"]),
                                          batch["noise_length"])
            feats = augment.mix_feats(feats, lens, nfeats, nlens, k_mix,
                                      snrs=tuple(mc.get("snrs", (10, 20))),
                                      apply=napply)
        feats = self.cmvn(feats)
        if self.aug.get("use_spec_aug") and isinstance(self.frontend, Fbank):
            sc = self.aug.get("spec_aug_config", {})
            feats = augment.spec_augment(
                feats, lens, k_spec,
                num_time_masks=int(sc.get("num_time_masks", 2)),
                time_mask_max=int(sc.get("time_mask_max", 50)),
                num_freq_masks=int(sc.get("num_freq_masks", 2)),
                freq_mask_max=int(sc.get("freq_mask_max", 10)))
        return feats, lens

    # ------------------------------------------------------------ interface
    @property
    def vocab_size(self) -> int:
        return len(self.tokenizer)

    def merge_pretrained_encoder(self, params):
        """If the encoder config names a converted pretrained checkpoint
        (e.g. a wav2vec2 msgpack from tools/convert_wav2vec2.py), merge it
        over the random init — the reference constructs its encoder from HF
        pretrained weights directly (model/encoder/wav2vec2.py:25-43)."""
        enc_cfg = (self.config.get("encoder", {}).get("config", {}) or {})
        path = enc_cfg.get("pretrained_path")
        if not path:
            return params
        from flax import serialization
        with open(path, "rb") as f:
            tree = serialization.msgpack_restore(f.read())
        layout = tree.pop("__layout__", None)
        if layout is not None:
            # Pre-norm ("stable") and post-norm wav2vec2 layouts have
            # identical param names AND shapes, so a silent merge of the
            # wrong variant would load cleanly and compute garbage.
            # Validate the converter's recorded layout against the model
            # config before merging (HF guards this via config.json; see
            # reference model/encoder/wav2vec2.py:25-43).
            want = {
                "num_layers": int(enc_cfg.get("num_layers", 12)),
                "do_stable_layer_norm": int(
                    bool(enc_cfg.get("do_stable_layer_norm", False))),
                "feat_extract_norm": int(
                    enc_cfg.get("feat_extract_norm", "group") == "layer"),
            }
            for k, expect in want.items():
                if k in layout and int(layout[k]) != expect:
                    raise ValueError(
                        f"pretrained checkpoint layout mismatch: {k} is "
                        f"{int(layout[k])} in {path} but the encoder "
                        f"config expects {expect}")
        enc = dict(params["encoder"])

        def merge(dst, src, where):
            for k, v in src.items():
                if k not in dst:
                    raise KeyError(f"pretrained key {where}/{k} not in "
                                   f"model params (layout mismatch?)")
                if isinstance(v, dict):
                    dst[k] = merge(dict(dst[k]), v, f"{where}/{k}")
                else:
                    if tuple(dst[k].shape) != tuple(v.shape):
                        raise ValueError(
                            f"shape mismatch at {where}/{k}: model "
                            f"{dst[k].shape} vs checkpoint {v.shape}")
                    dst[k] = jnp.asarray(v, dst[k].dtype)
            return dst

        params = dict(params)
        params["encoder"] = merge(enc, tree, "encoder")
        return params

    def example_batch(self) -> Dict[str, jnp.ndarray]:
        """Tiny fixed-shape batch for parameter init."""
        import numpy as np
        B, N, U = 2, 16000, 8
        return {
            "pcm": jnp.asarray(np.zeros((B, N), np.float32)),
            "pcm_length": jnp.asarray(np.full((B,), N, np.int32)),
            "label": jnp.asarray(np.ones((B, U), np.int32)),
            "label_length": jnp.asarray(np.full((B,), U, np.int32)),
        }

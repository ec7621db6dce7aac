#!/usr/bin/env python3
"""Training entry point (reference build_task.py:48-148 surface parity).

Usage:
  python build_task.py --training_config=configs/training/conformer_ctc.yaml
      [--override a.b.c=value ...] [--max_steps N]

YAML → task → Trainer.fit: seeds, logging to export dir, config backup,
subword-model preprocess, finetune-from-checkpoint (file or top-k average),
resume.
"""

from __future__ import annotations

import os
import random

import numpy as np
from absl import app, flags

from speech2text_tpu.config import backup_config, load_config, override
from speech2text_tpu.tasks import TaskFactory
from speech2text_tpu.tools.spm_train import spm_training_preprocess
from speech2text_tpu.train import Trainer
from speech2text_tpu.utils.logging import get_logger, init_logging

FLAGS = flags.FLAGS
flags.DEFINE_string("training_config", None, "YAML of Training setup.")
flags.DEFINE_multi_string("override", [], "dotted-key config overrides")
flags.DEFINE_integer("max_steps", None, "optional step cap (smoke runs)")
flags.mark_flag_as_required("training_config")


def run_task(argv):
    from speech2text_tpu.utils.cache import \
        enable_persistent_compilation_cache
    enable_persistent_compilation_cache()

    del argv
    config = load_config(FLAGS.training_config)
    for ov in FLAGS.override:
        key, _, value = ov.partition("=")
        override(config, key, value)

    task_section = config["task"]
    workdir = os.path.join(task_section["export_path"], task_section["name"])
    os.makedirs(workdir, exist_ok=True)
    init_logging(os.path.join(workdir, "run.log"))
    log = get_logger()

    seed = int(config.get("seed", 1234))
    random.seed(seed)
    np.random.seed(seed)
    # rbg PRNG by default: threefry dropout-key generation costs
    # ~7 ms/step on the v5e flagship (see bench.py); override with
    # trainer.prng_impl: threefry for bit-reproducibility with older runs
    import jax as _jax
    trainer_cfg = config.get("trainer", {}) or {}
    _jax.config.update("jax_default_prng_impl",
                       trainer_cfg.get("prng_impl", "rbg"))
    # trainer.platform: cpu pins the host backend (smoke/CI runs beside a
    # busy TPU). NOTE the JAX_PLATFORMS env var is ignored by the axon
    # plugin; this config update is the only reliable pin.
    if trainer_cfg.get("platform"):
        _jax.config.update("jax_platforms", str(trainer_cfg["platform"]))

    config = spm_training_preprocess(config)
    # back up the RESOLVED config (post-spm-rewrite) so the workdir yaml is
    # self-contained for inference (reference backs up then rewrites at
    # inference time; we do both — see inference.py spm fallback)
    import yaml
    with open(os.path.join(workdir,
                           os.path.basename(FLAGS.training_config)),
              "w") as f:
        yaml.safe_dump(config, f)
    task_cls = TaskFactory(task_section["type"])
    task = task_cls(config)
    log.info("task %s (%s): vocab=%d", task_section["name"],
             task_section["type"], len(task.tokenizer))

    finetune_params = None
    ft = config.get("finetune") or {}
    base = ft.get("base_model")
    if base:
        from speech2text_tpu.train.checkpoint import (CheckpointManager,
                                                      average_checkpoints)
        if os.path.isdir(base) and os.path.exists(
                os.path.join(base, "index.json")):
            finetune_params = average_checkpoints(
                base, best_k=int(ft.get("best_k", 5)))
        else:
            mgr = CheckpointManager(os.path.dirname(base) or base)
            finetune_params = mgr.restore(mgr.latest_step())["params"]

    # callbacks parity: ComputeGlobalCmvn / LoadGlobalCmvn (reference
    # callbacks/callbacks.py:44-120) and FrontendExport (:20-41)
    cb = config.get("callbacks", {}) or {}
    cmvn_cb = cb.get("global_cmvn", {}) or {}
    if cmvn_cb.get("apply") and getattr(task.cmvn, "mean", None) is None:
        from speech2text_tpu.models.cmvn import (GlobalCmvn,
                                                 compute_cmvn_stats)
        stats_path = cmvn_cb.get("pre_compute_cmvn") or os.path.join(
            workdir, "cmvn.json")
        if not os.path.exists(stats_path):
            log.info("computing global CMVN over the train set ...")
            pipe = task.make_train_pipeline()

            def feat_iter(max_batches=200):
                import numpy as _np
                for i, batch in enumerate(pipe):
                    if i >= max_batches:
                        break
                    import jax.numpy as _jnp

                    from speech2text_tpu.tasks.base import _dequant_pcm
                    feats, lens = task.frontend(_dequant_pcm(
                        _jnp.asarray(batch["pcm"])), batch["pcm_length"])
                    yield _np.asarray(feats), _np.asarray(lens)

            compute_cmvn_stats(feat_iter()).save(stats_path)
        task.cmvn = GlobalCmvn.from_file(stats_path)
        log.info("global CMVN loaded from %s", stats_path)
    if cb.get("frontend_save"):
        from speech2text_tpu.export import export_frontend
        export_frontend(task.frontend, workdir)

    trainer = Trainer(task, config, workdir, seed=seed)
    result = trainer.fit(resume=config.get("resume"),
                         finetune_params=finetune_params,
                         max_steps=FLAGS.max_steps)
    log.info("training done: %s", result)


if __name__ == "__main__":
    app.run(run_task)

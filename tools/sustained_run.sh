#!/usr/bin/env bash
# Sustained-run robustness protocol (VERDICT r4 Next #1):
#   5000-step flagship run, RSS watchdog armed, async checkpoints every
#   500 steps, one mid-run kill + auto-resume restart.
# Produces tasks/<NAME>/{run.log,metrics.jsonl,checkpoints/}; summarize
# into docs/evidence/sustained_r5.md.
#
# Usage: tools/sustained_run.sh [kill_step] [max_steps]
set -u
KILL_STEP=${1:-1200}
MAX_STEPS=${2:-5000}
NAME=${NAME:-sustained_r5}
cd "$(dirname "$0")/.."

launch() {
  python build_task.py \
    --training_config=configs/training/zipformer_stateless_pruned_rnnt.yaml \
    --max_steps="$MAX_STEPS" \
    --override task.name="$NAME" \
    --override trainer.val_check_interval=500 \
    --override trainer.log_interval=10 \
    --override trainer.max_rss_gb="${MAX_RSS_GB:-28}" \
    >> "/tmp/${NAME}.launchlog" 2>&1 &
  echo $! > "/tmp/${NAME}.pid"
  echo "[sustained] launched pid $(cat /tmp/${NAME}.pid)"
}

step_now() {
  # last step recorded in metrics.jsonl (0 if none yet)
  local f="tasks/${NAME}/metrics.jsonl"
  [ -f "$f" ] && tail -1 "$f" | sed -n 's/.*"step": *\([0-9]*\).*/\1/p' || echo 0
}

launch
# ---- phase 1: run until KILL_STEP, then kill abruptly (no SIGKILL —
# killing mid-device-step can wedge the axon device server; SIGTERM is
# still abrupt from the training loop's perspective: no handler exists)
while true; do
  sleep 30
  s=$(step_now); s=${s:-0}
  echo "[sustained] step=$s"
  if ! kill -0 "$(cat /tmp/${NAME}.pid)" 2>/dev/null; then
    echo "[sustained] process exited before kill step"; break
  fi
  if [ "$s" -ge "$KILL_STEP" ]; then
    echo "[sustained] KILLING at step $s ($(date -u +%H:%M:%S))"
    kill "$(cat /tmp/${NAME}.pid)"
    sleep 10
    kill -0 "$(cat /tmp/${NAME}.pid)" 2>/dev/null && \
      kill -9 "$(cat /tmp/${NAME}.pid)" 2>/dev/null
    break
  fi
done
sleep 5
echo "[sustained] restarting (auto-resume from latest checkpoint)"
# ---- phase 2: rerun the SAME command; the trainer auto-resumes from the
# workdir's latest checkpoint (train/loop.py restore_latest)
launch
wait "$(cat /tmp/${NAME}.pid)"
echo "[sustained] done rc=$?; final step $(step_now)"

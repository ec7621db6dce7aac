#!/usr/bin/env bash
# Per-task-family evidence runs on the DISJOINT held-out split
# (docs/evidence/heldout/): multi-hundred-step loss-decreasing training +
# a decode round-trip through the real inference entry for each family
# that has one. Runs on CPU (trainer.platform=cpu) so the TPU stays free.
#
# Usage: tools/run_heldout_evidence.sh [family ...]
#   families: emformer cif nnlm wav2vec2   (default: all)
set -uo pipefail
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_cache}

run_train() { # config name
    local cfg=$1 name=$2
    echo "=== train $name ==="
    python build_task.py --training_config="configs/training/$cfg.yaml" \
        --override task.name="$name" \
        --override trainer.platform=cpu 2>&1 | tail -2
}

run_infer() { # infer_cfg train_yaml name decode_method
    local icfg=$1 tyaml=$2 name=$3
    echo "=== infer $name ==="
    python inference.py --inference_config="configs/inference/$icfg.yaml" \
        --override task.platform=cpu \
        --override task.train_config="tasks/$name/$tyaml.yaml" \
        --override task.export_path="test_logs/${name}_train" \
        --override task.chkpt_aver=false \
        --override testset.test_data=/root/repo/docs/evidence/heldout/train.json \
        --override testset.config.batch_size=8 2>&1 | tail -2
}

for fam in "${@:-emformer cif nnlm wav2vec2}"; do :; done
FAMS=${@:-"emformer cif nnlm wav2vec2"}

for fam in $FAMS; do
  case $fam in
    emformer)
      run_train emformer_ctc_heldout emformer_ctc_heldout
      run_infer ctc_greedy_search emformer_ctc_heldout emformer_ctc_heldout
      ;;
    cif)
      run_train conformer_cif_heldout conformer_cif_heldout
      run_infer cif_greedy_search conformer_cif_heldout conformer_cif_heldout
      ;;
    nnlm)
      run_train rnn_lm_heldout rnn_lm_heldout
      ;;
    wav2vec2)
      run_train wav2vec2_ctc_heldout wav2vec2_ctc_heldout
      run_infer ctc_greedy_search wav2vec2_ctc_heldout wav2vec2_ctc_heldout
      ;;
    *) echo "unknown family $fam"; exit 1;;
  esac
done
echo "=== all evidence runs done ==="

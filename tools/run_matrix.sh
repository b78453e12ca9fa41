#!/bin/bash
# Depth-config accuracy matrix on the anchored protocol (VERDICT round-2
# item 5): the reference's committed accuracy_results_all.*.json files carry
# five depth configs (1,1),(2,1),(2,2),(3,1),(3,2) x 3 modalities x 2 beams
# x 2 genomes (reference: analyse_accuracies.py:10-134). This queue fills the
# same matrix for the anchored protocol:
#   - "lambda" role: the reference's committed 2048-6-mer genome set
#     (datasets/ref2048; eval genome test reads)
#   - "ecoli" role: cross-genome transfer — fresh genome drawn from the same
#     base-6-mer vocabulary (datasets/cross2048), like lambda->ecoli shares
#     the full 6-mer vocabulary across real genomes
# Per depth config: joint trained with the full curriculum, raw/event
# warm-started with the short anneal; all evals ride one process per
# (config, modality) via tools/evaluate.py --eval/--beams.
#
# (2,1) reuses the phase-A exports (checkpoints/sweep/ref2048_*).
#
# Usage: nohup bash tools/run_matrix.sh > runs/matrix.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

SHORT='[[0.5, 5e-4, 6, 500], [0.45, 1e-4, 8, 800], [0.4, 7e-5, 6, 800]]'
DS=datasets/ref2048
CROSS=datasets/cross2048
OUT=results/matrix

run() {
  echo "=== $(date +%H:%M:%S) $*"
  "$@" || echo "FAILED ($?): $*"
}

[ -f "$DS/train/files_info.snippets.stride_6.json" ] || \
  run python -u tools/make_dataset.py --out "$DS" --ref-reduced 2048
[ -f "$CROSS/test/files_info.snippets.stride_6.json" ] || \
  run python -u tools/make_dataset.py --out "$CROSS" --cross-from "$DS"

eval_config() {
  local mod=$1 encd=$2 decd=$3 ckpt=$4
  run python -u tools/evaluate.py --checkpoint "$ckpt" \
    --data-type "$mod" --encoder-depth "$encd" --decoder-depth "$decd" \
    --eval "ref2048:$DS/eval/files_info.test.snippets.stride_6.json:$DS/.cache" \
    --eval "cross2048:$CROSS/test/files_info.snippets.stride_6.json:$CROSS/.cache" \
    --beams 5,1 --out-dir "$OUT"
}

train_depth() {
  local encd=$1 decd=$2
  local joint_ckpt=checkpoints/matrix/d${encd}${decd}_joint
  [ -d "$joint_ckpt" ] || \
    run python -u tools/train_curriculum.py --dataset "$DS" --tag "m2048" \
      --data-type joint --encoder-depth "$encd" --decoder-depth "$decd" \
      --export "$joint_ckpt" --workdir "runs/m2048.joint.d${encd}${decd}"
  for mod in raw event; do
    local ck=checkpoints/matrix/d${encd}${decd}_${mod}
    [ -d "$ck" ] || \
      run python -u tools/train_curriculum.py --dataset "$DS" --tag "m2048" \
        --data-type "$mod" --encoder-depth "$encd" --decoder-depth "$decd" \
        --init-from "$joint_ckpt" --stages "$SHORT" \
        --export "$ck" --workdir "runs/m2048.$mod.d${encd}${decd}"
  done
  for mod in joint raw event; do
    eval_config "$mod" "$encd" "$decd" "checkpoints/matrix/d${encd}${decd}_${mod}"
  done
}

# (2,1) from phase A exports
for mod in joint raw event; do
  if [ -d "checkpoints/sweep/ref2048_${mod}" ]; then
    eval_config "$mod" 2 1 "checkpoints/sweep/ref2048_${mod}"
  else
    echo "SKIP (2,1) $mod: phase-A export missing"
  fi
done

train_depth 3 2
train_depth 1 1
train_depth 2 2
train_depth 3 1
echo "=== $(date +%H:%M:%S) matrix queue done"

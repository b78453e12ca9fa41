#!/bin/bash
# Sequential TPU training/eval queue for the reference-anchored difficulty
# sweep (VERDICT round-2 item 1): per committed reduced-vocabulary genome set
# (45/450/1024/2048/4096 distinct 6-mers), train joint with the full
# curriculum, warm-start raw/event from it with a shorter anneal, then
# evaluate all three modalities on the held-out test reads at beam 5 and 1.
#
# Usage: nohup bash tools/run_ref_sweep.sh > runs/queue.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

SHORT='[[0.5, 5e-4, 6, 500], [0.45, 1e-4, 8, 800], [0.4, 7e-5, 6, 800]]'

run() {
  echo "=== $(date +%H:%M:%S) $*"
  "$@" || echo "FAILED ($?): $*"
}

train_set() {
  local v=$1 skip_joint=${2:-0}
  local ds=datasets/ref$v
  [ -f "$ds/train/files_info.snippets.stride_6.json" ] || \
    run python -u tools/make_dataset.py --out "$ds" --ref-reduced "$v"
  if [ "$skip_joint" != 1 ]; then
    run python -u tools/train_curriculum.py --dataset "$ds" --tag "ref$v" \
      --data-type joint --export "checkpoints/sweep/ref${v}_joint" \
      --workdir "runs/ref$v.joint"
  fi
  for mod in raw event; do
    run python -u tools/train_curriculum.py --dataset "$ds" --tag "ref$v" \
      --data-type "$mod" --init-from "checkpoints/sweep/ref${v}_joint" \
      --stages "$SHORT" --export "checkpoints/sweep/ref${v}_${mod}" \
      --workdir "runs/ref$v.$mod"
  done
  for mod in joint raw event; do
    for beam in 5 1; do
      run python -u tools/evaluate.py \
        --checkpoint "checkpoints/sweep/ref${v}_${mod}" \
        --files-info "$ds/eval/files_info.test.snippets.stride_6.json" \
        --data-type "$mod" --beam "$beam" --tag "ref$v" \
        --out-dir results/ref_sweep --cache-dir "$ds/.cache"
    done
  done
}

# ref45's joint model is trained by the round's feasibility run; skip it if
# its export exists already
if [ -d checkpoints/sweep/ref45_joint ]; then
  train_set 45 1
else
  train_set 45 0
fi
train_set 2048
train_set 450
train_set 1024
train_set 4096
echo "=== $(date +%H:%M:%S) sweep queue done"

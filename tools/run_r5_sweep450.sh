#!/bin/bash
# Round-5 rebuild of the 450/1024 sweep rows. Their round-2 datasets and
# checkpoints were cleaned for disk space and were never committed, so the
# arbitrated-fold regeneration (VERDICT r4 item 1) retrains them with the
# EXACT original recipe (tools/run_ref_sweep.sh): committed reduced FASTA
# genomes, noisy profile, joint full curriculum + raw/event warm-started
# with the short anneal. Usage:
#   nohup bash tools/run_r5_sweep450.sh <wait_pid> > runs/r5_sweep450.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
source tools/queue_lib.sh

PROFILE=${PROFILE:-noisy}
SHORT='[[0.5, 5e-4, 6, 500], [0.45, 1e-4, 8, 800], [0.4, 7e-5, 6, 800]]'
WAIT_PID=${1:-}

run() {
  echo "=== $(date +%H:%M:%S) $*"
  "$@" || echo "FAILED ($?): $*"
}

# ---- dataset regeneration (CPU) ----
for spec in "450 75" "1024 150"; do
  set -- $spec
  v=$1; reads=$2; ds=datasets/ref$v
  [ -f "$ds/train/files_info.snippets.stride_6.json" ] || \
    run python -u tools/make_dataset.py --out "$ds" --ref-reduced "$v" \
      --profile "$PROFILE" --train-reads "$reads"
done

# ---- wait for the TPU to free up ----
if [ -n "$WAIT_PID" ]; then
  echo "waiting for pid $WAIT_PID to release the TPU..."
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi

# ---- training (TPU), original sweep recipe ----
for v in 450 1024; do
  ds=datasets/ref$v
  if [ ! -d "checkpoints/sweep/ref${v}_joint" ]; then
    run timeout --kill-after=30 2400 \
      python -u tools/train_curriculum.py --dataset "$ds" --tag "ref$v" \
      --data-type joint --export "checkpoints/sweep/ref${v}_joint" \
      --workdir "runs/ref$v.joint"
  fi
  add_eval --ds "$ds" --tag "ref$v" --mod joint \
    --ckpt "checkpoints/sweep/ref${v}_joint" --out results/ref_sweep \
    --token --round 5
  for mod in raw event; do
    if [ ! -d "checkpoints/sweep/ref${v}_${mod}" ]; then
      run timeout --kill-after=30 2400 \
        python -u tools/train_curriculum.py --dataset "$ds" --tag "ref$v" \
        --data-type "$mod" --init-from "checkpoints/sweep/ref${v}_joint" \
        --stages "$SHORT" --export "checkpoints/sweep/ref${v}_${mod}" \
        --workdir "runs/ref$v.$mod"
    fi
    add_eval --ds "$ds" --tag "ref$v" --mod "$mod" \
      --ckpt "checkpoints/sweep/ref${v}_${mod}" --out results/ref_sweep \
      --token --round 5
  done
done
echo "=== $(date +%H:%M:%S) r5 450/1024 queue done"

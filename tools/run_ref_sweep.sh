#!/bin/bash
# TPU training queue for the reference-anchored difficulty sweep (VERDICT
# round-2 item 1): per committed reduced-vocabulary genome set
# (45/450/1024/2048/4096 distinct 6-mers, /root/reference/data/simulator/
# reduced/), train joint with the full curriculum and warm-start raw/event
# from it with a shorter anneal. Held-out evaluation reads come from the
# SAME (train) genome — the reference's evaluation semantics (its identity
# tables and reduced curve both score held-out reads/splits of the training
# distribution); the committed .eval genomes feed the separate cross/ split.
#
# Evaluations (mapping identity at beams 5/1 on test+cross, plus the
# reference-metric token test accuracy) are appended to the CPU eval
# daemon's manifest (tools/eval_daemon.py) so they overlap TPU training.
#
# PROFILE env var picks the simulator realism rung (default: noisy).
#
# Usage: nohup bash tools/run_ref_sweep.sh > runs/queue.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

PROFILE=${PROFILE:-noisy}
SHORT='[[0.5, 5e-4, 6, 500], [0.45, 1e-4, 8, 800], [0.4, 7e-5, 6, 800]]'

run() {
  echo "=== $(date +%H:%M:%S) $*"
  "$@" || echo "FAILED ($?): $*"
}

add_eval_jobs() {
  local v=$1 mod=$2
  python - "$v" "$mod" <<'EOF'
import json, sys
v, mod = sys.argv[1], sys.argv[2]
ds = f"datasets/ref{v}"
test = f"ref{v}:{ds}/eval/files_info.test.snippets.stride_6.json:{ds}/.cache"
cross = f"ref{v}cross:{ds}/cross/files_info.snippets.stride_6.json:{ds}/.cache"
base = {"ckpt": f"checkpoints/sweep/ref{v}_{mod}", "data_type": mod,
        "encd": 2, "decd": 1, "out_dir": "results/ref_sweep"}
jobs = [dict(base, evals=[test, cross], beams="5,1"),
        dict(base, kind="token_acc", evals=[test])]
with open("runs/eval_manifest.jsonl", "a") as f:
    for j in jobs:
        f.write(json.dumps(j) + "\n")
EOF
}

train_set() {
  local v=$1 reads=$2 init=${3:-}
  local ds=datasets/ref$v
  local iargs=()
  # the full-vocabulary set does not escape the unigram plateau from
  # scratch even teacher-forced (loss pins at ln(4)); it warm-starts from
  # the previous difficulty level — the reference's own run-chaining
  # pattern (rename_models.py epoch chaining)
  [ -n "$init" ] && iargs=(--init-from "$init")
  [ -f "$ds/train/files_info.snippets.stride_6.json" ] || \
    run python -u tools/make_dataset.py --out "$ds" --ref-reduced "$v" \
      --profile "$PROFILE" --train-reads "$reads"
  if [ ! -d "checkpoints/sweep/ref${v}_joint" ]; then
    run python -u tools/train_curriculum.py --dataset "$ds" --tag "ref$v" \
      --data-type joint --export "checkpoints/sweep/ref${v}_joint" \
      "${iargs[@]}" --workdir "runs/ref$v.joint"
  fi
  add_eval_jobs "$v" joint
  for mod in raw event; do
    if [ ! -d "checkpoints/sweep/ref${v}_${mod}" ]; then
      run python -u tools/train_curriculum.py --dataset "$ds" --tag "ref$v" \
        --data-type "$mod" --init-from "checkpoints/sweep/ref${v}_joint" \
        --stages "$SHORT" --export "checkpoints/sweep/ref${v}_${mod}" \
        --workdir "runs/ref$v.$mod"
    fi
    add_eval_jobs "$v" "$mod"
  done
}

# read counts: ~8x coverage with a floor of 48 so the small genomes still
# see enough distinct noise draws to generalize across reads
train_set 2048 150
train_set 45 48
train_set 450 75
train_set 1024 150
train_set 4096 300 checkpoints/sweep/ref2048_joint
echo "=== $(date +%H:%M:%S) sweep queue done"

#!/bin/bash
# Depth-config accuracy matrix on the anchored protocol (VERDICT round-2
# item 5): the reference's committed accuracy_results_all.*.json files carry
# five depth configs (1,1),(2,1),(2,2),(3,1),(3,2) x 3 modalities x 2 beams
# x 2 genomes (reference: analyse_accuracies.py:10-134). This queue fills the
# same matrix for the anchored protocol on the reference's committed
# 2048-6-mer genome set:
#   - "lambda" role: held-out reads of the train genome (datasets/ref2048
#     test split — the reference's lambda-test semantics: same genome,
#     unseen reads)
#   - "ecoli" role: the committed .eval genome's reads (datasets/ref2048
#     cross split — cross-genome transfer, the lambda->ecoli analog)
# Per depth config: joint trained with the full curriculum, raw/event
# warm-started with the short anneal. Evaluations ride the CPU eval daemon.
#
# (2,1) reuses the phase-A sweep exports (checkpoints/sweep/ref2048_*).
#
# Usage: nohup bash tools/run_matrix.sh > runs/matrix.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

SHORT='[[0.5, 5e-4, 6, 500], [0.45, 1e-4, 8, 800], [0.4, 7e-5, 6, 800]]'
# non-flagship depth configs use a ~40% shorter full curriculum (same stage
# structure) — the matrix reads TRENDS across depth, not peak numbers
JOINT_SHORT='[[1.0, 2e-3, 6, 500], [0.5, 5e-4, 8, 500], [0.45, 1e-4, 8, 800], [0.4, 7e-5, 6, 800]]'
DS=datasets/ref2048

run() {
  echo "=== $(date +%H:%M:%S) $*"
  "$@" || echo "FAILED ($?): $*"
}

add_eval_jobs() {
  local mod=$1 encd=$2 decd=$3 ckpt=$4
  python - "$mod" "$encd" "$decd" "$ckpt" <<'EOF'
import json, sys
mod, encd, decd, ckpt = sys.argv[1:5]
ds = "datasets/ref2048"
test = f"m2048:{ds}/eval/files_info.test.snippets.stride_6.json:{ds}/.cache"
cross = f"m2048cross:{ds}/cross/files_info.snippets.stride_6.json:{ds}/.cache"
job = {"ckpt": ckpt, "data_type": mod, "encd": int(encd), "decd": int(decd),
       "out_dir": "results/matrix", "evals": [test, cross], "beams": "5,1"}
with open("runs/eval_manifest.jsonl", "a") as f:
    f.write(json.dumps(job) + "\n")
EOF
}

train_depth() {
  local encd=$1 decd=$2 jstages=${3:-}
  local joint_ckpt=checkpoints/matrix/d${encd}${decd}_joint
  local jargs=()
  [ -n "$jstages" ] && jargs=(--stages "$jstages")
  [ -d "$joint_ckpt" ] || \
    run python -u tools/train_curriculum.py --dataset "$DS" --tag "m2048" \
      --data-type joint --encoder-depth "$encd" --decoder-depth "$decd" \
      --sweep-epochs 6 "${jargs[@]}" \
      --export "$joint_ckpt" --workdir "runs/m2048.joint.d${encd}${decd}"
  add_eval_jobs joint "$encd" "$decd" "$joint_ckpt"
  for mod in raw event; do
    local ck=checkpoints/matrix/d${encd}${decd}_${mod}
    [ -d "$ck" ] || \
      run python -u tools/train_curriculum.py --dataset "$DS" --tag "m2048" \
        --data-type "$mod" --encoder-depth "$encd" --decoder-depth "$decd" \
        --init-from "$joint_ckpt" --stages "$SHORT" \
        --export "$ck" --workdir "runs/m2048.$mod.d${encd}${decd}"
    add_eval_jobs "$mod" "$encd" "$decd" "$ck"
  done
}

# (2,1) from the phase-A sweep exports (same dataset, same curriculum)
for mod in joint raw event; do
  if [ -d "checkpoints/sweep/ref2048_${mod}" ]; then
    add_eval_jobs "$mod" 2 1 "checkpoints/sweep/ref2048_${mod}"
  else
    echo "SKIP (2,1) $mod: phase-A export missing"
  fi
done

train_depth 3 2
train_depth 1 1 "$JOINT_SHORT"
train_depth 2 2 "$JOINT_SHORT"
train_depth 3 1 "$JOINT_SHORT"
echo "=== $(date +%H:%M:%S) matrix queue done"

#!/bin/bash
# Fill the three depth-matrix rows missing from results/MATRIX.md —
# (1,1), (2,2), (3,1) — on the anchored ref2048 protocol (VERDICT round-2
# item 5; see tools/run_matrix.sh for the full-queue provenance). The (3,2)
# and (2,1) rows are already committed; (3,2) event is re-trained separately
# (tools/fix_d32_event.sh lineage) because its original short anneal ended
# mid-recovery.
#
# Usage: nohup bash tools/run_matrix_fill.sh > runs/matrix_fill.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

SHORT='[[0.5, 5e-4, 6, 500], [0.45, 1e-4, 8, 800], [0.4, 7e-5, 6, 800]]'
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
  local encd=$1 decd=$2
  local joint_ckpt=checkpoints/matrix/d${encd}${decd}_joint
  [ -d "$joint_ckpt" ] || \
    run python -u tools/train_curriculum.py --dataset "$DS" --tag "m2048" \
      --data-type joint --encoder-depth "$encd" --decoder-depth "$decd" \
      --sweep-epochs 6 --stages "$JOINT_SHORT" \
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

train_depth 1 1
train_depth 2 2
train_depth 3 1
echo "=== $(date +%H:%M:%S) matrix fill done"

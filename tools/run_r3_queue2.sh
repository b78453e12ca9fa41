#!/bin/bash
# Round-3 follow-up TPU queue (runs after tools/run_r3_queue.sh completes).
#
#   1. ref4096c joint anneal extension: the 65-epoch run ends with merged
#      reads at ~58-63 valid identity — just under the seed-match cliff of
#      the read-level mapper (below ~65% identity, 15-mer seeds become too
#      rare to chain, so reads count invalid). Scheduled-sampling annealing
#      is the lever that moved identity 0 -> 30 in the last 6 epochs of the
#      main run; extend it (tf 0.4 -> 0.3, 30 more epochs).
#   2. ref45 set retrain (datasets rebuilt; round-2 checkpoints deleted):
#      needed to demonstrate the positional-prior merger fix on the
#      repetitive 45-6-mer genome (round-2: identity 54.6 at 0.988 token
#      accuracy) and to refresh the sweep row with full data coverage.
#   3. Sweep-row refresh evals: the matrix3 (2,1) cells are the exact
#      ref2048 sweep-row config trained with the generator fix — queue
#      sweep-tagged evals of them so the 2048 row is re-earned too.
#
# Usage: setsid bash tools/run_r3_queue2.sh > runs/r3_queue2.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

echo "waiting for the main r3 queue to finish..."
while ! grep -q "r3 queue done" runs/r3_queue.log 2>/dev/null; do sleep 60; done

DS4=datasets/ref4096b
DS45=datasets/ref45
EXT='[[0.4,7e-5,10,1000],[0.35,5e-5,10,1000],[0.3,3e-5,10,1000]]'
SHORT='[[0.5, 5e-4, 6, 500], [0.45, 1e-4, 8, 800], [0.4, 7e-5, 6, 800]]'

run() {
  echo "=== $(date +%H:%M:%S) $*"
  "$@" || echo "FAILED ($?): $*"
}

add_eval() {  # add_eval <dataset> <tag> <mod> <encd> <decd> <ckpt> <outdir> [token]
  python - "$@" <<'EOF'
import json, sys
ds, tag, mod, encd, decd, ckpt, outdir = sys.argv[1:8]
token = len(sys.argv) > 8 and sys.argv[8] == "token"
test = f"{tag}:{ds}/eval/files_info.test.snippets.stride_6.json:{ds}/.cache"
cross = f"{tag}cross:{ds}/cross/files_info.snippets.stride_6.json:{ds}/.cache"
base = {"ckpt": ckpt, "data_type": mod, "encd": int(encd), "decd": int(decd),
        "out_dir": outdir}
with open("runs/eval_manifest.jsonl", "a") as f:
    f.write(json.dumps(dict(base, evals=[test, cross], beams="5,1")) + "\n")
    if token:
        f.write(json.dumps(dict(base, kind="token_acc", evals=[test])) + "\n")
EOF
}

# ---- 1. 4096 joint anneal extension ----
ck=checkpoints/sweep/ref4096d_joint
[ -d "$ck" ] || \
  run python -u tools/train_curriculum.py --dataset "$DS4" --tag ref4096d \
    --data-type joint --encoder-depth 3 --decoder-depth 2 \
    --stages "$EXT" --sweep-epochs 14 \
    --init-from checkpoints/sweep/ref4096c_joint \
    --export "$ck" --workdir runs/ref4096d.joint
add_eval "$DS4" ref4096c joint 3 2 "$ck" results/ref_sweep token

# ---- 2. ref45 retrain: joint full curriculum, raw/event short-anneal ----
jck=checkpoints/sweep/ref45_joint
[ -d "$jck" ] || \
  run python -u tools/train_curriculum.py --dataset "$DS45" --tag ref45 \
    --data-type joint --sweep-epochs 5 \
    --export "$jck" --workdir runs/r3.ref45.joint
add_eval "$DS45" ref45 joint 2 1 "$jck" results/ref_sweep token
for mod in raw event; do
  ck=checkpoints/sweep/ref45_${mod}
  [ -d "$ck" ] || \
    run python -u tools/train_curriculum.py --dataset "$DS45" --tag ref45 \
      --data-type "$mod" --init-from "$jck" --stages "$SHORT" \
      --sweep-epochs 5 \
      --export "$ck" --workdir "runs/r3.ref45.$mod"
  add_eval "$DS45" ref45 "$mod" 2 1 "$ck" results/ref_sweep token
done

# ---- 3. 2048 sweep-row refresh from the matrix3 (2,1) cells ----
for mod in joint raw event; do
  ck=checkpoints/matrix3/d21_${mod}
  [ -d "$ck" ] && add_eval datasets/ref2048 ref2048 "$mod" 2 1 "$ck" results/ref_sweep token
done

echo "=== $(date +%H:%M:%S) r3 queue2 done"

#!/bin/bash
# Round-3 TPU training queue (serialized on the single chip).
#
# Everything round 2 trained was crippled by the truncated-epoch generator
# bug (fixed in ravvent_tpu/data/generator.py::steps — training only ever
# saw the first steps_per_epoch batches of a fixed, never-reshuffled plan),
# so this queue re-earns the experimental record with full data coverage
# and EQUAL budgets per cell:
#
#   1. ref4096c raw/event (3,2) — complete the round-3 full-vocabulary row
#      (joint runs first via tools/run_ref4096_r3.sh)
#   2. depth matrix: 5 depth configs x 3 modalities, each trained from
#      scratch with the identical default curriculum (equal budgets — the
#      round-2 matrix's non-monotone middle was budget-confounded)
#   3. RNN-type ablation: gru/lstm/bigru/bilstm raw (2,1) on the anchored
#      2048 set, same curriculum (VERDICT r2 item 3; the bilstm cell is the
#      matrix (2,1) raw cell)
#
# Mapping/token evals ride the CPU eval daemon (runs/eval_manifest.jsonl).
# Usage: setsid bash tools/run_r3_queue.sh > runs/r3_queue.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

DS2=datasets/ref2048
DS4=datasets/ref4096b
STAGES4='[[1.0,1e-3,15,1000],[1.0,5e-4,15,1000],[0.5,2e-4,15,1000],[0.45,1e-4,10,1000],[0.4,7e-5,10,1000]]'

run() {
  echo "=== $(date +%H:%M:%S) $*"
  "$@" || echo "FAILED ($?): $*"
}

add_eval() {  # add_eval <dataset> <tag> <mod> <encd> <decd> <ckpt> <outdir> [rnn] [token]
  python - "$@" <<'EOF'
import json, sys
ds, tag, mod, encd, decd, ckpt, outdir = sys.argv[1:8]
rnn = sys.argv[8] if len(sys.argv) > 8 else "bilstm"
token = len(sys.argv) > 9 and sys.argv[9] == "token"
test = f"{tag}:{ds}/eval/files_info.test.snippets.stride_6.json:{ds}/.cache"
cross = f"{tag}cross:{ds}/cross/files_info.snippets.stride_6.json:{ds}/.cache"
base = {"ckpt": ckpt, "data_type": mod, "encd": int(encd), "decd": int(decd),
        "rnn": rnn, "out_dir": outdir}
with open("runs/eval_manifest.jsonl", "a") as f:
    f.write(json.dumps(dict(base, evals=[test, cross], beams="5,1")) + "\n")
    if token:
        f.write(json.dumps(dict(base, kind="token_acc", evals=[test])) + "\n")
EOF
}

# ---- 1. wait for the running ref4096c joint, then raw/event (3,2) ----
echo "waiting for ref4096c joint export..."
while [ ! -d checkpoints/sweep/ref4096c_joint ]; do sleep 30; done
add_eval "$DS4" ref4096c joint 3 2 checkpoints/sweep/ref4096c_joint results/ref_sweep bilstm token

for mod in raw event; do
  ck=checkpoints/sweep/ref4096c_${mod}
  [ -d "$ck" ] || \
    run python -u tools/train_curriculum.py --dataset "$DS4" --tag ref4096c \
      --data-type "$mod" --encoder-depth 3 --decoder-depth 2 \
      --stages "$STAGES4" --sweep-epochs 8 \
      --init-from "checkpoints/best.${mod}32" \
      --export "$ck" --workdir "runs/ref4096c.$mod"
  add_eval "$DS4" ref4096c "$mod" 3 2 "$ck" results/ref_sweep bilstm token
done

# ---- 2. depth matrix, equal budgets, from scratch ----
matrix_cell() {
  local encd=$1 decd=$2 mod=$3
  local ck=checkpoints/matrix3/d${encd}${decd}_${mod}
  [ -d "$ck" ] || \
    run python -u tools/train_curriculum.py --dataset "$DS2" --tag m2048 \
      --data-type "$mod" --encoder-depth "$encd" --decoder-depth "$decd" \
      --sweep-epochs 5 \
      --export "$ck" --workdir "runs/m3.$mod.d${encd}${decd}"
  add_eval "$DS2" m2048 "$mod" "$encd" "$decd" "$ck" results/matrix
}

# flagship-relevant cells first, then the round-2 collapsed (1,1) trio
for d in "2 1" "3 2" "1 1" "2 2" "3 1"; do
  for mod in joint raw event; do
    matrix_cell $d "$mod"
  done
done

# ---- 3. RNN-type ablation (raw, (2,1), anchored 2048 set) ----
for rnn in gru lstm bigru bilstm; do
  ck=checkpoints/ablation3/${rnn}_raw
  [ -d "$ck" ] || \
    run python -u tools/train_curriculum.py --dataset "$DS2" --tag abl \
      --data-type raw --rnn-type "$rnn" --sweep-epochs 5 \
      --export "$ck" --workdir "runs/abl3.$rnn"
  python - "$rnn" <<'EOF'
import json, sys
rnn = sys.argv[1]
ds = "datasets/ref2048"
test = f"abl_{rnn}:{ds}/eval/files_info.test.snippets.stride_6.json:{ds}/.cache"
base = {"ckpt": f"checkpoints/ablation3/{rnn}_raw", "data_type": "raw",
        "encd": 2, "decd": 1, "rnn": rnn, "out_dir": "results/ablation"}
with open("runs/eval_manifest.jsonl", "a") as f:
    f.write(json.dumps(dict(base, kind="token_acc", evals=[test])) + "\n")
    f.write(json.dumps(dict(base, evals=[test], beams="5")) + "\n")
EOF
done

echo "=== $(date +%H:%M:%S) r3 queue done"

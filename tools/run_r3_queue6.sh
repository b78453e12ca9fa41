#!/bin/bash
# Round-3 session-2 continuation queue (replaces the tail of queue5,
# reordered after the ref4096d joint results landed: the raw modality is
# the closest to clearing the headline invalid<50% bar — its c-lineage
# checkpoint already maps 3/6 held-out reads — so its anneal extension
# moves ahead of the ref45/matrix work).
#
#   0. wait for the orphaned queue5 ablation run (bigru) to export
#   1. remaining RNN-type ablation runs (gru/lstm/bilstm)
#   2. ref4096d raw anneal extension
#   3. ref45 retrain (joint + raw/event anneals)
#   4. matrix3 (1,1) trio
#   5. matrix3 (3,2) raw/event warm-anneals
#
# Usage: setsid bash tools/run_r3_queue6.sh > runs/r3_queue6.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

DS2=datasets/ref2048
DS4=datasets/ref4096b
DS45=datasets/ref45
ANEXT='[[0.4,7e-5,10,1000],[0.35,5e-5,10,1000],[0.3,3e-5,10,1000]]'
SHORT='[[0.5, 5e-4, 6, 500], [0.45, 1e-4, 8, 800], [0.4, 7e-5, 6, 800]]'

run() {
  echo "=== $(date +%H:%M:%S) $*"
  "$@" || echo "FAILED ($?): $*"
}

add_eval() {  # add_eval <dataset> <tag> <mod> <encd> <decd> <ckpt> <outdir> [rnn] [token|tokenonly]
  python - "$@" <<'EOF'
import json, sys
ds, tag, mod, encd, decd, ckpt, outdir = sys.argv[1:8]
rnn = sys.argv[8] if len(sys.argv) > 8 else "bilstm"
token = len(sys.argv) > 9 and sys.argv[9] in ("token", "tokenonly")
tokenonly = len(sys.argv) > 9 and sys.argv[9] == "tokenonly"
test = f"{tag}:{ds}/eval/files_info.test.snippets.stride_6.json:{ds}/.cache"
cross = f"{tag}cross:{ds}/cross/files_info.snippets.stride_6.json:{ds}/.cache"
base = {"ckpt": ckpt, "data_type": mod, "encd": int(encd), "decd": int(decd),
        "rnn": rnn, "out_dir": outdir}
with open("runs/eval_manifest.jsonl", "a") as f:
    if not tokenonly:
        f.write(json.dumps(dict(base, evals=[test, cross], beams="5,1")) + "\n")
    if token:
        f.write(json.dumps(dict(base, kind="token_acc", evals=[test])) + "\n")
EOF
}

abl_eval() {
  python - "$1" <<'EOF'
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
}

# ---- 0. wait for the orphaned bigru run from queue5 ----
# (PID passed as $1; falls through if it already exited)
BIGRU_PID=${1:-0}
echo "waiting for bigru export (orphaned queue5 run, pid $BIGRU_PID)..."
while [ "$BIGRU_PID" != 0 ] && kill -0 "$BIGRU_PID" 2>/dev/null; do
  sleep 20
done
sleep 5

# ---- 1. remaining ablation runs ----
abl_eval bigru
for rnn in gru lstm; do
  ck=checkpoints/ablation3/${rnn}_raw
  [ -d "$ck" ] || \
    run python -u tools/train_curriculum.py --dataset "$DS2" --tag abl \
      --data-type raw --rnn-type "$rnn" --sweep-epochs 5 \
      --export "$ck" --workdir "runs/abl3.$rnn"
  abl_eval "$rnn"
done
# bilstm cell = the committed matrix3 (2,1) raw checkpoint: identical
# protocol (same dataset, default curriculum, sweep-5 selection), so the
# matrix cell IS the bilstm ablation run (as in queue1's design).
[ -d checkpoints/ablation3 ] || mkdir -p checkpoints/ablation3
[ -e checkpoints/ablation3/bilstm_raw ] || cp -r checkpoints/matrix3/d21_raw checkpoints/ablation3/bilstm_raw
abl_eval bilstm

# ---- 2. ref4096d raw anneal extension ----
ck=checkpoints/sweep/ref4096d_raw
[ -d "$ck" ] || \
  run python -u tools/train_curriculum.py --dataset "$DS4" --tag ref4096draw \
    --data-type raw --encoder-depth 3 --decoder-depth 2 \
    --stages "$ANEXT" --sweep-epochs 14 \
    --init-from checkpoints/sweep/ref4096c_raw \
    --export "$ck" --workdir runs/ref4096d.raw
add_eval "$DS4" ref4096draw raw 3 2 "$ck" results/ref_sweep bilstm token

# ---- 3. ref45 retrain: joint full curriculum, raw/event short-anneal ----
jck=checkpoints/sweep/ref45_joint
[ -d "$jck" ] || \
  run python -u tools/train_curriculum.py --dataset "$DS45" --tag ref45 \
    --data-type joint --sweep-epochs 5 \
    --export "$jck" --workdir runs/r3.ref45.joint
add_eval "$DS45" ref45 joint 2 1 "$jck" results/ref_sweep bilstm token
for mod in raw event; do
  ck=checkpoints/sweep/ref45_${mod}
  [ -d "$ck" ] || \
    run python -u tools/train_curriculum.py --dataset "$DS45" --tag ref45 \
      --data-type "$mod" --init-from "$jck" --stages "$SHORT" \
      --sweep-epochs 5 \
      --export "$ck" --workdir "runs/r3.ref45.$mod"
  add_eval "$DS45" ref45 "$mod" 2 1 "$ck" results/ref_sweep bilstm token
done

# ---- 4. matrix3 (1,1) trio, equal default budget ----
for mod in joint raw event; do
  ck=checkpoints/matrix3/d11_${mod}
  [ -d "$ck" ] || \
    run python -u tools/train_curriculum.py --dataset "$DS2" --tag m2048 \
      --data-type "$mod" --encoder-depth 1 --decoder-depth 1 \
      --sweep-epochs 5 \
      --export "$ck" --workdir "runs/m3.$mod.d11"
  add_eval "$DS2" m2048 "$mod" 1 1 "$ck" results/matrix
done

# ---- 5. matrix3 (3,2) raw/event warm-anneals ----
for mod in raw event; do
  ck=checkpoints/matrix3/d32_${mod}
  [ -d "$ck" ] || \
    run python -u tools/train_curriculum.py --dataset "$DS2" --tag m2048 \
      --data-type "$mod" --encoder-depth 3 --decoder-depth 2 \
      --init-from checkpoints/matrix3/d32_joint --stages "$SHORT" \
      --sweep-epochs 5 \
      --export "$ck" --workdir "runs/m3.$mod.d32"
  add_eval "$DS2" m2048 "$mod" 3 2 "$ck" results/matrix
done

echo "=== $(date +%H:%M:%S) r3 queue6 done"

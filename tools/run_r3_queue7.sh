#!/bin/bash
# Round-3 final TPU queue — manual-control rewrite of queue6's tail after
# two training launches (bigru, lstm) wedged indefinitely in compile on the
# remote-tunnel device (gru and the (3,2) extensions compiled fine; the
# wedge looks like a tunnel-acquisition race, not a model property). Every
# run here is bounded by `timeout` and retried once: a wedge now costs
# minutes, not the session.
#
# Usage: setsid bash tools/run_r3_queue7.sh > runs/r3_queue7.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

DS2=datasets/ref2048
DS4=datasets/ref4096b
DS45=datasets/ref45
ANEXT='[[0.4,7e-5,10,1000],[0.35,5e-5,10,1000],[0.3,3e-5,10,1000]]'
SHORT='[[0.5, 5e-4, 6, 500], [0.45, 1e-4, 8, 800], [0.4, 7e-5, 6, 800]]'

# run_t <timeout_s> <export_ckpt> <train args...>: skip if exported, retry
# once on timeout/failure.
run_t() {
  local t=$1 ck=$2; shift 2
  for attempt in 1 2; do
    [ -d "$ck" ] && return 0
    echo "=== $(date +%H:%M:%S) [try $attempt, timeout ${t}s] $*"
    timeout --kill-after=30 "$t" "$@" && return 0
    echo "=== $(date +%H:%M:%S) attempt $attempt failed/timed out"
    sleep 15
  done
  return 1
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

# ---- 0. bilstm ablation cell = protocol-identical matrix (2,1) raw ----
mkdir -p checkpoints/ablation3
[ -e checkpoints/ablation3/bilstm_raw ] || cp -r checkpoints/matrix3/d21_raw checkpoints/ablation3/bilstm_raw
abl_eval bilstm

# ---- 1. ref4096d raw anneal extension (headline identity bar) ----
ck=checkpoints/sweep/ref4096d_raw
run_t 2700 "$ck" python -u tools/train_curriculum.py --dataset "$DS4" \
  --tag ref4096draw --data-type raw --encoder-depth 3 --decoder-depth 2 \
  --stages "$ANEXT" --sweep-epochs 14 \
  --init-from checkpoints/sweep/ref4096c_raw \
  --export "$ck" --workdir runs/ref4096d.raw
[ -d "$ck" ] && add_eval "$DS4" ref4096draw raw 3 2 "$ck" results/ref_sweep bilstm token

# ---- 2. ref45 retrain (merger-fix demonstration) ----
jck=checkpoints/sweep/ref45_joint
run_t 2100 "$jck" python -u tools/train_curriculum.py --dataset "$DS45" \
  --tag ref45 --data-type joint --sweep-epochs 5 \
  --export "$jck" --workdir runs/r3.ref45.joint
[ -d "$jck" ] && add_eval "$DS45" ref45 joint 2 1 "$jck" results/ref_sweep bilstm token
if [ -d "$jck" ]; then
  for mod in raw event; do
    ck=checkpoints/sweep/ref45_${mod}
    run_t 1500 "$ck" python -u tools/train_curriculum.py --dataset "$DS45" \
      --tag ref45 --data-type "$mod" --init-from "$jck" --stages "$SHORT" \
      --sweep-epochs 5 \
      --export "$ck" --workdir "runs/r3.ref45.$mod"
    [ -d "$ck" ] && add_eval "$DS45" ref45 "$mod" 2 1 "$ck" results/ref_sweep bilstm token
  done
fi

# ---- 3. remaining ablation cells ----
for rnn in lstm bigru; do
  ck=checkpoints/ablation3/${rnn}_raw
  run_t 1800 "$ck" python -u tools/train_curriculum.py --dataset "$DS2" \
    --tag abl --data-type raw --rnn-type "$rnn" --sweep-epochs 5 \
    --export "$ck" --workdir "runs/abl3.$rnn"
  [ -d "$ck" ] && abl_eval "$rnn"
done

# ---- 4. matrix3 (1,1) trio, equal default budget ----
for mod in joint raw event; do
  ck=checkpoints/matrix3/d11_${mod}
  run_t 1800 "$ck" python -u tools/train_curriculum.py --dataset "$DS2" \
    --tag m2048 --data-type "$mod" --encoder-depth 1 --decoder-depth 1 \
    --sweep-epochs 5 \
    --export "$ck" --workdir "runs/m3.$mod.d11"
  [ -d "$ck" ] && add_eval "$DS2" m2048 "$mod" 1 1 "$ck" results/matrix
done

# ---- 5. matrix3 (2,2)/(3,1)/(3,2) raw+event retrains, equal budget ----
for d in "2 2" "3 1" "3 2"; do
  set -- $d
  e=$1; dd=$2
  for mod in joint raw event; do
    ck=checkpoints/matrix3/d${e}${dd}_${mod}
    run_t 2100 "$ck" python -u tools/train_curriculum.py --dataset "$DS2" \
      --tag m2048 --data-type "$mod" --encoder-depth "$e" --decoder-depth "$dd" \
      --sweep-epochs 5 \
      --export "$ck" --workdir "runs/m3.$mod.d${e}${dd}"
    [ -d "$ck" ] && add_eval "$DS2" m2048 "$mod" "$e" "$dd" "$ck" results/matrix
  done
done

# ---- 6. reference-protocol run (round-1 item 7 claim) ----
bash tools/run_protocol.sh || echo "protocol run failed"

echo "=== $(date +%H:%M:%S) r3 queue7 done"

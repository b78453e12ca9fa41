#!/bin/bash
# Round-3 session-2 TPU queue. The previous session trained + committed the
# ref4096c (3,2) full-vocabulary models but the machine was reset before
# their evaluations, the RNN ablation, the ref45 retrain, and the (1,1)
# matrix retrain ran. This queue re-earns those in priority order:
#
#   1. ref4096tf: teacher-forced-stage extension from the committed
#      ref4096c joint export. The reference-curve metric is teacher-forced
#      token accuracy; scheduled-sampling annealing trades ~0.05 of it for
#      free-running decode quality (docs/TRAINING.md), so the tf metric is
#      measured at a tf-trained checkpoint (ref bar: joint 0.782).
#   2. ref4096d: anneal extension (tf 0.4 -> 0.3) from the same export —
#      the lever that moved mapped identity in the main run's final stage
#      (headline bar: invalid reads < 50%).
#   3. RNN-type ablation: gru/lstm/bigru/bilstm raw (2,1), anchored 2048
#      set, identical default curriculum (VERDICT r2 item 3).
#   4. ref45 retrain (joint + raw/event anneals): demonstrates the
#      positional-prior merger fix on the repetitive 45-6-mer genome
#      (round 2: identity 54.6 at 0.988 token accuracy).
#   5. matrix3 (1,1) trio, equal default budget (round-2 cells collapsed
#      at beam 1 from shortened curricula).
#
# Mapping/token evals ride the CPU eval daemon (runs/eval_manifest.jsonl).
# Usage: setsid bash tools/run_r3_queue5.sh > runs/r3_queue5.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

DS2=datasets/ref2048
DS4=datasets/ref4096b
DS45=datasets/ref45
TFEXT='[[1.0,5e-4,15,1000],[1.0,2e-4,10,1000]]'
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

# ---- 1. ref4096tf: tf-stage extension (token-acc metric checkpoint) ----
ck=checkpoints/sweep/ref4096tf_joint
[ -d "$ck" ] || \
  run python -u tools/train_curriculum.py --dataset "$DS4" --tag ref4096tf \
    --data-type joint --encoder-depth 3 --decoder-depth 2 \
    --stages "$TFEXT" --sweep-epochs 0 \
    --init-from checkpoints/sweep/ref4096c_joint \
    --export "$ck" --workdir runs/ref4096tf.joint
add_eval "$DS4" ref4096tf joint 3 2 "$ck" results/ref_sweep bilstm tokenonly

# ---- 2. ref4096d: anneal extension (identity checkpoint) ----
ck=checkpoints/sweep/ref4096d_joint
[ -d "$ck" ] || \
  run python -u tools/train_curriculum.py --dataset "$DS4" --tag ref4096d \
    --data-type joint --encoder-depth 3 --decoder-depth 2 \
    --stages "$ANEXT" --sweep-epochs 14 \
    --init-from checkpoints/sweep/ref4096c_joint \
    --export "$ck" --workdir runs/ref4096d.joint
add_eval "$DS4" ref4096d joint 3 2 "$ck" results/ref_sweep bilstm token

# ---- 3. RNN-type ablation (raw, (2,1), anchored 2048 set) ----
for rnn in bigru gru lstm bilstm; do
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

# ---- 4. ref45 retrain: joint full curriculum, raw/event short-anneal ----
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

# ---- 5. matrix3 (1,1) trio, equal default budget ----
for mod in joint raw event; do
  ck=checkpoints/matrix3/d11_${mod}
  [ -d "$ck" ] || \
    run python -u tools/train_curriculum.py --dataset "$DS2" --tag m2048 \
      --data-type "$mod" --encoder-depth 1 --decoder-depth 1 \
      --sweep-epochs 5 \
      --export "$ck" --workdir "runs/m3.$mod.d11"
  add_eval "$DS2" m2048 "$mod" 1 1 "$ck" results/matrix
done

# ---- 6. matrix3 (3,2) raw/event: warm-anneal from the retrained joint ----
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

echo "=== $(date +%H:%M:%S) r3 queue5 done"

# ---- 7. ref4096d raw: anneal extension of the raw modality (queue4 plan) ----
ck=checkpoints/sweep/ref4096d_raw
[ -d "$ck" ] || \
  run python -u tools/train_curriculum.py --dataset "$DS4" --tag ref4096draw \
    --data-type raw --encoder-depth 3 --decoder-depth 2 \
    --stages "$ANEXT" --sweep-epochs 14 \
    --init-from checkpoints/sweep/ref4096c_raw \
    --export "$ck" --workdir runs/ref4096d.raw
add_eval "$DS4" ref4096draw raw 3 2 "$ck" results/ref_sweep bilstm token

echo "=== $(date +%H:%M:%S) r3 queue5 fully done"

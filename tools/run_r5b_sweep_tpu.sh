#!/bin/bash
# Round-5b regeneration of the remaining tables of record under the
# confidence-gated merge fold (results/CONF_GATE.md): reference-sweep rows
# (45/450/1024/2048/4096), RNN ablation, and the protocol run. Same
# backend-uniformity contract as tools/run_r5b_matrix_tpu.sh (TPU engine
# defaults); run it AFTER that script finishes:
#
#   setsid bash tools/run_r5b_sweep_tpu.sh > runs/r5b_sweep.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

run() {
  echo "=== $(date +%H:%M:%S) $*"
  timeout 2400 "$@" || echo "FAILED ($?): $*"
}

# wait for the matrix queue (single TPU chip)
while ! grep -q "r5b matrix regen done" runs/r5b_matrix.log 2>/dev/null; do
  sleep 30
done

evalrow() {  # evalrow DS TAG MOD CKPT OUTDIR [extra args...]
  local ds=$1 tag=$2 mod=$3 ckpt=$4 outdir=$5; shift 5
  run python -u tools/evaluate.py --checkpoint "$ckpt" --data-type "$mod" \
    --beams 5,1 --out-dir "$outdir" \
    --eval "$tag:$ds/eval/files_info.test.snippets.stride_6.json:$ds/.cache" \
    --eval "${tag}cross:$ds/cross/files_info.snippets.stride_6.json:$ds/.cache" \
    "$@"
}

# ---- (3,2) event restart-rule overlay tags (the report overlays m2048rr
# over the m2048 aggregate, so these must be regenerated in the same pass
# or the overlay would reintroduce pre-gate numbers) + seed-23 replicate --
evalrow datasets/ref2048 m2048rr event checkpoints/matrix3/d32_event_rr3 \
  results/matrix --encoder-depth 3 --decoder-depth 2
evalrow datasets/ref2048 m2048s23 event checkpoints/matrix3/d32_event_s23 \
  results/matrix --encoder-depth 3 --decoder-depth 2

# ---- 4096 row (lineage tags; fold_4096_lineage.py re-folds afterward) ----
evalrow datasets/ref4096b ref4096draw raw checkpoints/sweep/ref4096d_raw \
  results/ref_sweep --encoder-depth 3 --decoder-depth 2
evalrow datasets/ref4096b ref4096d joint checkpoints/sweep/ref4096d_joint \
  results/ref_sweep --encoder-depth 3 --decoder-depth 2
# event channel: per-rung detector re-fit (4/8) with its dedicated cache
RAVVENT_ED_W1=4 RAVVENT_ED_W2=8 run python -u tools/evaluate.py \
  --checkpoint checkpoints/diag/ref4096_event_ed48 --data-type event \
  --encoder-depth 3 --decoder-depth 2 --beams 5,1 --out-dir results/ref_sweep \
  --eval "ref4096ed48:datasets/ref4096b/eval/files_info.test.snippets.stride_6.json:datasets/ref4096b/.cache_ed48" \
  --eval "ref4096ed48cross:datasets/ref4096b/cross/files_info.snippets.stride_6.json:datasets/ref4096b/.cache_ed48"
run python -u tools/fold_4096_lineage.py

# ---- 45 row (plain + phase-selection record) ----
for mod in raw event joint; do
  evalrow datasets/ref45 ref45 $mod checkpoints/sweep/ref45_${mod} results/ref_sweep
  evalrow datasets/ref45 ref45b3 $mod checkpoints/sweep/ref45_${mod} \
    results/ref_sweep --n-beams 3
done

# ---- 2048 row (shares the (2,1) matrix checkpoints, sweep tags) ----
for mod in raw event joint; do
  evalrow datasets/ref2048 ref2048 $mod checkpoints/matrix3/d21_${mod} results/ref_sweep
done

# ---- 450 / 1024 rows ----
for v in 450 1024; do
  for mod in raw event joint; do
    evalrow datasets/ref$v ref$v $mod checkpoints/sweep/ref${v}_${mod} results/ref_sweep
  done
done

# ---- 4096 free-running completion-bar checkpoints ----
evalrow datasets/ref4096b ref4096tfraw raw checkpoints/sweep/ref4096tf_raw \
  results/ref_sweep --encoder-depth 3 --decoder-depth 2
evalrow datasets/ref4096b ref4096tfj joint checkpoints/sweep/ref4096tf_joint \
  results/ref_sweep --encoder-depth 3 --decoder-depth 2

# ---- ablation + protocol (held-out test only, beam 5 — the record scope) ----
for rnn in gru lstm bigru bilstm; do
  run python -u tools/evaluate.py --checkpoint checkpoints/ablation3/${rnn}_raw \
    --data-type raw --rnn-type $rnn --beams 5 --out-dir results/ablation \
    --eval "abl_${rnn}:datasets/ref2048/eval/files_info.test.snippets.stride_6.json:datasets/ref2048/.cache"
done
run python -u tools/evaluate.py --checkpoint checkpoints/protocol_joint \
  --data-type joint --beams 5,1 --out-dir results/protocol \
  --eval "proto:datasets/ref2048/eval/files_info.test.snippets.stride_6.json:datasets/ref2048/.cache"

echo "=== $(date +%H:%M:%S) r5b sweep regen done"

#!/bin/bash
# Round-5c: regenerate every table of record under the consecutive-cap
# gate config (0.12, -0.15, 0.25, mc=2) — measured at-or-better than the
# round-5b default in EVERY regime (results/CONF_GATE.md). Results land
# in side directories (results/{matrix,ref_sweep,ablation,protocol}_mc)
# so the committed record stays consistent at any interruption point;
# the default flip + file move + report regeneration happen only after
# this script completes.
#
# Usage: setsid bash tools/run_r5c_regen_tpu.sh > runs/r5c_regen.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

GATE="0.12,-0.15,0.25,2"
DS=datasets/ref2048
TEST=$DS/eval/files_info.test.snippets.stride_6.json
CROSS=$DS/cross/files_info.snippets.stride_6.json
CACHE=$DS/.cache

run() {
  echo "=== $(date +%H:%M:%S) $*"
  timeout 2400 "$@" || echo "FAILED ($?): $*"
}

# ---- matrix ----
for d in 11 21 22 31 32; do
  encd=${d:0:1}; decd=${d:1:1}
  for mod in raw event joint; do
    ckpt=checkpoints/matrix3/d${d}_${mod}
    [ "$d" = "32" ] && [ "$mod" = "event" ] && ckpt=checkpoints/matrix3/d32_event_rr3
    run python -u tools/evaluate.py --checkpoint "$ckpt" \
      --data-type "$mod" --encoder-depth "$encd" --decoder-depth "$decd" \
      --beams 5,1 --out-dir results/matrix_mc --conf-gate "$GATE" \
      --eval "m2048:$TEST:$CACHE" --eval "m2048cross:$CROSS:$CACHE"
  done
done

evalrow() {  # evalrow DS TAG MOD CKPT OUTDIR [extra args...]
  local ds=$1 tag=$2 mod=$3 ckpt=$4 outdir=$5; shift 5
  run python -u tools/evaluate.py --checkpoint "$ckpt" --data-type "$mod" \
    --beams 5,1 --out-dir "$outdir" --conf-gate "$GATE" \
    --eval "$tag:$ds/eval/files_info.test.snippets.stride_6.json:$ds/.cache" \
    --eval "${tag}cross:$ds/cross/files_info.snippets.stride_6.json:$ds/.cache" \
    "$@"
}

# ---- restart-rule overlay + seed-23 replicate tags ----
evalrow datasets/ref2048 m2048rr event checkpoints/matrix3/d32_event_rr3 \
  results/matrix_mc --encoder-depth 3 --decoder-depth 2
evalrow datasets/ref2048 m2048s23 event checkpoints/matrix3/d32_event_s23 \
  results/matrix_mc --encoder-depth 3 --decoder-depth 2

# ---- 4096 row ----
evalrow datasets/ref4096b ref4096draw raw checkpoints/sweep/ref4096d_raw \
  results/ref_sweep_mc --encoder-depth 3 --decoder-depth 2
evalrow datasets/ref4096b ref4096d joint checkpoints/sweep/ref4096d_joint \
  results/ref_sweep_mc --encoder-depth 3 --decoder-depth 2
RAVVENT_ED_W1=4 RAVVENT_ED_W2=8 run python -u tools/evaluate.py \
  --checkpoint checkpoints/diag/ref4096_event_ed48 --data-type event \
  --encoder-depth 3 --decoder-depth 2 --beams 5,1 \
  --out-dir results/ref_sweep_mc --conf-gate "$GATE" \
  --eval "ref4096ed48:datasets/ref4096b/eval/files_info.test.snippets.stride_6.json:datasets/ref4096b/.cache_ed48" \
  --eval "ref4096ed48cross:datasets/ref4096b/cross/files_info.snippets.stride_6.json:datasets/ref4096b/.cache_ed48"
run python -u tools/fold_4096_lineage.py --results-dir results/ref_sweep_mc

# ---- 45 row ----
for mod in raw event joint; do
  evalrow datasets/ref45 ref45 $mod checkpoints/sweep/ref45_${mod} results/ref_sweep_mc
  evalrow datasets/ref45 ref45b3 $mod checkpoints/sweep/ref45_${mod} \
    results/ref_sweep_mc --n-beams 3
done

# ---- 2048 / 450 / 1024 rows ----
for mod in raw event joint; do
  evalrow datasets/ref2048 ref2048 $mod checkpoints/matrix3/d21_${mod} results/ref_sweep_mc
done
for v in 450 1024; do
  for mod in raw event joint; do
    evalrow datasets/ref$v ref$v $mod checkpoints/sweep/ref${v}_${mod} results/ref_sweep_mc
  done
done

# ---- 4096 completion bar ----
evalrow datasets/ref4096b ref4096tfraw raw checkpoints/sweep/ref4096tf_raw \
  results/ref_sweep_mc --encoder-depth 3 --decoder-depth 2
evalrow datasets/ref4096b ref4096tfj joint checkpoints/sweep/ref4096tf_joint \
  results/ref_sweep_mc --encoder-depth 3 --decoder-depth 2

# ---- ablation + protocol ----
for rnn in gru lstm bigru bilstm; do
  run python -u tools/evaluate.py --checkpoint checkpoints/ablation3/${rnn}_raw \
    --data-type raw --rnn-type $rnn --beams 5 --out-dir results/ablation_mc \
    --conf-gate "$GATE" \
    --eval "abl_${rnn}:datasets/ref2048/eval/files_info.test.snippets.stride_6.json:datasets/ref2048/.cache"
done
run python -u tools/evaluate.py --checkpoint checkpoints/protocol_joint \
  --data-type joint --beams 5,1 --out-dir results/protocol_mc \
  --conf-gate "$GATE" \
  --eval "proto:datasets/ref2048/eval/files_info.test.snippets.stride_6.json:datasets/ref2048/.cache"

echo "=== $(date +%H:%M:%S) r5c regen done"

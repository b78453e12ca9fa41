#!/bin/bash
# Round-5b uniform regeneration of the depth x modality matrix under the
# confidence-gated merge fold (the Merger/MappingEvaluator default since
# round 5b; see results/CONF_GATE.md). Runs tools/evaluate.py directly on
# the TPU engine defaults (bf16 memory + fused per-step beam kernel — the
# production configuration; committed hardware-vs-XLA parity is >=99.8%
# token agreement / <=0.06pp identity, docs/PERFORMANCE.md). Every cell of
# each regenerated table is produced by this one script, so each table
# stays backend-uniform; the table provenance lines say "TPU engine
# defaults, round 5b".
#
# Usage: setsid bash tools/run_r5b_matrix_tpu.sh > runs/r5b_matrix.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

DS=datasets/ref2048
TEST=$DS/eval/files_info.test.snippets.stride_6.json
CROSS=$DS/cross/files_info.snippets.stride_6.json
CACHE=$DS/.cache

run() {
  echo "=== $(date +%H:%M:%S) $*"
  timeout 2400 "$@" || echo "FAILED ($?): $*"
}

for d in 11 21 22 31 32; do
  encd=${d:0:1}; decd=${d:1:1}
  for mod in raw event joint; do
    ckpt=checkpoints/matrix3/d${d}_${mod}
    # the (3,2) event record is the restart-rule protocol checkpoint
    # (results/MATRIX.md instability note)
    [ "$d" = "32" ] && [ "$mod" = "event" ] && ckpt=checkpoints/matrix3/d32_event_rr3
    run python -u tools/evaluate.py --checkpoint "$ckpt" \
      --data-type "$mod" --encoder-depth "$encd" --decoder-depth "$decd" \
      --beams 5,1 --out-dir results/matrix \
      --eval "m2048:$TEST:$CACHE" --eval "m2048cross:$CROSS:$CACHE"
  done
done
echo "=== $(date +%H:%M:%S) r5b matrix regen done"

#!/bin/bash
# Round-4 TPU queue — runs after run_r3_queue7.sh finishes (waits on its
# training processes). Targets VERDICT round-3 item 3: the 4096
# free-running bar (one modality with teacher-forced token acc >= 0.78 AND
# invalid <= 50% on held-out noisy 4096 reads, beam-1 nonzero).
#
#   raw:   tf 0.770 / invalid 33% -> push tf with a higher-tf low-lr
#          continuation of the identity-best raw checkpoint.
#   joint: tf 0.808 (tf-extension) but 83% invalid -> deeper scheduled-
#          sampling anneal of the identity-best joint checkpoint.
#
# Uses tools/queue_lib.sh (named-flag add_eval; ADVICE round 3 de-drift).
#
# Usage: setsid bash tools/run_r4_queue.sh > runs/r4_queue.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
source tools/queue_lib.sh

DS4=datasets/ref4096b

# ---- 0. wait for the round-3 queue's TPU work to drain ----
while pgrep -f "run_r3_queue7.sh" > /dev/null 2>&1; do
  echo "=== $(date +%H:%M:%S) waiting for r3 queue7..."
  sleep 120
done
echo "=== $(date +%H:%M:%S) r3 queue drained; starting r4 TPU work"

# ---- 1. 4096 raw: tf-bar push (tf 0.770 -> >= 0.78, keep decode) ----
ck=checkpoints/sweep/ref4096e_raw
run_t 2400 "$ck" python -u tools/train_curriculum.py --dataset "$DS4" \
  --tag ref4096eraw --data-type raw --encoder-depth 3 --decoder-depth 2 \
  --stages '[[0.6, 6e-5, 8, 800], [0.5, 4e-5, 10, 800]]' --sweep-epochs 10 \
  --init-from checkpoints/sweep/ref4096d_raw \
  --export "$ck" --workdir runs/ref4096e.raw
[ -d "$ck" ] && add_eval --ds "$DS4" --tag ref4096eraw --mod raw \
  --ckpt "$ck" --out results/ref_sweep --encd 3 --decd 2 --token

# ---- 2. 4096 joint: deeper anneal (invalid 83% -> <= 50%) ----
ck=checkpoints/sweep/ref4096e_joint
run_t 2400 "$ck" python -u tools/train_curriculum.py --dataset "$DS4" \
  --tag ref4096ejoint --data-type joint --encoder-depth 3 --decoder-depth 2 \
  --stages '[[0.3, 3e-5, 8, 800], [0.25, 2e-5, 10, 800]]' --sweep-epochs 10 \
  --init-from checkpoints/sweep/ref4096d_joint \
  --export "$ck" --workdir runs/ref4096e.joint
[ -d "$ck" ] && add_eval --ds "$DS4" --tag ref4096ejoint --mod joint \
  --ckpt "$ck" --out results/ref_sweep --encd 3 --decd 2 --token

echo "=== $(date +%H:%M:%S) r4 queue done"

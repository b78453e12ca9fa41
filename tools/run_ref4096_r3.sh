#!/bin/bash
# Round-3 attack on the full-vocabulary (4096 6-mer) sweep point.
#
# Round 2's attempts collapsed (token acc 0.418 vs reference 0.782) for a
# now-understood reason: the generator restarted a fixed epoch plan every
# steps_per_epoch batches without reshuffling, so training only ever saw
# ~13% of the 600-read set (fixed in ravvent_tpu/data/generator.py::steps).
# This run combines the fix with the levers the repo's own data proves
# (VERDICT round 2, item 1):
#   - depth (3,2): +11.5 identity over (2,1) on the 2048 set
#   - progressive vocab: warm-start from the 2048-trained (3,2) joint
#     checkpoint (checkpoints/flagship32, val identity 87.6)
#   - longer budget: 65 epochs x 1000 steps ≈ 65k steps (vs 37k before),
#     now covering the full 600-read set every ~6 epochs.
set -u
cd "$(dirname "$0")/.."

DS=datasets/ref4096b
STAGES='[[1.0,1e-3,15,1000],[1.0,5e-4,15,1000],[0.5,2e-4,15,1000],[0.45,1e-4,10,1000],[0.4,7e-5,10,1000]]'

python -u tools/train_curriculum.py --dataset "$DS" --tag ref4096c \
  --data-type joint --encoder-depth 3 --decoder-depth 2 \
  --stages "$STAGES" --sweep-epochs 12 \
  --init-from checkpoints/flagship32 \
  --export checkpoints/sweep/ref4096c_joint \
  --workdir runs/ref4096c.joint
echo "ref4096c joint done"

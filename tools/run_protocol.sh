#!/bin/bash
# Reference-protocol training run (VERDICT round-2 item 7): scheduled
# sampling p=0.5, lr 1e-4, batch 128, FROM SCRATCH — the reference's
# recipe (ravvent.py:14-29: tf=0.5, lr=1e-4, 40 epochs x 10k steps). Run at
# 40 x 2500 steps (100k steps, 12x the budget the round-1 "stalls at the
# unigram plateau" claim was tested at; the full 400k-step protocol does not
# fit this environment's TPU budget alongside the sweep/matrix queues — the
# conclusion is drawn from the 100k-step learning curves, committed as
# runs/protocol.joint/csvlog.*.log + curriculum_summary.json).
#
# Requires datasets/ref2048 (built by tools/run_ref_sweep.sh).
#
# Usage: nohup bash tools/run_protocol.sh > runs/protocol.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

STAGES='[[0.5, 1e-4, 40, 2500]]'

echo "=== $(date +%H:%M:%S) reference-protocol run (tf=0.5 from scratch)"
python -u tools/train_curriculum.py --dataset datasets/ref2048 --tag proto \
  --data-type joint --stages "$STAGES" --sweep-epochs 6 \
  --export checkpoints/protocol_joint --workdir runs/protocol.joint \
  || echo "FAILED ($?)"

python - <<'EOF'
import json
ds = "datasets/ref2048"
test = f"proto:{ds}/eval/files_info.test.snippets.stride_6.json:{ds}/.cache"
base = {"ckpt": "checkpoints/protocol_joint", "data_type": "joint",
        "encd": 2, "decd": 1, "out_dir": "results/protocol"}
with open("runs/eval_manifest.jsonl", "a") as f:
    f.write(json.dumps(dict(base, evals=[test], beams="5")) + "\n")
    f.write(json.dumps(dict(base, kind="token_acc", evals=[test])) + "\n")
EOF
echo "=== $(date +%H:%M:%S) protocol run done"

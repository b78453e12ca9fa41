#!/bin/bash
# Continue the (3,2) event model: the short warm-start anneal ended while
# the model was still recovering (val identity 0 -> 64.6 over its last
# epochs; test landed at 11.5). Continue annealing from the export, then
# re-evaluate (the daemon skips identical manifest lines, so bump v).
set -u
cd "$(dirname "$0")/.."

python -u tools/train_curriculum.py --dataset datasets/ref2048 --tag m2048 \
  --data-type event --encoder-depth 3 --decoder-depth 2 \
  --init-from checkpoints/matrix/d32_event \
  --stages '[[0.45, 1e-4, 8, 800], [0.4, 7e-5, 10, 800]]' \
  --export checkpoints/matrix/d32_event \
  --workdir runs/m2048.event.d32.cont

python - <<'EOF'
import json
ds = "datasets/ref2048"
test = f"m2048:{ds}/eval/files_info.test.snippets.stride_6.json:{ds}/.cache"
cross = f"m2048cross:{ds}/cross/files_info.snippets.stride_6.json:{ds}/.cache"
job = {"ckpt": "checkpoints/matrix/d32_event", "data_type": "event",
       "encd": 3, "decd": 2, "out_dir": "results/matrix",
       "evals": [test, cross], "beams": "5,1", "v": 2}
with open("runs/eval_manifest.jsonl", "a") as f:
    f.write(json.dumps(job) + "\n")
EOF
echo "d32 event continuation done"

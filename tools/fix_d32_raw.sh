#!/bin/bash
# Rebuild the (3,2) raw model with committed evidence: the round-2 session
# that produced MATRIX.md's raw row committed only the held-out beam-5
# per-read JSON; the checkpoint and the cross/beam-1 evidence were lost with
# the scratch volume. Same lineage as tools/fix_d32_event.sh: warm-start the
# (3,2) raw anneal from the committed flagship32 joint and re-run all four
# evaluations through the daemon.
set -u
cd "$(dirname "$0")/.."

python -u tools/train_curriculum.py --dataset datasets/ref2048 --tag m2048 \
  --data-type raw --encoder-depth 3 --decoder-depth 2 \
  --init-from checkpoints/flagship32 \
  --stages '[[0.5, 5e-4, 6, 500], [0.45, 1e-4, 8, 800], [0.4, 7e-5, 10, 800]]' \
  --export checkpoints/matrix/d32_raw \
  --workdir runs/m2048.raw.d32.cont

python - <<'EOF'
import json
ds = "datasets/ref2048"
test = f"m2048:{ds}/eval/files_info.test.snippets.stride_6.json:{ds}/.cache"
cross = f"m2048cross:{ds}/cross/files_info.snippets.stride_6.json:{ds}/.cache"
job = {"ckpt": "checkpoints/matrix/d32_raw", "data_type": "raw",
       "encd": 3, "decd": 2, "out_dir": "results/matrix",
       "evals": [test, cross], "beams": "5,1", "v": 2}
with open("runs/eval_manifest.jsonl", "a") as f:
    f.write(json.dumps(job) + "\n")
EOF
echo "d32 raw rebuild done"

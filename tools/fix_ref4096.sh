#!/bin/bash
# Attack the full-vocabulary (4096 6-mer) sweep point — the one cell far
# below the reference curve (results/REF_SWEEP.md: joint token acc 0.418 vs
# 0.782). The committed ref4096 run's curriculum history shows classic
# memorization: stage-0 teacher-forced train acc climbs to 0.62 while
# val_loss diverges 1.49->2.12 on 150-300 reads (runs/ref4096.joint/
# curriculum_summary.json) — a data-diversity problem, not an optimization
# problem. Epochs are fixed step counts, so 4x the training reads adds
# diversity at identical train wall time (datasets/ref4096b, 600 reads).
# Warm-start from the committed anchored flagship (ref2048 joint, same
# (2,1) config as the sweep row) — the same chaining the original sweep
# used (tools/run_ref_sweep.sh: 4096 warm-starts from ref2048_joint).
set -u
cd "$(dirname "$0")/.."

DS=datasets/ref4096b

python -u tools/train_curriculum.py --dataset "$DS" --tag ref4096b \
  --data-type joint \
  --init-from checkpoints/flagship \
  --export checkpoints/sweep/ref4096b_joint \
  --workdir runs/ref4096b.joint

python - <<'EOF'
import json
ds = "datasets/ref4096b"
test = f"ref4096b:{ds}/eval/files_info.test.snippets.stride_6.json:{ds}/.cache"
cross = f"ref4096bcross:{ds}/cross/files_info.snippets.stride_6.json:{ds}/.cache"
base = {"ckpt": "checkpoints/sweep/ref4096b_joint", "data_type": "joint",
        "encd": 2, "decd": 1, "out_dir": "results/ref_sweep"}
jobs = [dict(base, evals=[test, cross], beams="5,1"),
        dict(base, kind="token_acc", evals=[test])]
with open("runs/eval_manifest.jsonl", "a") as f:
    for j in jobs:
        f.write(json.dumps(j) + "\n")
EOF
echo "ref4096b joint done"

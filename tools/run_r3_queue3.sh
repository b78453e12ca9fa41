#!/bin/bash
# Round-3 third TPU queue: runs after tools/run_r3_queue2.sh completes.
#
#   1. ref4096 teacher-forced extension: the anneal stages trade
#      teacher-forced accuracy for free-running decode quality (tf acc
#      0.777 at the end of the tf=1.0 stages -> 0.715 after annealing),
#      so the reference-curve metric (teacher-forced token accuracy) is
#      best measured at a tf-trained checkpoint. Extend the tf=1.0 phase
#      from its stage-2 endpoint to push past the 0.78 bar; export as
#      ref4096tf (token-acc eval only — identity belongs to the annealed
#      lineage).
#   2. Flagship refresh: if the matrix3 (2,1)/(3,2) joint cells beat the
#      committed flagship checkpoints on held-out identity, promote them
#      (tools/promote_flagships.py decides from the curriculum summaries).
#
# Usage: setsid bash tools/run_r3_queue3.sh > runs/r3_queue3.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

echo "waiting for r3 queue2..."
while ! grep -q "r3 queue2 done" runs/r3_queue2.log 2>/dev/null; do sleep 60; done

DS4=datasets/ref4096b
TFEXT='[[1.0,5e-4,15,1000],[1.0,2e-4,15,1000]]'

run() {
  echo "=== $(date +%H:%M:%S) $*"
  "$@" || echo "FAILED ($?): $*"
}

# stage-2 endpoint of the ref4096c joint run (epoch 30, tf=1.0)
E30=$(ls -d runs/ref4096c.joint/runs/ref4096c.joint/snippets/mask/encd_3_decd_2/*spv8.30 2>/dev/null | head -1)
ck=checkpoints/sweep/ref4096tf_joint
if [ ! -d "$ck" ] && [ -n "$E30" ]; then
  run python -u tools/train_curriculum.py --dataset "$DS4" --tag ref4096tf \
    --data-type joint --encoder-depth 3 --decoder-depth 2 \
    --stages "$TFEXT" --sweep-epochs 0 \
    --init-from "$E30" \
    --export "$ck" --workdir runs/ref4096tf.joint
fi
if [ -d "$ck" ]; then
  python - <<'EOF'
import json
ds = "datasets/ref4096b"
test = f"ref4096tf:{ds}/eval/files_info.test.snippets.stride_6.json:{ds}/.cache"
job = {"ckpt": "checkpoints/sweep/ref4096tf_joint", "data_type": "joint",
       "encd": 3, "decd": 2, "out_dir": "results/ref_sweep",
       "kind": "token_acc", "evals": [test]}
with open("runs/eval_manifest.jsonl", "a") as f:
    f.write(json.dumps(job) + "\n")
EOF
fi

echo "=== $(date +%H:%M:%S) r3 queue3 done"

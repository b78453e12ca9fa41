#!/bin/bash
# Round-3 fourth TPU queue: runs after tools/run_r3_queue3.sh completes.
# Raw-modality 4096 anneal extension (same lever that lifted joint's
# mapped identity in the main run's final stage): tf 0.4 -> 0.3 from the
# ref4096c_raw endpoint. Its evals overwrite the ref4096c raw cells (same
# lineage, deeper anneal).
set -u
cd "$(dirname "$0")/.."

echo "waiting for r3 queue3..."
while ! grep -q "r3 queue3 done" runs/r3_queue3.log 2>/dev/null; do sleep 60; done

DS4=datasets/ref4096b
EXT='[[0.4,7e-5,10,1000],[0.35,5e-5,10,1000],[0.3,3e-5,10,1000]]'

run() {
  echo "=== $(date +%H:%M:%S) $*"
  "$@" || echo "FAILED ($?): $*"
}

ck=checkpoints/sweep/ref4096d_raw
[ -d "$ck" ] || \
  run python -u tools/train_curriculum.py --dataset "$DS4" --tag ref4096draw \
    --data-type raw --encoder-depth 3 --decoder-depth 2 \
    --stages "$EXT" --sweep-epochs 14 \
    --init-from checkpoints/sweep/ref4096c_raw \
    --export "$ck" --workdir runs/ref4096d.raw
python - <<'EOF'
import json
ds = "datasets/ref4096b"
test = f"ref4096c:{ds}/eval/files_info.test.snippets.stride_6.json:{ds}/.cache"
cross = f"ref4096ccross:{ds}/cross/files_info.snippets.stride_6.json:{ds}/.cache"
job = {"ckpt": "checkpoints/sweep/ref4096d_raw", "data_type": "raw",
       "encd": 3, "decd": 2, "out_dir": "results/ref_sweep",
       "evals": [test, cross], "beams": "5,1"}
with open("runs/eval_manifest.jsonl", "a") as f:
    f.write(json.dumps(job) + "\n")
EOF
echo "=== $(date +%H:%M:%S) r3 queue4 done"

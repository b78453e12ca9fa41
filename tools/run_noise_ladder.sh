#!/bin/bash
# Realism ladder (VERDICT round-2 item 2): train the flagship config on the
# reference's committed 2048-6-mer genome set at each rung of the simulator
# realism ladder (clean -> lowpass -> noisy -> dynamic -> harsh; each rung
# adds one family of physical effects, see SimProfile/LADDER in
# ravvent_tpu/data/simulator.py), so the committed noise-sweep table shows
# where identity lands as realism increases and which effect costs what.
# Evaluations are appended to the eval daemon's manifest (CPU side).
#
# Usage: nohup bash tools/run_noise_ladder.sh > runs/ladder.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

run() {
  echo "=== $(date +%H:%M:%S) $*"
  "$@" || echo "FAILED ($?): $*"
}

for p in clean lowpass noisy dynamic harsh; do
  ds=datasets/lad2048_$p
  [ -f "$ds/train/files_info.snippets.stride_6.json" ] || \
    run python -u tools/make_dataset.py --out "$ds" --ref-reduced 2048 \
      --coverage 4 --profile "$p"
  ck=checkpoints/ladder/${p}_joint
  [ -d "$ck" ] || \
    run python -u tools/train_curriculum.py --dataset "$ds" --tag "lad$p" \
      --data-type joint --export "$ck" --workdir "runs/lad2048.$p"
  python - "$p" <<'EOF'
import json, sys
p = sys.argv[1]
job = {
    "ckpt": f"checkpoints/ladder/{p}_joint", "data_type": "joint",
    "encd": 2, "decd": 1, "out_dir": "results/noise_ladder",
    "evals": [
        f"lad{p}:datasets/lad2048_{p}/eval/files_info.test.snippets.stride_6.json:datasets/lad2048_{p}/.cache",
        f"lad{p}cross:datasets/lad2048_{p}/cross/files_info.snippets.stride_6.json:datasets/lad2048_{p}/.cache",
    ],
    "beams": "5,1",
}
with open("runs/eval_manifest.jsonl", "a") as f:
    f.write(json.dumps(job) + "\n")
EOF
done
echo "=== $(date +%H:%M:%S) ladder queue done"

#!/bin/bash
# RNN-type ablation (VERDICT round-2 item 5): gru / lstm / bigru / bilstm,
# raw modality, trained FROM SCRATCH with the identical full curriculum on
# the anchored ref45 set — the reference's ablation reports raw-modality
# test accuracy on its easy reduced-simulator data (reference:
# make_plots.py:113-153: gru 0.833, lstm 0.864, bigru 0.951, bilstm 0.960).
# Token-accuracy evals ride the CPU eval daemon.
#
# Requires datasets/ref45 (built by tools/run_ref_sweep.sh).
#
# Usage: nohup bash tools/run_ablation.sh > runs/ablation.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

DS=datasets/ref45

run() {
  echo "=== $(date +%H:%M:%S) $*"
  "$@" || echo "FAILED ($?): $*"
}

for rnn in gru lstm bigru bilstm; do
  ck=checkpoints/ablation/${rnn}_raw
  [ -d "$ck" ] || \
    run python -u tools/train_curriculum.py --dataset "$DS" --tag "abl" \
      --data-type raw --rnn-type "$rnn" --sweep-epochs 6 \
      --export "$ck" --workdir "runs/abl.$rnn"
  python - "$rnn" <<'EOF'
import json, sys
rnn = sys.argv[1]
ds = "datasets/ref45"
test = f"abl_{rnn}:{ds}/eval/files_info.test.snippets.stride_6.json:{ds}/.cache"
base = {"ckpt": f"checkpoints/ablation/{rnn}_raw", "data_type": "raw",
        "encd": 2, "decd": 1, "rnn": rnn, "out_dir": "results/ablation"}
with open("runs/eval_manifest.jsonl", "a") as f:
    f.write(json.dumps(dict(base, kind="token_acc", evals=[test])) + "\n")
    f.write(json.dumps(dict(base, evals=[test], beams="5")) + "\n")
EOF
done
echo "=== $(date +%H:%M:%S) ablation queue done"

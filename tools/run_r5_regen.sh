#!/bin/bash
# Round-5 uniform regeneration of every table of record under the
# geometry-arbitrated merge fold, now the Merger default (VERDICT r4 item 1:
# the round-4 study measured improvement in all 15 depth x modality cells,
# mean +4.07 points, no regression anywhere — results/ARBITRATION.md).
# Appends eval-daemon jobs; the running daemons drain them on the CPU
# backend. All jobs carry --round 5 (manifest-hash salt) and NO
# geom_arbitration override, so tools/evaluate.py applies the new default.
set -e
cd "$(dirname "$0")/.."
source tools/queue_lib.sh

# manifest-hash salt; bumped to 55 when the length-constrained splice
# (TRIM_SLACK) joined the arbitrated fold mid-round and every job had to
# re-run under the final semantics
ROUND=${ROUND:-55}

DS2048=datasets/ref2048
DS45=datasets/ref45
DS4096=datasets/ref4096b
DS450=datasets/ref450
DS1024=datasets/ref1024

# ---- depth x modality matrix (results/MATRIX.md), both beams + cross ----
for d in 11 21 22 31 32; do
  encd=${d:0:1}; decd=${d:1:1}
  for mod in raw event joint; do
    add_eval --ds $DS2048 --tag m2048 --mod $mod \
      --ckpt checkpoints/matrix3/d${d}_${mod} --out results/matrix \
      --encd $encd --decd $decd --round $ROUND
  done
done
# seed-23 replicate of the (3,2) event instability cell (kept for the note)
add_eval --ds $DS2048 --tag m2048s23 --mod event \
  --ckpt checkpoints/matrix3/d32_event_s23 --out results/matrix \
  --encd 3 --decd 2 --round $ROUND

# ---- reference sweep rows (results/REF_SWEEP.md) ----
# 2048 row = the (2,1) matrix checkpoints under the ref2048 tags
for mod in raw event joint; do
  add_eval --ds $DS2048 --tag ref2048 --mod $mod \
    --ckpt checkpoints/matrix3/d21_${mod} --out results/ref_sweep \
    --encd 2 --decd 1 --round $ROUND
done
# 4096 row of record (ref4096c tags fold: event<-ref4096c, joint<-ref4096d,
# raw<-ref4096draw; tools/fold_4096_lineage.py re-folds after the evals)
add_eval --ds $DS4096 --tag ref4096c --mod event \
  --ckpt checkpoints/sweep/ref4096c_event --out results/ref_sweep \
  --encd 3 --decd 2 --round $ROUND
add_eval --ds $DS4096 --tag ref4096d --mod joint \
  --ckpt checkpoints/sweep/ref4096d_joint --out results/ref_sweep \
  --encd 3 --decd 2 --round $ROUND
add_eval --ds $DS4096 --tag ref4096draw --mod raw \
  --ckpt checkpoints/sweep/ref4096d_raw --out results/ref_sweep \
  --encd 3 --decd 2 --round $ROUND
# free-running completion-bar checkpoints
add_eval --ds $DS4096 --tag ref4096tfraw --mod raw \
  --ckpt checkpoints/sweep/ref4096tf_raw --out results/ref_sweep \
  --encd 3 --decd 2 --round $ROUND
add_eval --ds $DS4096 --tag ref4096tfj --mod joint \
  --ckpt checkpoints/sweep/ref4096tf_joint --out results/ref_sweep \
  --encd 3 --decd 2 --round $ROUND

# ---- protocol + ablation (results/protocol, results/ablation) ----
add_eval --ds $DS2048 --tag proto --mod joint \
  --ckpt checkpoints/protocol_joint --out results/protocol \
  --no-cross --beams 5 --round $ROUND
for rnn in gru lstm bigru bilstm; do
  add_eval --ds $DS2048 --tag abl_${rnn} --mod raw \
    --ckpt checkpoints/ablation3/${rnn}_raw --out results/ablation \
    --rnn $rnn --no-cross --beams 5 --round $ROUND
done

# ---- ref45 row (saturated; arbitration measured neutral — re-confirm) ----
for mod in raw event joint; do
  add_eval --ds $DS45 --tag ref45 --mod $mod \
    --ckpt checkpoints/sweep/ref45_${mod} --out results/ref_sweep --round $ROUND
  add_eval --ds $DS45 --tag ref45b3 --mod $mod \
    --ckpt checkpoints/sweep/ref45_${mod} --out results/ref_sweep \
    --n-beams 3 --round $ROUND
done

# ---- (3,2) event re-earned under the bad-basin restart rule (VERDICT r4
# item 3): canonical single invocation, protocol seed 22, restarts fired at
# seeds 22-25, accepted at seed 26 (runs/m3.event.d32.rr3/restart_log.json)
if [ -d checkpoints/matrix3/d32_event_rr3 ]; then
  add_eval --ds $DS2048 --tag m2048rr --mod event \
    --ckpt checkpoints/matrix3/d32_event_rr3 --out results/matrix \
    --encd 3 --decd 2 --round $ROUND
fi

# ---- 450/1024 sweep rows (rebuilt this round — tools/run_r5_sweep450.sh) --
for v in 450 1024; do
  ds=datasets/ref$v
  for mod in joint raw event; do
    [ -d "checkpoints/sweep/ref${v}_${mod}" ] && \
      add_eval --ds "$ds" --tag "ref$v" --mod "$mod" \
        --ckpt "checkpoints/sweep/ref${v}_${mod}" --out results/ref_sweep \
        --token --round $ROUND
  done
done

echo "queued $(wc -l < runs/eval_manifest.jsonl) total manifest lines"

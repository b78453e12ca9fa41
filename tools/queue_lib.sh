#!/bin/bash
# Shared helpers for training/eval queue scripts. Source this instead of
# copying the add_eval heredoc between queue files — the round-3 queues
# drifted their positional signatures (ADVICE round 3: run_r3_queue7.sh
# changed arg 8's meaning vs queue2), so this helper takes NAMED options.
#
#   add_eval --ds DATASET --tag TAG --mod MOD --ckpt CKPT --out OUTDIR \
#            [--encd N] [--decd N] [--rnn bilstm] [--beams "5,1"] \
#            [--n-beams K] [--token | --token-only] [--no-cross]
#
# Appends mapping-eval (and optionally token-acc) jobs to the eval-daemon
# manifest (tools/eval_daemon.py). Test split = DS/eval/files_info.test...,
# cross split = DS/cross/files_info... with tag "${TAG}cross".
add_eval() {
  python - "$@" <<'EOF'
import json, sys

args = sys.argv[1:]
opt = {"encd": "2", "decd": "1", "rnn": "bilstm", "beams": "5,1",
       "n_beams": None, "geom_arbitration": None, "reference_fold": False,
       "no_conf_gate": False, "round": None,
       "token": False, "token_only": False, "cross": True}
i = 0
while i < len(args):
    a = args[i]
    if a == "--token":
        opt["token"] = True; i += 1; continue
    if a == "--token-only":
        opt["token"] = opt["token_only"] = True; i += 1; continue
    if a == "--no-cross":
        opt["cross"] = False; i += 1; continue
    if a == "--reference-fold":
        opt["reference_fold"] = True; i += 1; continue
    if a == "--no-conf-gate":
        opt["no_conf_gate"] = True; i += 1; continue
    key = a.lstrip("-").replace("-", "_")
    opt[key] = args[i + 1]
    i += 2
for req in ("ds", "tag", "mod", "ckpt", "out"):
    assert opt.get(req), f"add_eval: missing --{req}"
ds, tag = opt["ds"], opt["tag"]
test = f"{tag}:{ds}/eval/files_info.test.snippets.stride_6.json:{ds}/.cache"
cross = f"{tag}cross:{ds}/cross/files_info.snippets.stride_6.json:{ds}/.cache"
base = {"ckpt": opt["ckpt"], "data_type": opt["mod"], "encd": int(opt["encd"]),
        "decd": int(opt["decd"]), "rnn": opt["rnn"], "out_dir": opt["out"]}
if opt["n_beams"]:
    base["n_beams"] = int(opt["n_beams"])
if opt["geom_arbitration"]:
    base["geom_arbitration"] = float(opt["geom_arbitration"])
if opt["reference_fold"]:
    base["reference_fold"] = True
if opt["no_conf_gate"]:
    base["no_conf_gate"] = True
if opt["round"]:  # salt: changes the manifest-line hash so an identical
    base["round"] = int(opt["round"])  # job can be re-run in a later round

import os
manifest = os.environ.get("EVAL_MANIFEST", "runs/eval_manifest.jsonl")
with open(manifest, "a") as f:
    if not opt["token_only"]:
        evals = [test, cross] if opt["cross"] else [test]
        f.write(json.dumps(dict(base, evals=evals, beams=opt["beams"])) + "\n")
    if opt["token"]:
        f.write(json.dumps(dict(base, kind="token_acc", evals=[test])) + "\n")
EOF
}

# run_t <timeout_s> <export_ckpt> <cmd...>: skip when the checkpoint is
# already exported; bounded by `timeout`; one retry on failure/timeout
# (remote-tunnel compile wedges cost minutes, not the session).
run_t() {
  local t=$1 ck=$2; shift 2
  for attempt in 1 2; do
    [ -d "$ck" ] && return 0
    echo "=== $(date +%H:%M:%S) [try $attempt, timeout ${t}s] $*"
    timeout --kill-after=30 "$t" "$@" && return 0
    echo "=== $(date +%H:%M:%S) attempt $attempt failed/timed out"
    sleep 15
  done
  return 1
}

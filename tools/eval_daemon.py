"""CPU-side accuracy-evaluation daemon.

Training queues (tools/run_ref_sweep.sh, tools/run_matrix.sh, ...) own the
single TPU chip; mapping evaluations are CPU-friendly (few reads, small
model), so they run here — on the CPU backend, in parallel with training —
by consuming jobs from a JSONL manifest as their checkpoints appear.

Manifest line (one JSON object per line, appended by the training queues):
  {"ckpt": "checkpoints/sweep/ref45_joint", "data_type": "joint",
   "encd": 2, "decd": 1, "out_dir": "results/ref_sweep",
   "evals": ["ref45:datasets/ref45/eval/files_info.test.snippets.stride_6.json:datasets/ref45/.cache",
              "ref45cross:datasets/ref45/cross/files_info.snippets.stride_6.json:datasets/ref45/.cache"],
   "beams": "5,1"}

All results produced this way are uniform: CPU backend, f32 XLA beam path
(identities are metric numbers, not throughput numbers — the perf story is
measured separately on the TPU). Stop with: touch runs/eval_daemon.stop

  nohup python -u tools/eval_daemon.py > runs/eval_daemon.log 2>&1 &
"""

from __future__ import annotations

import hashlib
import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
MANIFEST = REPO / "runs" / "eval_manifest.jsonl"
DONE = REPO / "runs" / "eval_manifest.done"
STOP = REPO / "runs" / "eval_daemon.stop"


def line_key(line: str) -> str:
    return hashlib.sha1(line.strip().encode()).hexdigest()[:16]


BACKEND = "cpu"


def run_job(job: dict) -> bool:
    if job.get("kind") == "token_acc":
        # per-snippet token test accuracy (reference reduced-curve metric)
        tag, fi, cache = (job["evals"][0].split(":") + [None])[:3]
        cmd = [sys.executable, "-u", "tools/eval_token_acc.py",
               "--checkpoint", job["ckpt"], "--data-type", job["data_type"],
               "--encoder-depth", str(job.get("encd", 2)),
               "--decoder-depth", str(job.get("decd", 1)),
               "--rnn-type", job.get("rnn", "bilstm"),
               "--files-info", fi, "--tag", tag,
               "--out-dir", job["out_dir"]]
        if cache:
            cmd += ["--cache-dir", cache]
    else:
        cmd = [sys.executable, "-u", "tools/evaluate.py",
               "--checkpoint", job["ckpt"],
               "--data-type", job["data_type"],
               "--encoder-depth", str(job.get("encd", 2)),
               "--decoder-depth", str(job.get("decd", 1)),
               "--rnn-type", job.get("rnn", "bilstm"),
               "--beams", job.get("beams", "5,1"),
               "--out-dir", job["out_dir"]]
        if job.get("n_beams"):
            cmd += ["--n-beams", str(job["n_beams"])]
        if job.get("geom_arbitration"):
            cmd += ["--geom-arbitration", str(job["geom_arbitration"])]
        if job.get("reference_fold"):
            cmd += ["--reference-fold"]
        if job.get("no_conf_gate"):
            cmd += ["--no-conf-gate"]
        for spec in job["evals"]:
            cmd += ["--eval", spec]
    if BACKEND == "cpu":
        cmd.insert(3, "--cpu")
    print(f"[{time.strftime('%H:%M:%S')}] RUN {job['ckpt']} "
          f"{job['data_type']} ({job.get('encd', 2)},{job.get('decd', 1)})",
          flush=True)
    r = subprocess.run(cmd, cwd=REPO)
    ok = r.returncode == 0
    print(f"[{time.strftime('%H:%M:%S')}] {'DONE' if ok else 'FAILED'} "
          f"rc={r.returncode}", flush=True)
    return ok


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--shard", default="0/1",
                    help="i/n: process only manifest lines with hash%%n==i, "
                         "so several daemons can drain one manifest")
    ap.add_argument("--backend", default="cpu", choices=["cpu", "device"],
                    help="cpu (default): evaluations run on the CPU backend "
                         "so they overlap TPU training. device: use the "
                         "default accelerator — the post-training drain mode "
                         "(numerics differ from CPU f32 only at float tie "
                         "level; do not mix within one sweep if avoidable)")
    args = ap.parse_args()
    global BACKEND
    BACKEND = args.backend
    shard_i, shard_n = (int(x) for x in args.shard.split("/"))

    done = set()
    if DONE.exists():
        done = set(DONE.read_text().split())
    fails: dict[str, int] = {}
    while not STOP.exists():
        ran = False
        if MANIFEST.exists():
            for line in MANIFEST.read_text().splitlines():
                line = line.strip()
                if not line:
                    continue
                key = line_key(line)
                if int(key, 16) % shard_n != shard_i:
                    continue
                if key in done or fails.get(key, 0) >= 2:
                    continue
                try:
                    job = json.loads(line)
                except json.JSONDecodeError:
                    done.add(key)
                    continue
                if not (REPO / job["ckpt"]).exists():
                    continue  # checkpoint not exported yet
                if run_job(job):
                    done.add(key)
                    with DONE.open("a") as f:
                        f.write(key + "\n")
                else:
                    fails[key] = fails.get(key, 0) + 1
                ran = True
                if STOP.exists():
                    break
        if not ran:
            time.sleep(45)
    print("stop requested; exiting", flush=True)


if __name__ == "__main__":
    main()

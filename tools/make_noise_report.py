"""Aggregate the realism-ladder results into results/NOISE_SWEEP.md.

The ladder (tools/run_noise_ladder.sh) trains the flagship config on the
reference's committed 2048-6-mer genome set at each simulator realism rung
(clean -> lowpass -> noisy -> dynamic -> harsh; each rung adds one family of
physical effects — see ravvent_tpu/data/simulator.py LADDER). This report
shows where identity and token accuracy land as realism increases
(DeepSimulator's role in the reference pipeline,
data/generate_simulator_reduced.py:75-77), and records which rung is the
framework's dataset default.

  python tools/make_noise_report.py
"""

from __future__ import annotations

import argparse
import json
import sys
from dataclasses import asdict
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--results-dir", default="results/noise_ladder")
    ap.add_argument("--out", default="results/NOISE_SWEEP.md")
    ap.add_argument("--default-profile", default="noisy")
    args = ap.parse_args()

    from ravvent_tpu.data.simulator import LADDER, PROFILES

    rdir = Path(args.results_dir)
    rows = []
    for p in LADDER:
        row = {"profile": p}
        for beam in (5, 1):
            f = rdir / f"accuracy_results_all.lad{p}.beam{beam}.json"
            fx = rdir / f"accuracy_results_all.lad{p}cross.beam{beam}.json"
            for key, path in ((f"id{beam}", f), (f"id{beam}x", fx)):
                if path.exists():
                    cells = next(iter(json.loads(path.read_text()).values()))
                    row[key] = cells.get("joint", [None])[0]
        t = rdir / f"token_acc.lad{p}.json"
        if t.exists():
            cells = next(iter(json.loads(t.read_text()).values()))
            d = cells.get("joint", {})
            row["tok"] = d.get("teacher_forced", d.get("strict"))
        rows.append(row)
    if not any(len(r) > 1 for r in rows):
        print("no ladder results yet", file=sys.stderr)
        return 1

    def fmt(x, scale=1.0, nd=1):
        return "—" if x is None else f"{x * scale:.{nd}f}"

    lines = [
        "# Simulator realism ladder (noise sweep)",
        "",
        "Flagship config (joint, bilstm, encd2/decd1, full curriculum) trained",
        "and evaluated per rung on the reference's committed 2048-6-mer genome",
        "set. Each rung adds one family of physical effects to the signal",
        "simulator (`ravvent_tpu/data/simulator.py`); this table shows what each",
        "costs. DeepSimulator played this role in the reference pipeline",
        "(reference: data/generate_simulator_reduced.py:75-77) — its output is",
        "not reproducible here, so realism is explicit and swept instead.",
        "",
        "| rung | adds | token acc | identity b5 | identity b1 | identity b5 cross |",
        "|---|---|---|---|---|---|",
    ]
    adds = {
        "clean": "ideal steps + white noise (round-1 baseline)",
        "lowpass": "+ one-pole low-pass on level transitions",
        "noisy": "+ per-kmer noise scales, level jitter, baseline drift",
        "dynamic": "+ dwell stalls, near-skipped bases",
        "harsh": "stress bound (all effects, stronger)",
    }
    for r in rows:
        star = " **(default)**" if r["profile"] == args.default_profile else ""
        lines.append(
            f"| {r['profile']}{star} | {adds[r['profile']]} | "
            f"{fmt(r.get('tok'), nd=3)} | {fmt(r.get('id5'))} | "
            f"{fmt(r.get('id1'))} | {fmt(r.get('id5x'))} |")
    lines += [
        "",
        "Identity = merged-read mapping identity (total %, sce mapper, held-out",
        "reads of the train genome; 'cross' = reads of the committed .eval",
        "genome). Token acc = teacher-forced per-snippet accuracy (the",
        "reference train-step metric; shift-free).",
        "",
        "Profile parameters:",
        "",
        "```json",
        json.dumps({p: asdict(PROFILES[p]) for p in LADDER}, indent=2),
        "```",
        "",
    ]
    Path(args.out).write_text("\n".join(lines))
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

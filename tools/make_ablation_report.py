"""Aggregate the RNN-type ablation into results/ABLATION.md + figure.

The reference compares gru/lstm/bigru/bilstm raw-modality accuracy on its
reduced-simulator data (reference: make_plots.py:113-153, hard-coded values
gru 0.833, lstm 0.864, bigru 0.951, bilstm 0.960). Our analog trains each
type from scratch with the identical default curriculum on the anchored
ref2048 set (tools/run_r3_queue5.sh) and reports teacher-forced token test
accuracy plus merged-read mapping identity (beam 5, held-out reads).

  python tools/make_ablation_report.py
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

# reference: make_plots.py:115-117 (raw modality, simulator experiments)
REFERENCE_ABLATION = {"gru": 0.833, "lstm": 0.864, "bigru": 0.951, "bilstm": 0.960}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--results-dir", default="results/ablation")
    ap.add_argument("--out", default="results/ABLATION.md")
    args = ap.parse_args()

    from ravvent_tpu.tools.plots import plot_accuracy_bars

    rdir = Path(args.results_dir)
    rows = []
    for rnn in ["gru", "lstm", "bigru", "bilstm"]:
        tok = idn = None
        tok_metric = None  # which metric actually filled the cell
        t = rdir / f"token_acc.abl_{rnn}.json"
        if t.exists():
            cells = next(iter(json.loads(t.read_text()).values()))
            d = cells.get("raw", {})
            if "teacher_forced" in d:
                tok, tok_metric = d["teacher_forced"], "teacher_forced"
            elif "strict" in d:
                tok, tok_metric = d["strict"], "strict"
        f = rdir / f"accuracy_results_all.abl_{rnn}.beam5.json"
        if f.exists():
            cells = next(iter(json.loads(f.read_text()).values()))
            idn = cells.get("raw", [None])[0]
        rows.append((rnn, tok, idn, tok_metric))
    have = [r for r in rows if r[1] is not None]
    if not have:
        print("no ablation results yet", file=sys.stderr)
        return 1

    labels = [r[0] for r in have]
    plot_accuracy_bars(
        labels, [r[1] for r in have],
        title="RNN-type ablation — raw modality, teacher-forced token test accuracy",
        reference_values=[REFERENCE_ABLATION[l] for l in labels],
        out=str(rdir / "rnn_ablation.png"))

    md = ["# RNN-type ablation (raw modality)",
          "",
          "Each type trained from scratch with the identical default curriculum",
          "on the anchored ref2048 set (reference's committed 2048-6-mer genome,",
          "noisy rung, held-out test reads; identity under the round-5b record",
          "merge fold — geometry arbitration + length-constrained splice",
          "(results/ARBITRATION.md) + confidence gate (results/CONF_GATE.md),",
          "regenerated in the round-5b TPU pass). Reference values are its hard-coded",
          "reduced-simulator results (make_plots.py:113-153) — different signal",
          "generator and training budget, drawn for orientation.",
          "",
          "![rnn ablation](ablation/rnn_ablation.png)",
          "",
          "| rnn | token acc (teacher-forced) | identity b5 | reference acc |",
          "|---|---|---|---|"]
    strict_fallback = []
    for rnn, tok, idn, tok_metric in rows:
        cell = f"{tok:.3f}" if tok is not None else "—"
        if tok_metric == "strict":
            cell += "†"
            strict_fallback.append(rnn)
        md.append(f"| {rnn} | {cell}")
        md[-1] += f" | {idn:.1f} |" if idn is not None else " | — |"
        md[-1] += f" {REFERENCE_ABLATION[rnn]:.3f} |"
    if strict_fallback:
        md += ["",
               "† teacher-forced accuracy missing for this cell; the "
               "value shown is the STRICT (free-running exact-position) "
               "metric — harsher, not comparable to the other rows."]
    if any(r[1] is None for r in rows):
        missing = [r[0] for r in rows if r[1] is None]
        md += ["",
               f"Cells pending ({', '.join(missing)}): their training runs hit "
               "a wedged-compile failure mode of the remote-tunnel device and "
               "are requeued with bounded timeouts (tools/run_r3_queue7.sh "
               "step 3)."]
    md.append("")
    Path(args.out).write_text("\n".join(md))
    print(f"wrote {args.out} ({len(have)} types)")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Merge-fold geometry-arbitration study -> results/ARBITRATION.md.

Compares the reference merge fold (the numbers of record) against the
opt-in geometry-arbitrated fold (assembly.merger.Merger(geom_arbitration))
on the same checkpoints/reads, from the committed result files:

  baseline: results/matrix/accuracy_results_all.m2048*.json,
            results/ref_sweep/accuracy_results_all.ref4096c*.json (folded)
  study:    results/arbitration/accuracy_results_all.{m2048arb,ref4096arb}*.json

  python tools/make_arbitration_report.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

CASES = [
    # (label, baseline file, baseline dk, study file, study dk, mod)
    ("2048 (3,1) raw", "results/matrix/accuracy_results_all.m2048{c}.beam{b}.json",
     "(3, 1)", "results/arbitration/accuracy_results_all.m2048arb{c}.beam{b}.json",
     "(3, 1)", "raw"),
    ("2048 (3,2) joint", "results/matrix/accuracy_results_all.m2048{c}.beam{b}.json",
     "(3, 2)", "results/arbitration/accuracy_results_all.m2048arb{c}.beam{b}.json",
     "(3, 2)", "joint"),
    ("4096 (3,2) raw (tf ckpt)", "results/ref_sweep/accuracy_results_all.ref4096tfraw{c}.beam{b}.json",
     "(3, 2)", "results/arbitration/accuracy_results_all.ref4096arb{c}.beam{b}.json",
     "(3, 2)", "raw"),
    ("4096 (3,2) joint", "results/ref_sweep/accuracy_results_all.ref4096r4{c}.beam{b}.json",
     "(3, 2)", "results/arbitration/accuracy_results_all.ref4096arb{c}.beam{b}.json",
     "(3, 2)", "joint"),
]


def cell(path_tpl, dk, mod, beam, cross):
    p = REPO / path_tpl.format(c="cross" if cross else "", b=beam)
    if not p.exists():
        return None
    d = json.loads(p.read_text())
    v = d.get(dk, {}).get(mod)
    return v  # [total, valid, invalid%]


def fmt(v):
    if v is None:
        return "—"
    return f"{v[0]:.1f}" + (f" ({v[2]:.0f}%inv)" if v[2] > 0 else "")


def main():
    rows = []
    for label, bt, bdk, st, sdk, mod in CASES:
        r = [label]
        for beam, cross in ((5, False), (1, False), (5, True)):
            r.append(fmt(cell(bt, bdk, mod, beam, cross)))
            r.append(fmt(cell(st, sdk, mod, beam, cross)))
        rows.append(r)
    md = [
        "# Merge-fold geometry arbitration (study)",
        "",
        "The reference merge fold splices each junction from the local",
        "alignment of the accumulated 25-base tail against the next",
        "snippet's 25-base head (reference: merger.py:150,155-248). The",
        "splice unions BOTH windows minus the aligned columns, so a tiny",
        "high-scoring match — even at the geometrically right offset —",
        "inflates the merged read by the unmatched remainder; at low",
        "snippet accuracy this compounds into ~2x over-length reads that",
        "map at 0. `Merger(geom_arbitration=tol)` (opt-in; default",
        "preserves the reference fold for all numbers of record) gates",
        "every junction alignment on geometric agreement AND consumption",
        "of ~the expected shared bases, splicing geometrically otherwise.",
        "",
        "Same checkpoints, same reads, tol=4 bases; identity total %",
        "(invalid% in parentheses when nonzero); baseline = reference",
        "fold, arb = arbitrated fold:",
        "",
        "| case | b5 ref | b5 arb | b1 ref | b1 arb | b5 cross ref | b5 cross arb |",
        "|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        md.append("| " + " | ".join(r) + " |")
    md += [
        "",
        "Readings:",
        "",
        "- High-quality regime (2048): the reference fold loses ~1.7-2pt",
        "  to occasional weak junctions; arbitration recovers it on every",
        "  cell (e.g. (3,1) raw 90.3 -> 92.0, past the reference's best",
        "  committed row).",
        "- Low-quality regime (4096): beam-1 goes from unmappable 2x-length",
        "  output to graded identity; beam-5 gains 4-14 points.",
        "- The per-read records live in `results/arbitration/`; the",
        "  arbitrated fold runs the python fold with native per-pair",
        "  alignments (~0.1s/read), the reference fold keeps the native",
        "  whole-fold kernel.",
        "",
        "The numbers of record (MATRIX.md, REF_SWEEP.md) remain the",
        "reference fold; flipping the default is a candidate for the next",
        "round after a full-matrix re-evaluation under arbitration.",
        "",
    ]
    (REPO / "results/ARBITRATION.md").write_text("\n".join(md))
    print("wrote results/ARBITRATION.md")
    return 0


if __name__ == "__main__":
    sys.exit(main())

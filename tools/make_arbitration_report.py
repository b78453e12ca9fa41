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
    # full arbitrated matrix (when the m2048arb sweep has landed): every
    # depth x modality cell, baseline (m2048 tags, reference fold) vs
    # arbitrated (m2048arb)
    def matrix_cell(tag, dk, mod, beam, cross):
        base = ("results/matrix" if not tag.endswith("arb")
                else "results/arbitration")
        p = REPO / f"{base}/accuracy_results_all.{tag}{'cross' if cross else ''}.beam{beam}.json"
        if not p.exists():
            return None
        return json.loads(p.read_text()).get(dk, {}).get(mod)

    depths = ["(1, 1)", "(2, 1)", "(2, 2)", "(3, 1)", "(3, 2)"]
    mods = ["raw", "event", "joint"]
    n_have = sum(
        matrix_cell("m2048arb", dk, m, 5, False) is not None
        for dk in depths for m in mods)
    if n_have >= 10:
        md2 = [
            "",
            f"## Full arbitrated matrix ({n_have}/15 cells landed)",
            "",
            "Identity total %, beam 5 held-out; each cell 'reference fold",
            "-> arbitrated' (same checkpoint, same reads):",
            "",
            "| depths | raw | event | joint |",
            "|---|---|---|---|",
        ]
        for dk in depths:
            cells = []
            for m in mods:
                b = matrix_cell("m2048", dk, m, 5, False)
                a = matrix_cell("m2048arb", dk, m, 5, False)
                if a is None or b is None:
                    cells.append("—")
                else:
                    cells.append(f"{b[0]:.1f} -> {a[0]:.1f}")
            md2.append(f"| {dk} | {' | '.join(cells)} |")
        deltas = []
        for dk in depths:
            for m in mods:
                b = matrix_cell("m2048", dk, m, 5, False)
                a = matrix_cell("m2048arb", dk, m, 5, False)
                if a is not None and b is not None:
                    deltas.append(a[0] - b[0])
        if deltas:
            md2 += ["",
                    f"Mean delta over {len(deltas)} cells: "
                    f"**{sum(deltas)/len(deltas):+.2f}** points "
                    f"(min {min(deltas):+.1f}, max {max(deltas):+.1f}).", ""]
        md.extend(md2)

    # other rows (landed via the round-4 daemon queue)
    def arb_tag(tag, dk, mod, beam=5):
        p = REPO / f"results/arbitration/accuracy_results_all.{tag}.beam{beam}.json"
        if not p.exists():
            return None
        v = json.loads(p.read_text()).get(dk, {}).get(mod)
        return v and v[0]

    others = [
        ("ablation gru raw (2,1)", 75.6, arb_tag("ablarb_gru", "(2, 1)", "raw")),
        ("ablation lstm raw (2,1)", 77.7, arb_tag("ablarb_lstm", "(2, 1)", "raw")),
        ("ablation bigru raw (2,1)", 83.9, arb_tag("ablarb_bigru", "(2, 1)", "raw")),
        ("ablation bilstm raw (2,1)", 88.7, arb_tag("ablarb_bilstm", "(2, 1)", "raw")),
        ("protocol joint (2,1)", 79.1, arb_tag("protoarb", "(2, 1)", "joint")),
        ("flagship joint (2,1)", 77.9, arb_tag("flagarb", "(2, 1)", "joint")),
        ("ref45 raw (+phase sel)", 98.8, arb_tag("ref45arb", "(2, 1)", "raw")),
        ("ref45 joint (+phase sel)", 98.6, arb_tag("ref45arb", "(2, 1)", "joint")),
        # measured on the real TPU (bench flagship config, 4-read bench
        # set, 2026-08-21); the 76.19 baseline is BENCH_DETAILS.json
        ("bench stream (TPU, i8dev wire)", 76.19, 80.745),
    ]
    have_others = [(l, b, a) for l, b, a in others if a is not None]
    if have_others:
        md += ["", "## Other rows (beam 5, held-out)", "",
               "| row | reference fold | arbitrated |", "|---|---|---|"]
        for l, b, a in have_others:
            md.append(f"| {l} | {b:.1f} | {a:.1f} |")
        md += ["",
               "The RNN-ablation ordering (gru < lstm < bigru < bilstm) is",
               "preserved; the saturated ref45 row is unchanged (no harm on",
               "periodic genomes where the positional prior + phase",
               "selection already dominate).", ""]

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
    out = REPO / "results/ARBITRATION.md"
    if out.exists() and "Round 5:" in out.read_text():
        # the committed report gained hand-maintained round-5 sections
        # (default flip + length-constrained splice); regenerating the
        # round-4 study tables would silently delete them
        raise SystemExit(
            "refusing to overwrite results/ARBITRATION.md: it contains the "
            "hand-maintained round-5 sections. Write elsewhere and merge "
            "manually if the round-4 study tables must be regenerated.")
    out.write_text("\n".join(md))
    print("wrote results/ARBITRATION.md")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Aggregate the reference-anchored difficulty sweep into a report + figure.

The reference's headline simulator experiment is the accuracy-vs-#distinct-
6-mers curve over its five committed reduced-vocabulary genome sets
(reference: make_plots.py:54-78; genomes data/simulator/reduced/*.fasta,
built by data/generate_simulator_reduced.py:86-106). tools/run_ref_sweep.sh
trains one model per set (joint curriculum; raw/event warm-started) and
evaluates all three modalities at beams 5 and 1 into
``results/ref_sweep/accuracy_results_all.ref<V>.beam<K>.json``.

This tool folds those JSONs into:
  - results/REF_SWEEP.md         — tables + explicit protocol caveats
  - results/ref_sweep/accuracy_vs_kmers.png — our curve vs the reference's

Honest-labeling contract (VERDICT round-1): our numbers come from the
built-in realistic-profile simulator (not DeepSimulator) and the built-in
seed-chain-extend local mapper (not minimap2), on the reference's exact
train/eval genomes. Same genomes, same task shape — different signal source
and mapper, so curves are anchored but not bit-comparable.

  python tools/make_ref_sweep_report.py [--results-dir results/ref_sweep]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

VOCABS = [45, 450, 1024, 2048, 4096]
MODS = ["raw", "event", "joint"]


def load_sweep(results_dir: Path, beam: int):
    """-> {mod: {vocab: [total, valid, invalid%]}} for one beam width."""
    out = {m: {} for m in MODS}
    for v in VOCABS:
        p = results_dir / f"accuracy_results_all.ref{v}.beam{beam}.json"
        if not p.exists():
            continue
        data = json.loads(p.read_text())
        for depth_key, cells in data.items():
            for mod, triple in cells.items():
                if mod in out:
                    out[mod][v] = triple
    return out


def fmt_table(sweep, ref_curve):
    lines = ["| #6-mers | raw | event | joint | reference joint | ONT guppy (ref) |",
             "|---|---|---|---|---|---|"]
    from ravvent_tpu.tools.plots import REFERENCE_REDUCED_ACCS

    for v in VOCABS:
        cells = []
        for mod in MODS:
            t = sweep[mod].get(v)
            cells.append(f"{t[0]:.1f}" if t else "—")
        rj = REFERENCE_REDUCED_ACCS["joint"][v] * 100
        g = REFERENCE_REDUCED_ACCS["guppy"][v] * 100
        lines.append(f"| {v} | {cells[0]} | {cells[1]} | {cells[2]} |"
                     f" {rj:.1f} | {g:.1f} |")
    return "\n".join(lines)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--results-dir", default="results/ref_sweep")
    ap.add_argument("--out", default="results/REF_SWEEP.md")
    args = ap.parse_args()

    from ravvent_tpu.tools.plots import plot_accuracy_vs_kmers

    rdir = Path(args.results_dir)
    sweep5 = load_sweep(rdir, 5)
    sweep1 = load_sweep(rdir, 1)
    n_cells = sum(len(s) for s in sweep5.values())
    if n_cells == 0:
        print("no sweep results yet", file=sys.stderr)
        return 1

    fig_path = rdir / "accuracy_vs_kmers.png"
    ours = {m: {v: t[0] / 100.0 for v, t in sweep5[m].items()} for m in MODS
            if sweep5[m]}
    plot_accuracy_vs_kmers(
        ours, title="Reduced-genome difficulty sweep (beam 5)",
        out=str(fig_path))

    md = ["# Reference-anchored difficulty sweep",
          "",
          "Accuracy vs #distinct 6-mers over the reference's five **committed**",
          "reduced-vocabulary genome sets (`/root/reference/data/simulator/reduced/`,",
          "exact train/eval genome split; reference: make_plots.py:54-78,",
          "data/generate_simulator_reduced.py:86-106). One model per set:",
          "joint trained with the standard curriculum (tools/train_curriculum.py),",
          "raw/event warm-started from it; identity-best epoch selected on the",
          "val split of the EVAL genome; numbers below are held-out TEST reads.",
          "",
          "**Protocol caveats (read before comparing to the reference's curve):**",
          "",
          "- Signal: built-in `realistic` simulator profile (low-pass filtered",
          "  transitions, per-kmer noise, dwell stalls, skips, baseline drift —",
          "  `ravvent_tpu/data/simulator.py::SimProfile`), NOT DeepSimulator",
          "  output. Same genomes, different signal generator.",
          "- Mapper: built-in seed-chain-extend local mapper with map-ont-style",
          "  semantics (`sce`, `ravvent_tpu/assembly/sce_mapper.py`); minimap2 is",
          "  not installable in this environment. Unmapped reads count as 0",
          "  identity, exactly like the reference aggregation",
          "  (ravvent_mapping_evaluator.py:152-167).",
          "- The reference curve (dashed in the figure) therefore anchors the",
          "  difficulty *trend*, not a bit-comparable contest.",
          "",
          "![accuracy vs kmers](ref_sweep/accuracy_vs_kmers.png)",
          "",
          "## Identity (total, %) — beam 5",
          "",
          fmt_table(sweep5, None),
          "",
          "## Identity (total, %) — beam 1",
          "",
          fmt_table(sweep1, None),
          "",
          "Full triples (total, valid-only, invalid%) per cell are in",
          f"`{args.results_dir}/accuracy_results_all.ref*.beam*.json`",
          "(reference schema, analyse_accuracies.py:144-180).",
          ""]
    Path(args.out).write_text("\n".join(md))
    print(f"wrote {args.out} ({n_cells} beam-5 cells) + {fig_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

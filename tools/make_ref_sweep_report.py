"""Aggregate the reference-anchored difficulty sweep into a report + figures.

The reference's headline simulator experiment is the accuracy-vs-#distinct-
6-mers curve over its five committed reduced-vocabulary genome sets
(reference: make_plots.py:54-78; genomes data/simulator/reduced/*.fasta,
built by data/generate_simulator_reduced.py:86-106). That curve's metric is
model TEST ACCURACY (a token-level test-split score; the curve's models
predate the mapping evaluator — make_plots.py:160), so this report leads
with our token test accuracy and carries merged-read mapping identity as the
stricter end-to-end metric alongside.

Inputs (produced by tools/run_ref_sweep.sh + tools/eval_daemon.py):
  results/ref_sweep/token_acc.ref<V>.json
  results/ref_sweep/accuracy_results_all.ref<V>.beam<K>.json       (test)
  results/ref_sweep/accuracy_results_all.ref<V>cross.beam<K>.json  (cross)

Outputs:
  results/REF_SWEEP.md
  results/ref_sweep/accuracy_vs_kmers.png      (token acc vs reference curve)
  results/ref_sweep/identity_vs_kmers.png      (mapping identity, ours only)

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


# Tag generations per vocab size, newest first. ref4096 has superseding
# reruns: 'c' = round-3 (generator coverage fix + depth (3,2) + progressive
# vocab, tools/run_ref4096_r3.sh), 'b' = round-2 diversity retry
# (tools/fix_ref4096.sh). A generation is used ONLY as a whole: the tag is
# resolved once per vocab (newest generation whose full test-side file set
# exists), so one report row never silently mixes models (ADVICE round 2).
_GENERATIONS = ["c", "b", ""]


def resolve_tag(results_dir: Path, v: int) -> str:
    """One result-file tag per vocab size: newest generation with the
    complete test-side set (token_acc + beam5 + beam1 aggregates); if none
    is complete, newest with any file; else the plain tag."""
    candidates = [f"ref{v}{g}" for g in _GENERATIONS]
    expected = ["token_acc.{t}.json",
                "accuracy_results_all.{t}.beam5.json",
                "accuracy_results_all.{t}.beam1.json"]
    for tag in candidates:
        if all((results_dir / e.format(t=tag)).exists() for e in expected):
            return tag
    for tag in candidates:
        if any((results_dir / e.format(t=tag)).exists() for e in expected):
            return tag
    return candidates[-1]


def load_identity(results_dir: Path, tags: dict, beam: int,
                  cross: bool = False):
    """-> {mod: {vocab: [total, valid, invalid%]}} for one beam width."""
    out = {m: {} for m in MODS}
    for v in VOCABS:
        tag = tags[v] + ("cross" if cross else "")
        p = results_dir / f"accuracy_results_all.{tag}.beam{beam}.json"
        if not p.exists():
            continue
        for dk, cells in json.loads(p.read_text()).items():
            if dk.startswith("_"):  # reserved (e.g. _provenance)
                continue
            for mod, triple in cells.items():
                if mod in out:
                    out[mod][v] = triple
    return out


def load_token_acc(results_dir: Path, tags: dict):
    """-> {mod: {vocab: {"strict": x, "val_style": y}}}"""
    out = {m: {} for m in MODS}
    for v in VOCABS:
        p = results_dir / f"token_acc.{tags[v]}.json"
        if not p.exists():
            continue
        for dk, cells in json.loads(p.read_text()).items():
            if dk.startswith("_"):
                continue
            for mod, d in cells.items():
                if mod in out:
                    out[mod][v] = d
    return out


def token_table(tok):
    from ravvent_tpu.tools.plots import REFERENCE_REDUCED_ACCS

    lines = ["| #6-mers | raw | event | joint | ref raw | ref event | ref joint | ONT guppy |",
             "|---|---|---|---|---|---|---|---|"]
    for v in VOCABS:
        cells = []
        for mod in MODS:
            d = tok[mod].get(v)
            cells.append(f"{d.get('teacher_forced', d['strict']):.3f}" if d else "—")
        refs = [f"{REFERENCE_REDUCED_ACCS[m][v]:.3f}" for m in MODS]
        g = REFERENCE_REDUCED_ACCS["guppy"][v]
        lines.append(f"| {v} | {' | '.join(cells)} | {' | '.join(refs)} | {g:.3f} |")
    return "\n".join(lines)


def strict_table(tok):
    lines = ["| #6-mers | raw strict/val | event strict/val | joint strict/val |",
             "|---|---|---|---|"]
    for v in VOCABS:
        cells = []
        for mod in MODS:
            d = tok[mod].get(v)
            cells.append(f"{d['strict']:.3f} / {d['val_style']:.3f}" if d else "—")
        lines.append(f"| {v} | {' | '.join(cells)} |")
    return "\n".join(lines)


def identity_table(test, cross):
    lines = ["| #6-mers | raw | event | joint | raw (cross) | event (cross) | joint (cross) |",
             "|---|---|---|---|---|---|---|"]
    for v in VOCABS:
        cells = []
        for src in (test, cross):
            for mod in MODS:
                t = src[mod].get(v)
                cells.append(f"{t[0]:.1f}" if t else "—")
        lines.append(f"| {v} | {' | '.join(cells)} |")
    return "\n".join(lines)


def tf_stage_peaks(results_dir: Path) -> str:
    """Teacher-forced accuracy at the end of the tf=1.0 stages of the 4096
    lineage (probe files written by the round-3 queue): the metric the
    reference curve reports peaks there, before the identity-oriented
    scheduled-sampling anneal trades it away."""
    import re

    best = {}
    probes = list(results_dir.glob("token_acc.ref4096c_tfprobe*.json"))
    # the exported tf-stage-extension checkpoints (tools/run_r3_queue5.sh)
    # are tf-metric measurements of the same lineage
    probes += list(results_dir.glob("token_acc.ref4096tf*.json"))
    for f in probes:
        # keyed by the INNER cell modality (a multi-modality token file must
        # credit each modality to itself, not to the filename's)
        for cells in json.loads(f.read_text()).values():
            for mm, d in cells.items():
                v = d.get("teacher_forced")
                if v is not None:
                    best[mm] = max(best.get(mm, 0.0), v)
    if not best:
        return ""
    parts = ", ".join(f"{m} **{v:.3f}**" for m, v in sorted(best.items()))
    out = ("4096 tf-stage peaks (held-out test, end of the teacher-forced "
           f"stages): {parts} — vs the reference's raw 0.789 / event 0.629 "
           "/ joint 0.782. Budget note: the ref4096tf* points come from "
           "checkpoints given additional fully-teacher-forced epochs "
           "beyond the standard curriculum specifically to maximize this "
           "metric (tools/run_r3_queue5.sh, tools/run_r4 follow-ups); the "
           "reference's curve models trained 100 epochs at tf=1.0 "
           "throughout, so the comparison is tf-metric-vs-tf-metric but "
           "budgets differ on both sides.")
    # round-2 completion bar: one modality with tf >= 0.78 AND invalid <=
    # 50% on held-out noisy 4096 reads, beam-1 nonzero — emit the evidence
    # when the bar-checkpoint evaluations exist
    def _cell(tag, beam):
        p = results_dir / f"accuracy_results_all.{tag}.beam{beam}.json"
        if not p.exists():
            return None
        for dk, cells in json.loads(p.read_text()).items():
            if not dk.startswith("_"):
                for mod, t in cells.items():
                    return mod, t
        return None

    b5 = _cell("ref4096tfraw", 5)
    b1 = _cell("ref4096tfraw", 1)
    tok = None
    ptok = results_dir / "token_acc.ref4096tfraw.json"
    if ptok.exists():
        for cells in json.loads(ptok.read_text()).values():
            for mod, d in cells.items():
                tok = d.get("teacher_forced")
    if b5 and b1 and tok and tok >= 0.78 and b5[1][2] <= 50.0 and b1[1][0] > 0:
        out += (
            f"\n\nFree-running completion bar (round-2 criterion): met by "
            f"the raw tf-extension checkpoint `ref4096tf_raw` — tf token "
            f"acc **{tok:.3f}** (>= 0.78), beam-5 merged-read mapping "
            f"invalid **{b5[1][2]:.1f}%** (<= 50; identity {b5[1][0]:.1f} "
            f"total), beam-1 nonzero ({b1[1][0]:.1f} total / {b1[1][1]:.1f} "
            f"valid). Same single checkpoint for all three numbers; mapping "
            f"under the round-4 rescue-stage mapper (per-read records carry "
            f"the stage field).")
    return out


def periodic_decode_section(results_dir: Path) -> str:
    """45-6-mer set: reference flow (top beam) vs phase-selected decode
    (n_beams=3 + Viterbi junction-agreement selection,
    assembly.merger.select_beams_by_overlap), both under the round-4 mapper
    (coverage-triggered exact-DP rescue). Emitted only when the ref45b3
    evaluations exist."""
    def cell(tag, beam, mod):
        p = results_dir / f"accuracy_results_all.{tag}.beam{beam}.json"
        if not p.exists():
            return None
        for dk, cells in json.loads(p.read_text()).items():
            if dk.startswith("_"):
                continue
            if mod in cells:
                return cells[mod][0]
        return None

    if not (results_dir / "accuracy_results_all.ref45b3.beam5.json").exists():
        return ""
    lines = [
        "### Periodic-genome decode (45-6-mer set): phase-selected beams",
        "",
        "The round-3 residual on this ultra-periodic set had two causes,",
        "both fixed in round 4: (a) snippet decodes can lock onto the wrong",
        "phase of the period — fixed by fetching the top-3 beams and",
        "choosing the chain that maximizes junction overlap agreement",
        "(Viterbi; `assembly.merger.select_beams_by_overlap`); (b) the",
        "seed-chain mapper starved on the repetitive genome (every 15-mer",
        "exceeds the occurrence cap), grading ~0.98-exact-identity reads at",
        "~0.84 — fixed by the coverage-triggered exact-DP rescue stage",
        "(`assembly.sce_mapper`). Same `ref45_*` checkpoints as the main",
        "table (token accuracy 0.98+; the model was never the bottleneck):",
        "",
        "| modality | top beam b5 | phase-sel b5 | top beam b1 | phase-sel b1 | phase-sel b5 (cross) |",
        "|---|---|---|---|---|---|",
    ]
    for mod in MODS:
        row = [cell("ref45", 5, mod), cell("ref45b3", 5, mod),
               cell("ref45", 1, mod), cell("ref45b3", 1, mod),
               cell("ref45b3cross", 5, mod)]
        cells = " | ".join(f"{v:.1f}" if v is not None else "—" for v in row)
        lines.append(f"| {mod} | {cells} |")
    lines += [
        "",
        "Per-read records (`mapping_evaluator_results.ref45b3.*`) carry the",
        "mapper `stage` field; on this set the rescue stage fires on most",
        "reads (seed starvation), on normal genomes it never fires.",
    ]
    return "\n".join(lines)


def provenance_notes(results_dir: Path, tags: dict) -> str:
    """Per-cell checkpoint provenance: folded cells (tools/fold_4096_lineage)
    carry a source_tag — disclose any row whose modalities come from
    different checkpoints of the lineage (ADVICE round 3)."""
    notes = []
    for v in VOCABS:
        tag = tags[v]
        mix = {}
        for fname in (f"accuracy_results_all.{tag}.beam5.json",
                      f"token_acc.{tag}.json"):
            p = results_dir / fname
            if not p.exists():
                continue
            data = json.loads(p.read_text())
            for dk, cells in data.get("_provenance", {}).items():
                mix.update(cells)
            for dk, cells in data.items():
                if dk.startswith("_"):
                    continue
                for mod, d in cells.items():
                    if isinstance(d, dict) and "source_tag" in d:
                        mix[mod] = d["source_tag"]
        if mix:
            parts = ", ".join(f"{m} <- `{t}`" for m, t in sorted(mix.items()))
            rest = [m for m in MODS if m not in mix]
            if rest:
                parts += f"; {', '.join(rest)} <- `{tag}`"
            notes.append(
                f"- {v} row (`{tag}` files) mixes checkpoints: {parts} "
                f"(joint/raw are extended-anneal exports of one warm-start "
                f"chain; `ref4096ed48` is the event channel retrained on "
                f"the per-rung 4/8 detector re-fit — docs/TRAINING.md; "
                f"folded "
                "by tools/fold_4096_lineage.py; originals retained under "
                "their own tags).")
    if not notes:
        return ""
    return "Cell provenance (rows whose modalities come from different " \
           "checkpoints):\n\n" + "\n".join(notes)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--results-dir", default="results/ref_sweep")
    ap.add_argument("--out", default="results/REF_SWEEP.md")
    args = ap.parse_args()

    from ravvent_tpu.tools.plots import plot_accuracy_vs_kmers

    rdir = Path(args.results_dir)
    tags = {v: resolve_tag(rdir, v) for v in VOCABS}
    tok = load_token_acc(rdir, tags)
    id5 = load_identity(rdir, tags, 5)
    id1 = load_identity(rdir, tags, 1)
    id5x = load_identity(rdir, tags, 5, cross=True)
    n_cells = sum(len(s) for s in tok.values())
    if n_cells == 0 and not any(id5[m] for m in MODS):
        print("no sweep results yet", file=sys.stderr)
        return 1

    if n_cells:
        plot_accuracy_vs_kmers(
            {m: {v: d.get("teacher_forced", d["strict"])
                 for v, d in tok[m].items()} for m in MODS if tok[m]},
            title="Reduced-genome difficulty sweep — token test accuracy",
            out=str(rdir / "accuracy_vs_kmers.png"))
    if any(id5[m] for m in MODS):
        plot_accuracy_vs_kmers(
            {m: {v: t[0] / 100.0 for v, t in id5[m].items()} for m in MODS if id5[m]},
            show_reference=False,
            title="Merged-read mapping identity (beam 5, held-out reads)",
            out=str(rdir / "identity_vs_kmers.png"))

    md = ["# Reference-anchored difficulty sweep",
          "",
          "Accuracy vs #distinct 6-mers over the reference's five **committed**",
          "reduced-vocabulary genome sets (`/root/reference/data/simulator/reduced/`;",
          "reference: make_plots.py:54-78, data/generate_simulator_reduced.py:86-106).",
          "One model per set: joint trained with the standard curriculum",
          "(tools/train_curriculum.py), raw/event warm-started from it;",
          "identity-best epoch selected on held-out val reads. Evaluation reads",
          "are held-out reads of the train genome (the reference's evaluation",
          "semantics — its identity tables and reduced curve both score held-out",
          "reads/splits of the training distribution); 'cross' columns are reads",
          "of the committed `.eval` genome (cross-genome transfer).",
          "",
          "**Protocol caveats (read before comparing to the reference's curve):**",
          "",
          "- Signal: built-in simulator (`SimProfile`, see results/NOISE_SWEEP.md",
          "  for the realism ladder), NOT DeepSimulator output. Same genomes,",
          "  different signal generator.",
          "- The reference curve metric is model TEST ACCURACY (token-level,",
          "  make_plots.py:54-78) from thesis-era models (different config:",
          "  `tf0 emb5 ed1 bahdanau`, 100 epochs). Our teacher-forced token",
          "  accuracy (per-step exact-match conditioned on the gold prefix,",
          "  the reference's train-step masking, basecaller.py:247) is the",
          "  closest analog: free-running exact-position metrics (strict /",
          "  val-style below) shift-penalize every position after a single",
          "  greedy insertion or deletion, which alignment-based identity and",
          "  teacher-forced accuracy both forgive.",
          "- Merge fold: geometry-arbitrated + length-constrained splice —",
          "  the round-5 default (`Merger()`; fold development:",
          "  results/ARBITRATION.md; `--reference-fold` restores the",
          "  reference's union-fold semantics bit-for-bit) — plus the",
          "  round-5b confidence gate (derailed low-confidence snippets",
          "  dropped before the fold; results/CONF_GATE.md,",
          "  `--no-conf-gate` to disable). Every identity cell below was",
          "  regenerated under this fold in one round-5b TPU pass",
          "  (tools/run_r5b_sweep_tpu.sh, production engine defaults;",
          "  earlier tables were CPU-backend f32).",
          "- Mapping identity uses the built-in seed-chain-extend local mapper",
          "  (`sce`; minimap2 is not installable here). Unmapped reads count 0,",
          "  like the reference aggregation (ravvent_mapping_evaluator.py:152-167).",
          "  On the ultra-repetitive small-vocabulary genomes (45/450 6-mers)",
          "  the 45-row history is instructive: round 2's merge degraded to",
          "  54.6 at 0.988 token accuracy (period-shifted overlap alignments),",
          "  round 3's positional alignment prior lifted it to 72-83, and",
          "  round 4 closed the rest — the residual was mapper seed",
          "  starvation (every 15-mer exceeds the occurrence cap on a",
          "  45-6-mer genome; fixed by the coverage-triggered exact-DP rescue",
          "  stage) plus decode phase slips (fixed by 3-beam Viterbi",
          "  junction-agreement selection). The row now reads 98+ — see the",
          "  periodic-genome decode section below. (The reference never ran",
          "  its mapping evaluator on these sets.)",
          "- The 4096 (full-vocabulary) row is the round-3 lineage: depth",
          "  (3,2), warm-started from the 2048 (3,2) model, trained with",
          "  full-coverage data (the round-2 collapse was the truncated-epoch",
          "  generator bug — training saw ~13% of the reads; see",
          "  ravvent_tpu/data/generator.py::steps). Teacher-forced accuracy",
          "  peaks at the END OF THE TEACHER-FORCED STAGES and drops ~0.05",
          "  under scheduled-sampling annealing (which buys free-running",
          "  decode quality / mapped identity instead); the table reports the",
          "  exported identity-best checkpoint, with the tf-stage peaks noted",
          "  below it. A fresh random full-vocab genome offers no LM gradient,",
          "  so from scratch the task pins at the unigram plateau — the",
          "  2048-warm-start is load-bearing. History of the beam-1 4096",
          "  cells: through round 4 they sat at/near zero because the",
          "  reference merge fold's union splice degenerates toward",
          "  concatenation at low per-snippet accuracy (measured: 15.0kb",
          "  prediction for a 7.7kb read — ~2x) and the mapper correctly",
          "  scored the result as chance-level. The round-5 record fold",
          "  (geometry arbitration + length-constrained splice,",
          "  results/ARBITRATION.md) bounds the splice damage at snippet",
          "  quality instead of zero: beam-1 raw/joint now grade ~58-60",
          "  with 0% invalid. The event channel additionally needed a",
          "  per-rung detector re-fit (4/8 windows, RAVVENT_ED_W1/W2 —",
          "  the reference's own pipeline re-fit ED params offline per",
          "  dataset, utils.py:100 used 5/13): the 6/9 event model's",
          "  beam-1 cell was 17.1 at 66.7% invalid; the re-fit chain",
          "  (checkpoints/diag/ref4096_event_ed48) grades 57.2 at 0%",
          "  under the round-5b gated fold (beam-5 60.1 at 0%; was",
          "  48.9-at-16.7% pre-gate). See docs/TRAINING.md for the full",
          "  event-channel investigation.",
          "",
          "## Token test accuracy (teacher-forced) vs the reference curve",
          "",
          "![token accuracy vs kmers](ref_sweep/accuracy_vs_kmers.png)",
          "",
          token_table(tok),
          "",
          tf_stage_peaks(rdir),
          "",
          "Free-running exact-position variants (harsher; shift-sensitive):",
          "",
          strict_table(tok),
          "",
          "## Merged-read mapping identity (total %, sce mapper)",
          "",
          "![identity vs kmers](ref_sweep/identity_vs_kmers.png)",
          "",
          "Beam 5 — held-out reads (left) and cross-genome reads (right):",
          "",
          identity_table(id5, id5x),
          "",
          "Beam 1 — held-out reads:",
          "",
          identity_table(id1, {m: {} for m in MODS}),
          "",
          periodic_decode_section(rdir),
          "",
          "Result-file tag used per vocab (one tag's files per row): "
          + ", ".join(f"{v}: `{t}`" for v, t in tags.items()) + ".",
          "",
          provenance_notes(rdir, tags),
          "",
          "Full triples (total, valid-only, invalid%) per cell are in",
          f"`{args.results_dir}/accuracy_results_all.ref*.beam*.json`",
          "(reference schema, analyse_accuracies.py:144-180); token accuracies in",
          f"`{args.results_dir}/token_acc.ref*.json`.",
          ""]
    Path(args.out).write_text("\n".join(md))
    print(f"wrote {args.out} ({n_cells} token cells) + figures")
    return 0


if __name__ == "__main__":
    sys.exit(main())

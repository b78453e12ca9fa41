"""Fold the ref4096 anneal-extension results into the sweep row.

The 4096 lineage is one warm-start chain (flagship32 -> ref4096c stages ->
ref4096d anneal extension, tools/run_r3_queue5.sh / run_r3_queue6.sh). The
sweep report resolves ONE tag per vocab row (no silent cross-model mixing,
ADVICE round 2), so the extension's per-modality results are folded into
the ref4096c-tagged files explicitly here — same model chain, deeper
anneal — replacing the shallower-anneal cells they supersede. The
ref4096d*-tagged originals stay on disk/git for provenance.

  python tools/fold_4096_lineage.py [--results-dir results/ref_sweep]
"""

from __future__ import annotations

import argparse
import json
import shutil
from pathlib import Path

# (source tag, modality) -> folded into ref4096c cells of that modality
# ref4096ed48 (round 5): the event channel retrained on the 4/8
# detector re-fit for this rung (checkpoints/diag/ref4096_event_ed48;
# STAGES4 warm-anneal from the ed48 (3,2) base) — beam-1 event
# 17.1-at-66.7%-invalid -> 48.9-at-16.7%. Mirrors the reference's own
# practice of re-fitting ED params offline per dataset (utils.py:100
# used 5/13). The token-accuracy table keeps the 6/9 lineage (no ed48
# token job; tf-metric comparisons stay single-detector).
EXTENSIONS = [("ref4096d", "joint"), ("ref4096draw", "raw"),
              ("ref4096ed48", "event")]

# Round-4 re-evaluations of the SAME checkpoints under the de-cliffed
# mapper (tools/run_r4 enqueues tag ref4096r4; see assembly/sce_mapper
# rescue stage): identity cells update, checkpoint provenance unchanged.
# HISTORICAL — these are round-4 reference-fold numbers; applying them
# after a round-5+ regeneration would overwrite fresher arbitrated-fold
# evals (it did, once — the gate below exists so the mistake cannot
# recur). Enable only with --r4-reevals when reconstructing the round-4
# state.
# (source tag, modality, checkpoint provenance tag)
REEVALS = [
    ("ref4096r4", "joint", "ref4096d"),
    ("ref4096r4", "raw", "ref4096draw"),
    ("ref4096r4", "event", "ref4096c"),
]


def _stamp(cell, src_tag: str):
    """Provenance: folded cells carry the tag of the checkpoint that
    actually produced them (ADVICE round 3 — the folded file must not imply
    a single-checkpoint lineage)."""
    if isinstance(cell, dict):
        cell = dict(cell)
        cell["source_tag"] = src_tag
    return cell


def fold_aggregate(rdir: Path, src_tag: str, dst_tag: str, mod: str,
                   provenance: str | None = None) -> None:
    provenance = provenance or src_tag
    for beam in (5, 1):
        src = rdir / f"accuracy_results_all.{src_tag}.beam{beam}.json"
        dst = rdir / f"accuracy_results_all.{dst_tag}.beam{beam}.json"
        if not src.exists():
            continue
        if not dst.exists():
            raise SystemExit(
                f"refusing to fold {src.name}: destination {dst.name} does "
                "not exist — folding would synthesize a partial cell set "
                "that downstream reports read as complete")
        sdata = json.loads(src.read_text())
        ddata = json.loads(dst.read_text())
        for dk, cells in sdata.items():
            if dk.startswith("_"):
                continue
            if mod in cells:
                ddata.setdefault(dk, {})[mod] = _stamp(cells[mod], provenance)
                # identity triples are lists — provenance rides a reserved
                # top-level key (readers skip "_"-prefixed keys)
                ddata.setdefault("_provenance", {}).setdefault(dk, {})[mod] = provenance
                print(f"beam{beam} {dk} {mod}: <- {src_tag} {cells[mod]}")
        dst.write_text(json.dumps(ddata, indent=2))


def fold_token(rdir: Path, src_tag: str, dst_tag: str, mod: str) -> None:
    src = rdir / f"token_acc.{src_tag}.json"
    dst = rdir / f"token_acc.{dst_tag}.json"
    if not src.exists():
        return
    if not dst.exists():
        raise SystemExit(
            f"refusing to fold {src.name}: destination {dst.name} missing "
            "(see fold_aggregate)")
    sdata = json.loads(src.read_text())
    ddata = json.loads(dst.read_text())
    for dk, cells in sdata.items():
        if mod in cells:
            ddata.setdefault(dk, {})[mod] = _stamp(cells[mod], src_tag)
            print(f"token {dk} {mod}: <- {src_tag}")
    dst.write_text(json.dumps(ddata, indent=2))


def fold_per_read(rdir: Path, src_tag: str, dst_tag: str, mod: str) -> None:
    for f in rdir.glob(f"mapping_evaluator_results.{src_tag}.{mod}.*.json"):
        # ...{src_tag}.{mod}.encdE.decdD.beamB.json (src_tag may itself
        # contain no dots); replace only the tag segment
        dst = rdir / f.name.replace(f".{src_tag}.", f".{dst_tag}.", 1)
        shutil.copyfile(f, dst)
        print(f"per-read: {f.name} -> {dst.name}")
    src_cross = src_tag + "cross"
    dst_cross = dst_tag + "cross"
    for f in rdir.glob(f"mapping_evaluator_results.{src_cross}.{mod}.*.json"):
        dst = rdir / f.name.replace(f".{src_cross}.", f".{dst_cross}.", 1)
        shutil.copyfile(f, dst)
        print(f"per-read: {f.name} -> {dst.name}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--results-dir", default="results/ref_sweep")
    ap.add_argument("--r4-reevals", action="store_true",
                    help="ALSO apply the historical round-4 ref4096r4 "
                         "re-evaluations (reference-fold numbers) — only "
                         "for reconstructing the round-4 state; they would "
                         "overwrite newer arbitrated-fold evals")
    args = ap.parse_args()
    rdir = Path(args.results_dir)
    for src_tag, mod in EXTENSIONS:
        fold_aggregate(rdir, src_tag, "ref4096c", mod)
        fold_aggregate(rdir, src_tag + "cross", "ref4096ccross", mod)
        fold_token(rdir, src_tag, "ref4096c", mod)
        fold_per_read(rdir, src_tag, "ref4096c", mod)
    if args.r4_reevals:
        # round-4 mapper re-evaluations of the same checkpoints (identity
        # cells only; token accuracy is mapper-independent and stays as-is)
        for src_tag, mod, prov in REEVALS:
            fold_aggregate(rdir, src_tag, "ref4096c", mod, provenance=prov)
            fold_aggregate(rdir, src_tag + "cross", "ref4096ccross", mod,
                           provenance=prov)
            fold_per_read(rdir, src_tag, "ref4096c", mod)


if __name__ == "__main__":
    main()

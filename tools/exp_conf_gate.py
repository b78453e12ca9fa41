"""Merged-identity experiment for confidence-gated snippet dropping.

diag_conf_vs_id.py measured that mean log step-prob detects derailed
snippets at AUC ~0.95 (beam 1). This experiment quantifies the MERGED
identity effect: decode each eval read once per beam width, then re-merge
under a grid of gate settings (relative-outlier k, absolute floor, drop
cap) and map each merged read. The gate drops a snippet before the fold
when its confidence is BOTH a robust outlier below the read's median AND
below an absolute floor; the ~80% window overlap means neighbors cover
the dropped span (expected overlaps recomputed from the surviving raw
spans).

Usage mirrors diag_beam1_decode.py; add --grid to widen the sweep.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache_cpu"))
else:
    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--data-type", default="raw")
    ap.add_argument("--encoder-depth", type=int, default=3)
    ap.add_argument("--decoder-depth", type=int, default=1)
    ap.add_argument("--rnn-type", default="bilstm")
    ap.add_argument("--files-info", required=True)
    ap.add_argument("--cache-dir", default=None)
    ap.add_argument("--reads", type=int, default=4)
    ap.add_argument("--beams", default="5,1")
    ap.add_argument("--out", default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    from ravvent_tpu.assembly.merger import (
        Merger, expected_overlaps_from_ranges, snippet_confidences,
    )
    from ravvent_tpu.config import ModelConfig
    from ravvent_tpu.data import chiron
    from ravvent_tpu.data.snippets import load_read_compact_ex
    from ravvent_tpu.evaluation.basecall import BasecallEngine
    from ravvent_tpu.evaluation.mapping import MappingEvaluator
    from ravvent_tpu.models.basecaller import init_basecaller
    from ravvent_tpu.tokenizer import NUC_TOKENIZER
    from ravvent_tpu.training.checkpoints import CheckpointManager

    cfg = ModelConfig(encoder_depth=args.encoder_depth,
                      decoder_depth=args.decoder_depth,
                      rnn_type=args.rnn_type, data_type=args.data_type)
    params = init_basecaller(jax.random.PRNGKey(0), cfg)
    ck = Path(args.checkpoint)
    params = CheckpointManager(str(ck.parent)).restore(
        ck.name, template={"params": params})["params"]
    engine = BasecallEngine(params, cfg, chunk_size=1024)
    ev_map = MappingEvaluator(engine, cache_dir=args.cache_dir)
    merger = Merger()

    # gate grid: (rel_gap, abs_floor, max_drop_frac[, max_consecutive])
    # for confidence_keep_mask; None = baseline
    grid = [None,
            (0.12, -0.15, 0.12),
            (0.12, -0.15, 0.25, 2)]

    beams = [int(b) for b in args.beams.split(",")]
    fi = json.load(open(args.files_info))[: args.reads]
    decoded = []  # (read, beam) -> dict
    for rec in fi:
        sig_path = rec["signal_path"]
        label_path = Path(sig_path).with_suffix(".label")
        sig, rr, ev, er, nuc, aux = load_read_compact_ex(
            sig_path, label_path, 6, cache_dir=args.cache_dir)
        if not rr.shape[0]:
            continue
        max_out = int((nuc != 0).sum(axis=1).max())
        _, syms = chiron.load_label(label_path)
        ref_seq = "".join(syms)
        for beam in beams:
            tokens, probs = engine.predict_beam_compact(
                sig, rr, ev, er, max_out, beam, aux=aux)
            _, blob, offsets = NUC_TOKENIZER.sequences_to_texts_flat(tokens)
            probs = np.asarray(probs, np.float64)
            counts = np.diff(offsets)
            prefix = np.arange(probs.shape[1])[None, :] < counts[:, None]
            decoded.append(dict(
                read=Path(sig_path).name, beam=beam, blob=blob,
                offsets=offsets, flat=probs[prefix], rr=rr, ref=ref_seq))

    results = {}
    for g in grid:
        key = ("baseline" if g is None
               else "g" + "_".join(str(x) for x in g))
        per_beam = {b: [] for b in beams}
        drop_fracs = []
        for d in decoded:
            blob, offsets, flat, rr = (d["blob"], d["offsets"], d["flat"],
                                       d["rr"])
            if g is not None:
                from ravvent_tpu.assembly.merger import (
                    confidence_keep_mask, drop_snippet_rows,
                )

                keep = confidence_keep_mask(flat, offsets, *g)
                drop_fracs.append(float((~keep).mean()))
                blob, offsets, flat = drop_snippet_rows(
                    blob, offsets, flat, keep)
                rr = rr[keep]
            counts = np.diff(offsets)
            eo = (expected_overlaps_from_ranges(rr, counts)
                  if rr.shape[0] > 1 else None)
            merged = merger.merge_flat(blob, offsets, flat,
                                       expected_overlaps=eo)
            ident = ev_map.map_identity(merged.seq, d["ref"])
            per_beam[d["beam"]].append(ident.get("identity", 0.0))
        results[key] = {
            f"beam{b}": round(float(np.mean(per_beam[b])), 4) for b in beams}
        if drop_fracs:
            results[key]["mean_drop_frac"] = round(
                float(np.mean(drop_fracs)), 4)
        print(key, json.dumps(results[key]), flush=True)

    print(json.dumps(results, indent=1))
    if args.out:
        Path(args.out).write_text(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()

"""Decompose the beam5-beam1 merged-identity gap (VERDICT r4 item 2).

For each evaluated read: decode every snippet at beam widths 1 and 5,
score each decoded snippet against its ground-truth label sequence with
the exact local aligner (per-snippet identity = matches / aligned
columns), then merge and map both ways. Reporting the two deltas side by
side separates the gap's two candidate causes:

- per-snippet delta  -> the beam-1 DECODE is worse (search problem);
- merged delta beyond the per-snippet delta -> the MERGE amplifies
  beam-1 errors at junctions (fold problem).

The reference's committed tables hold the merged beam5-beam1 delta to
0.3-1.3 points at every depth (accuracy_results_all.lambda.beam{1,5}.json),
so whatever term dominates here is the round-5 target.

Usage:
  python tools/analyze_beam1_gap.py --checkpoint checkpoints/matrix3/d31_raw \
      --data-type raw --encoder-depth 3 --decoder-depth 1 \
      --files-info datasets/ref2048/eval/files_info.test.snippets.stride_6.json \
      --cache-dir datasets/ref2048/.cache --reads 6 [--cpu]
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


def snippet_identity(pred: str, true: str) -> float:
    """Symmetric local-alignment identity of one decoded snippet vs its
    label (matches / aligned columns, 0 when no alignment)."""
    from ravvent_tpu.assembly.alignment import sw_local_identity

    if not pred or not true:
        return 0.0
    out = sw_local_identity(pred, true, 2.0, -1.0, -2.0, -0.5)
    if out is None:
        return 0.0
    matches, cols = out[0], out[1]
    return matches / max(cols, len(pred), len(true))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--data-type", default="raw")
    ap.add_argument("--encoder-depth", type=int, default=3)
    ap.add_argument("--decoder-depth", type=int, default=1)
    ap.add_argument("--rnn-type", default="bilstm")
    ap.add_argument("--files-info", required=True)
    ap.add_argument("--cache-dir", default=None)
    ap.add_argument("--reads", type=int, default=6)
    ap.add_argument("--out", default=None, help="write the JSON record here")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    from ravvent_tpu.config import ModelConfig
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

    fi = json.load(open(args.files_info))[: args.reads]
    rows = []
    for rec in fi:
        sig_path = rec["signal_path"]
        label_path = Path(sig_path).with_suffix(".label")
        sig, rr, ev, er, nuc, aux = load_read_compact_ex(
            sig_path, label_path, 6, cache_dir=args.cache_dir)
        if not rr.shape[0]:
            continue
        max_out = int((nuc != 0).sum(axis=1).max())
        true_texts, _, _ = NUC_TOKENIZER.sequences_to_texts_flat(nuc)
        row = {"read": Path(sig_path).name, "n_snippets": int(rr.shape[0])}
        for beam in (5, 1):
            evb = MappingEvaluator(engine, beam_width=beam,
                                   cache_dir=args.cache_dir)
            tokens, probs = engine.predict_beam_compact(
                sig, rr, ev, er, max_out, beam, aux=aux)
            pred_texts, blob, offsets = \
                NUC_TOKENIZER.sequences_to_texts_flat(tokens)
            ids = [snippet_identity(p, t)
                   for p, t in zip(pred_texts, true_texts)]
            merged = evb.basecall_read(sig_path, label_path)
            from ravvent_tpu.data import chiron

            _, syms = chiron.load_label(label_path)
            ident = evb.map_identity(merged.seq, "".join(syms))
            row[f"beam{beam}"] = {
                "snippet_identity_mean": round(float(np.mean(ids)), 4),
                "snippet_identity_p25": round(float(np.percentile(ids, 25)), 4),
                "merged_identity": ident.get("identity", 0.0),
                "merged_len_ratio": round(len(merged.seq)
                                          / max(len(syms), 1), 3),
            }
        rows.append(row)
        print(json.dumps(row), flush=True)

    def agg(key, sub):
        vals = [r[key][sub] for r in rows]
        return round(float(np.mean(vals)), 4)

    summary = {
        "checkpoint": str(ck), "data_type": args.data_type, "reads": len(rows),
        "snippet_identity_mean": {b: agg(f"beam{b}", "snippet_identity_mean")
                                  for b in (5, 1)},
        "merged_identity_mean": {b: agg(f"beam{b}", "merged_identity")
                                 for b in (5, 1)},
        "snippet_delta": round(agg("beam5", "snippet_identity_mean")
                               - agg("beam1", "snippet_identity_mean"), 4),
        "merged_delta": round(agg("beam5", "merged_identity")
                              - agg("beam1", "merged_identity"), 4),
        "rows": rows,
    }
    print(json.dumps({k: summary[k] for k in
                      ("snippet_identity_mean", "merged_identity_mean",
                       "snippet_delta", "merged_delta")}, indent=2))
    if args.out:
        Path(args.out).write_text(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()

"""Per-snippet decomposition of the beam-1 decode deficit.

analyze_beam1_gap.py established that after the round-5 length-constrained
fold the residual beam5-beam1 merged delta is the per-snippet DECODE itself
(~2-3 points). This probe asks *what kind* of decode error beam 1 makes that
beam 5 does not, per snippet:

- ``len_ratio``   len(pred)/len(true) — over/under-generation;
- ``coverage``    aligned truth span / len(true) — truncation;
- ``id_local``    matches/cols inside the aligned region — substitution rate;
- ``id_full``     matches/max(cols, len(p), len(t)) — the gap tool's metric.

If beam 1 matches beam 5 on ``id_local`` but loses on ``len_ratio``/
``coverage``, the deficit is a length/termination problem (attackable at
decode time with a length prior); if ``id_local`` itself drops, it is a
search-path problem (only width helps).

Usage:
  python tools/diag_beam1_decode.py --checkpoint checkpoints/matrix3/d31_raw \
      --data-type raw --encoder-depth 3 --decoder-depth 1 \
      --files-info datasets/ref2048/eval/files_info.test.snippets.stride_6.json \
      --cache-dir datasets/ref2048/.cache --reads 4 [--cpu]
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


def snippet_stats(pred: str, true: str) -> dict:
    from ravvent_tpu.assembly.alignment import sw_local_identity

    n_p, n_t = len(pred), len(true)
    base = {"len_p": n_p, "len_t": n_t,
            "len_ratio": n_p / max(n_t, 1)}
    if not pred or not true:
        return dict(base, id_full=0.0, id_local=0.0, coverage=0.0)
    out = sw_local_identity(pred, true, 2.0, -1.0, -2.0, -0.5)
    if out is None:
        return dict(base, id_full=0.0, id_local=0.0, coverage=0.0)
    matches, cols, q0, q1, t0, t1, _score = out
    return dict(
        base,
        id_full=matches / max(cols, n_p, n_t),
        id_local=matches / max(cols, 1),
        coverage=(t1 - t0 + 1) / n_t,
    )


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
    ap.add_argument("--out", default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    from ravvent_tpu.config import ModelConfig
    from ravvent_tpu.data.snippets import load_read_compact_ex
    from ravvent_tpu.evaluation.basecall import BasecallEngine
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
    per_beam = {1: [], 5: []}
    worst_examples = []
    for rec in fi:
        sig_path = rec["signal_path"]
        label_path = Path(sig_path).with_suffix(".label")
        sig, rr, ev, er, nuc, aux = load_read_compact_ex(
            sig_path, label_path, 6, cache_dir=args.cache_dir)
        if not rr.shape[0]:
            continue
        max_out = int((nuc != 0).sum(axis=1).max())
        true_texts, _, _ = NUC_TOKENIZER.sequences_to_texts_flat(nuc)
        texts = {}
        for beam in (5, 1):
            tokens, probs = engine.predict_beam_compact(
                sig, rr, ev, er, max_out, beam, aux=aux)
            pred_texts, _, _ = NUC_TOKENIZER.sequences_to_texts_flat(tokens)
            texts[beam] = pred_texts
            for p, t in zip(pred_texts, true_texts):
                per_beam[beam].append(snippet_stats(p, t))
        # snippets where beam1 loses most vs beam5 (for eyeballing)
        n = len(true_texts)
        b5 = per_beam[5][-n:]
        b1 = per_beam[1][-n:]
        deltas = [(b5[i]["id_full"] - b1[i]["id_full"], i) for i in range(n)]
        deltas.sort(reverse=True)
        for d, i in deltas[:3]:
            if d <= 0.02:
                continue
            worst_examples.append({
                "read": Path(sig_path).name, "snippet": i, "delta": round(d, 3),
                "true": true_texts[i], "beam5": texts[5][i],
                "beam1": texts[1][i],
                "b1_stats": {k: round(float(v), 3)
                             for k, v in b1[i].items()},
            })

    def agg(beam):
        rows = per_beam[beam]
        keys = ("id_full", "id_local", "coverage", "len_ratio")
        out = {k: round(float(np.mean([r[k] for r in rows])), 4) for k in keys}
        out["p25_id_full"] = round(
            float(np.percentile([r["id_full"] for r in rows], 25)), 4)
        out["frac_truncated"] = round(
            float(np.mean([r["len_ratio"] < 0.9 for r in rows])), 4)
        out["frac_overrun"] = round(
            float(np.mean([r["len_ratio"] > 1.1 for r in rows])), 4)
        out["n"] = len(rows)
        return out

    summary = {"beam5": agg(5), "beam1": agg(1)}
    # conditional: among snippets where beam1 trails by >2pts, what do the
    # length stats look like?
    trailing = [i for i in range(len(per_beam[1]))
                if per_beam[5][i]["id_full"] - per_beam[1][i]["id_full"] > 0.02]
    if trailing:
        summary["beam1_trailing_subset"] = {
            "n": len(trailing),
            "id_local_b1": round(float(np.mean(
                [per_beam[1][i]["id_local"] for i in trailing])), 4),
            "id_local_b5": round(float(np.mean(
                [per_beam[5][i]["id_local"] for i in trailing])), 4),
            "len_ratio_b1": round(float(np.mean(
                [per_beam[1][i]["len_ratio"] for i in trailing])), 4),
            "len_ratio_b5": round(float(np.mean(
                [per_beam[5][i]["len_ratio"] for i in trailing])), 4),
            "coverage_b1": round(float(np.mean(
                [per_beam[1][i]["coverage"] for i in trailing])), 4),
            "coverage_b5": round(float(np.mean(
                [per_beam[5][i]["coverage"] for i in trailing])), 4),
        }
    print(json.dumps(summary, indent=2))
    if args.out:
        Path(args.out).write_text(json.dumps(
            {"summary": summary, "worst": worst_examples[:20]}, indent=2))


if __name__ == "__main__":
    main()

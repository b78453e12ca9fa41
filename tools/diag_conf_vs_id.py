"""Does decode confidence identify derailed snippets, label-free?

diag_beam1_decode.py showed the beam-1 residual is driven by catastrophic
early-commit derailments (greedy takes a wrong token in the first ~3 steps
and hallucinates an unrelated sequence, id ~0.3-0.6, while beam-5 is
near-perfect). If the per-snippet decode confidence (mean log step-prob of
the emitted tokens) separates those snippets from healthy ones, the merge
fold can drop them label-free — the ~80% window overlap (30-event windows,
stride 6) means neighbors still cover the dropped span.

Prints, per beam width: the conf/identity joint distribution, AUC of conf
as a detector of id_full<0.7 snippets, and the identity mass lost to each
conf decile.
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
    ap.add_argument("--out", default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    from ravvent_tpu.config import ModelConfig
    from ravvent_tpu.data.snippets import load_read_compact_ex
    from ravvent_tpu.evaluation.basecall import BasecallEngine
    from ravvent_tpu.models.basecaller import init_basecaller
    from ravvent_tpu.tokenizer import NUC_TOKENIZER
    from ravvent_tpu.training.checkpoints import CheckpointManager
    from tools.diag_beam1_decode import snippet_stats

    cfg = ModelConfig(encoder_depth=args.encoder_depth,
                      decoder_depth=args.decoder_depth,
                      rnn_type=args.rnn_type, data_type=args.data_type)
    params = init_basecaller(jax.random.PRNGKey(0), cfg)
    ck = Path(args.checkpoint)
    params = CheckpointManager(str(ck.parent)).restore(
        ck.name, template={"params": params})["params"]
    engine = BasecallEngine(params, cfg, chunk_size=1024)

    fi = json.load(open(args.files_info))[: args.reads]
    data = {1: {"conf": [], "id": []}, 5: {"conf": [], "id": []}}
    for rec in fi:
        sig_path = rec["signal_path"]
        label_path = Path(sig_path).with_suffix(".label")
        sig, rr, ev, er, nuc, aux = load_read_compact_ex(
            sig_path, label_path, 6, cache_dir=args.cache_dir)
        if not rr.shape[0]:
            continue
        max_out = int((nuc != 0).sum(axis=1).max())
        true_texts, _, _ = NUC_TOKENIZER.sequences_to_texts_flat(nuc)
        for beam in (5, 1):
            tokens, probs = engine.predict_beam_compact(
                sig, rr, ev, er, max_out, beam, aux=aux)
            pred_texts, _blob, offsets = \
                NUC_TOKENIZER.sequences_to_texts_flat(tokens)
            probs = np.asarray(probs, np.float64)
            # per-base probs aligned to emitted bases: prefix mask of
            # non-special tokens, same rule the eval path uses
            counts = np.diff(offsets)
            for i, (p, t) in enumerate(zip(pred_texts, true_texts)):
                n = counts[i]
                row = probs[i, :n] if n else np.ones(1)
                conf = float(np.log(np.clip(row, 1e-9, 1.0)).mean())
                data[beam]["conf"].append(conf)
                data[beam]["id"].append(snippet_stats(p, t)["id_full"])

    out = {}
    for beam in (5, 1):
        conf = np.asarray(data[beam]["conf"])
        idv = np.asarray(data[beam]["id"])
        bad = idv < 0.7
        # AUC of (-conf) for detecting bad snippets
        order = np.argsort(-conf)
        ranks = np.empty_like(order, float)
        ranks[order] = np.arange(len(conf))
        auc = float((ranks[bad].mean() - (bad.sum() - 1) / 2) /
                    max((~bad).sum(), 1)) if bad.any() else None
        dec = {}
        qs = np.quantile(conf, np.linspace(0, 1, 11))
        for d in range(10):
            m = (conf >= qs[d]) & (conf <= qs[d + 1])
            dec[f"d{d}"] = {
                "conf_lo": round(float(qs[d]), 3),
                "mean_id": round(float(idv[m].mean()), 4) if m.any() else None,
                "frac_bad": round(float(bad[m].mean()), 4) if m.any() else None,
            }
        out[f"beam{beam}"] = {
            "n": int(len(conf)),
            "frac_bad": round(float(bad.mean()), 4),
            "auc_bad_detector": round(auc, 4) if auc is not None else None,
            "corr_conf_id": round(float(np.corrcoef(conf, idv)[0, 1]), 4),
            "deciles": dec,
        }
    print(json.dumps(out, indent=1))
    if args.out:
        Path(args.out).write_text(json.dumps(
            {"summary": out,
             "beam1_conf": data[1]["conf"], "beam1_id": data[1]["id"],
             "beam5_conf": data[5]["conf"], "beam5_id": data[5]["id"]},
            indent=1))


if __name__ == "__main__":
    main()

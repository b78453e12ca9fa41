"""Epoch-sweep model selection by mapping identity.

The reference sweeps per-epoch checkpoints with the mapping evaluator and
keeps the best epoch per configuration (reference:
ravvent_mapping_evaluator.py:203-237 ``evaluate_specific``; the
best-epoch-per-config registry in fix_invalid_read_results.py:297-368 is the
artifact of such sweeps). This tool does the same over our run-name schema:
for each requested epoch it restores the checkpoint, runs read-level beam
evaluation over a held-out files_info index, and reports ref-length-weighted
identity; optionally exports the winner as a standalone params checkpoint.

Select on a held-out *selection* set, report on the *test* set — and select
by identity, not val_loss (they diverge; see docs/TRAINING.md).

  python tools/sweep_epochs.py --run-name model.1.joint.lambda8....spv16 \
      --epochs 44,46,48 --files-info datasets/sim_lambda/eval2/files_info...json \
      --data-type joint --export-best checkpoints/flagship
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
jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run-name", required=True,
                    help="checkpoint run name without the trailing .<epoch>")
    ap.add_argument("--epochs", required=True,
                    help="comma-separated epoch list, e.g. 44,46,48")
    ap.add_argument("--files-info", required=True)
    ap.add_argument("--data-type", default="joint", choices=["raw", "event", "joint"])
    ap.add_argument("--beam", type=int, default=5)
    ap.add_argument("--enc-units", type=int, default=128)
    ap.add_argument("--dec-units", type=int, default=128)
    ap.add_argument("--encoder-depth", type=int, default=2)
    ap.add_argument("--decoder-depth", type=int, default=1)
    ap.add_argument("--checkpoint-dir", default="models")
    ap.add_argument("--export-best", default=None,
                    help="save the best epoch's params to this checkpoint dir")
    ap.add_argument("--out", default=None, help="write the sweep table to this JSON")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    from ravvent_tpu.config import ModelConfig
    from ravvent_tpu.evaluation.basecall import BasecallEngine
    from ravvent_tpu.evaluation.mapping import MappingEvaluator
    from ravvent_tpu.models.basecaller import init_basecaller
    from ravvent_tpu.training.checkpoints import CheckpointManager

    cfg = ModelConfig(
        enc_units=args.enc_units, dec_units=args.dec_units,
        encoder_depth=args.encoder_depth, decoder_depth=args.decoder_depth,
        data_type=args.data_type,
    )
    tmpl = {"params": init_basecaller(jax.random.PRNGKey(0), cfg)}
    base = (Path(args.checkpoint_dir) / "snippets" / "mask"
            / f"encd_{args.encoder_depth}_decd_{args.decoder_depth}")
    cm = CheckpointManager(str(base))

    results = {}
    best_params = best_ep = None
    for ep in [int(e) for e in args.epochs.split(",")]:
        # training saves zero-padded epoch dirs (reference {epoch:02d} schema)
        name = f"{args.run_name}.{ep:02d}"
        if not (base / name).exists():
            name = f"{args.run_name}.{ep}"
        if not (base / name).exists():
            print(f"epoch {ep}: checkpoint missing ({base / name})", file=sys.stderr)
            continue
        params = cm.restore(name, template=tmpl)["params"]
        engine = BasecallEngine(params, cfg, chunk_size=1024)
        ev = MappingEvaluator(engine, beam_width=args.beam)
        res = Path(f"/tmp/sweep_epochs.{args.data_type}.{ep}.json")
        res.unlink(missing_ok=True)
        ev.evaluate_files(args.files_info, res)
        total, valid, invalid = ev.compute_total_results(res)
        results[ep] = {"total": total, "valid": valid, "invalid_pct": invalid}
        print(f"epoch {ep}: identity {total} (valid {valid}, invalid {invalid}%)",
              flush=True)
        if best_ep is None or total > results[best_ep]["total"]:
            best_ep, best_params = ep, params

    if not results:
        sys.exit("no checkpoints evaluated")
    print(f"best epoch: {best_ep} identity {results[best_ep]['total']}")
    if args.out:
        Path(args.out).write_text(json.dumps(
            {"run_name": args.run_name, "results": results, "best": best_ep},
            indent=2))
    if args.export_best:
        out = Path(args.export_best)
        CheckpointManager(str(out.parent)).save(out.name, best_params, epoch=best_ep)
        print(f"exported epoch {best_ep} -> {out}")


if __name__ == "__main__":
    main()

"""Accuracy evaluation CLI — the reference's mapping-evaluator sweep as a tool.

Runs read-level mapping evaluation for a trained checkpoint over a files_info
index (reference: ravvent_mapping_evaluator.py:203-237 ``evaluate_specific``),
writes per-read results incrementally, aggregates with the reference's
ref-length-weighted identity, and can fold results into an
``accuracy_results_all.<tag>.beam<k>.json`` file using the reference's schema
(``{depth_key: {data_type: [total, valid, invalid%]}}``).

  python tools/evaluate.py --checkpoint checkpoints/flagship \
      --files-info datasets/sim_lambda/eval/files_info.test.snippets.stride_6.json \
      --data-type joint --beam 5 --tag sim_lambda
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
    # separate cache: CPU AOT artifacts are machine-feature-specific and
    # must not mix with the TPU process's cache entries
    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache_cpu"))
else:
    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default="checkpoints/flagship")
    ap.add_argument("--files-info", default=None)
    ap.add_argument("--eval", action="append", default=[],
                    help="additional TAG:FILES_INFO[:CACHE_DIR] evaluations "
                         "run in the same process (amortizes compiles)")
    ap.add_argument("--data-type", default="joint", choices=["raw", "event", "joint"])
    ap.add_argument("--beam", type=int, default=None,
                    help="single beam width (default: use --beams)")
    ap.add_argument("--beams", default="5",
                    help="comma-separated beam widths, e.g. 5,1")
    ap.add_argument("--enc-units", type=int, default=128)
    ap.add_argument("--dec-units", type=int, default=128)
    ap.add_argument("--encoder-depth", type=int, default=2)
    ap.add_argument("--decoder-depth", type=int, default=1)
    ap.add_argument("--rnn-type", default="bilstm",
                    choices=["gru", "lstm", "bigru", "bilstm"])
    ap.add_argument("--out-dir", default="info/mapping_evaluations")
    ap.add_argument("--tag", default="sim_lambda")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--cache-dir", default=None)
    ap.add_argument("--geom-arbitration", type=float, default=None,
                    help="merge-fold geometry gate tolerance in bases "
                         "(default: the Merger default, arbitrated fold; "
                         "see assembly.merger.Merger)")
    ap.add_argument("--reference-fold", action="store_true",
                    help="disable geometry arbitration: bit-parity with the "
                         "reference merge fold (the pre-round-5 record fold)")
    ap.add_argument("--n-beams", type=int, default=1,
                    help="fetch the top-K beams per snippet and select by "
                         "junction overlap agreement before merging (phase "
                         "fix for periodic genomes; K=1 = reference flow)")
    ap.add_argument("--no-conf-gate", action="store_true",
                    help="disable the confidence gate (derailed-snippet "
                         "drop before the fold; assembly.merger."
                         "confidence_keep_mask). Implied by "
                         "--reference-fold.")
    ap.add_argument("--conf-gate", default=None,
                    help="override the gate parameters: "
                         "'rel_gap,abs_floor,max_drop_frac[,max_consecutive]' "
                         "(e.g. '0.12,-0.15,0.25,2'); default follows "
                         "merger.CONF_GATE_DEFAULT")
    args = ap.parse_args()

    from ravvent_tpu.config import ModelConfig
    from ravvent_tpu.evaluation.basecall import BasecallEngine
    from ravvent_tpu.evaluation.mapping import MappingEvaluator
    from ravvent_tpu.models.basecaller import init_basecaller
    from ravvent_tpu.training.checkpoints import CheckpointManager

    cfg = ModelConfig(
        enc_units=args.enc_units, dec_units=args.dec_units,
        encoder_depth=args.encoder_depth, decoder_depth=args.decoder_depth,
        rnn_type=args.rnn_type, data_type=args.data_type,
    )
    params = init_basecaller(jax.random.PRNGKey(0), cfg)
    ckpt = Path(args.checkpoint)
    if ckpt.exists():
        cm = CheckpointManager(str(ckpt.parent))
        params = cm.restore(ckpt.name, template={"params": params})["params"]
        print(f"loaded {ckpt}", file=sys.stderr)
    else:
        print("WARNING: random weights (checkpoint missing)", file=sys.stderr)

    engine = BasecallEngine(params, cfg, chunk_size=1024,
                            n_beams=args.n_beams)

    # evaluation plan: (tag, files_info, cache_dir) x beam widths
    plan = []
    if args.files_info:
        plan.append((args.tag, args.files_info, args.cache_dir))
    for spec in args.eval:
        parts = spec.split(":")
        tag, fi = parts[0], parts[1]
        cache = parts[2] if len(parts) > 2 else args.cache_dir
        plan.append((tag, fi, cache))
    if not plan:
        ap.error("need --files-info or at least one --eval TAG:FILES_INFO")
    beams = [args.beam] if args.beam else [int(b) for b in args.beams.split(",")]

    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    depth_key = f"({args.encoder_depth}, {args.decoder_depth})"
    for beam in beams:
        for tag, files_info, cache in plan:
            ga = (None if args.reference_fold
                  else args.geom_arbitration if args.geom_arbitration is not None
                  else "default")
            # --reference-fold promises bit-parity with the reference merge
            # semantics, so it also disables the confidence gate
            if args.no_conf_gate or args.reference_fold:
                cg = None
            elif args.conf_gate:
                parts = [float(x) for x in args.conf_gate.split(",")]
                if len(parts) == 4:
                    parts[3] = int(parts[3])
                cg = tuple(parts)
            else:
                cg = "default"
            ev = MappingEvaluator(engine, beam_width=beam, cache_dir=cache,
                                  geom_arbitration=ga, conf_gate=cg)
            res_path = out_dir / (
                f"mapping_evaluator_results.{tag}.{args.data_type}."
                f"encd{args.encoder_depth}.decd{args.decoder_depth}.beam{beam}.json"
            )
            ev.evaluate_files(files_info, res_path)
            total, valid, invalid = ev.compute_total_results(res_path)
            print(f"[{tag} beam{beam}] identity total/valid/invalid%: "
                  f"{total} / {valid} / {invalid}")

            # fold into the reference's accuracy_results_all schema
            all_path = out_dir / f"accuracy_results_all.{tag}.beam{beam}.json"
            all_res = {}
            if all_path.exists():
                all_res = json.loads(all_path.read_text())
            all_res.setdefault(depth_key, {})[args.data_type] = [total, valid, invalid]
            all_path.write_text(json.dumps(all_res, indent=2))
            print(f"aggregated -> {all_path}")


if __name__ == "__main__":
    main()

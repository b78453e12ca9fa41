"""Basecalling CLI: chiron signal (or fast5) in, FASTA/FASTQ out.

The production entry point (the reference has no CLI; its inference flow only
exists inside the evaluators). Loads a trained checkpoint, basecalls every
read in a directory with chunked beam decode + overlap merging, and writes
the assembled sequences.

Usage:
  python tools/basecall.py --checkpoint checkpoints/flagship \
      --input datasets/sim_lambda/eval --out basecalls.fasta [--beam 5]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default="checkpoints/flagship")
    ap.add_argument("--input", required=True, help="dir with .signal/.label or .fast5 files")
    ap.add_argument("--out", default="basecalls.fasta")
    ap.add_argument("--format", choices=["fasta", "fastq"], default="fasta")
    ap.add_argument("--beam", type=int, default=5)
    ap.add_argument("--data-type", default="joint", choices=["raw", "event", "joint"])
    ap.add_argument("--enc-units", type=int, default=128)
    ap.add_argument("--dec-units", type=int, default=128)
    ap.add_argument("--encoder-depth", type=int, default=2)
    ap.add_argument("--decoder-depth", type=int, default=1)
    ap.add_argument("--chunk", type=int, default=4096)
    ap.add_argument("--beam-impl", default="step", choices=["xla", "loop", "step"])
    ap.add_argument("--pack-u8", action=argparse.BooleanOptionalAction, default=True,
                    help="nibble-pack tokens + u8-quantize step probs (2x less download)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--no-conf-gate", action="store_true",
                    help="keep every decoded snippet in the merge fold "
                         "(disable the derailed-snippet confidence gate; "
                         "results/CONF_GATE.md)")
    args = ap.parse_args()

    from ravvent_tpu.config import ModelConfig
    from ravvent_tpu.data.snippets import prepare_compact
    from ravvent_tpu.data import chiron
    from ravvent_tpu.assembly.merger import Merger
    from ravvent_tpu.evaluation.basecall import BasecallEngine
    from ravvent_tpu.models.basecaller import init_basecaller
    from ravvent_tpu.training.checkpoints import CheckpointManager
    from ravvent_tpu.utils.io import read_fast5_signal

    cfg = ModelConfig(
        enc_units=args.enc_units, dec_units=args.dec_units,
        encoder_depth=args.encoder_depth, decoder_depth=args.decoder_depth,
        data_type=args.data_type,
    )
    params = init_basecaller(jax.random.PRNGKey(0), cfg)
    ckpt = Path(args.checkpoint)
    if ckpt.exists():
        cm = CheckpointManager(str(ckpt.parent))
        params = cm.restore(ckpt.name, template={"params": params})["params"]
        print(f"loaded checkpoint {ckpt}", file=sys.stderr)
    else:
        print("WARNING: no checkpoint found — using random weights", file=sys.stderr)

    import jax.numpy as jnp
    beam_impl = args.beam_impl if jax.default_backend() in ("tpu", "axon") else "xla"
    engine = BasecallEngine(params, cfg, chunk_size=args.chunk,
                            memory_dtype=jnp.bfloat16, project_values=True,
                            beam_impl=beam_impl, pack_u8=args.pack_u8)
    merger = Merger()

    in_dir = Path(args.input)
    reads = []
    fast5s = sorted(in_dir.glob("*.fast5"))
    signals = sorted(in_dir.glob("*.signal"))
    if fast5s:
        reads = [(p.stem, read_fast5_signal(p), None) for p in fast5s]
    else:
        for sp in signals:
            lp = sp.with_suffix(".label")
            reads.append((sp.stem, chiron.load_signal(sp), lp if lp.exists() else None))
    if not reads:
        sys.exit(f"no .fast5 or .signal files in {in_dir}")

    t0 = time.time()
    n_bases = 0
    with open(args.out, "wt") as out:
        for name, raw, label_path in reads:
            if label_path is not None:
                ranges, _ = chiron.load_label(label_path)
            else:
                # no labels: treat the whole read as the region of interest
                ranges = np.array([[0, raw.size]])
            sig, rr, ev, er, _syms, _aux = prepare_compact(
                raw, ranges, np.array(["a"] * len(ranges)), stride=6
            )
            if rr.shape[0] == 0:
                print(f"{name}: no snippets (read too short)", file=sys.stderr)
                continue
            tokens, probs = engine.predict_beam_compact(sig, rr, ev, er, 40, args.beam)
            seqs = engine.tokens_to_sequences(tokens)
            probs = np.asarray(probs, dtype=np.float64)
            rows = [p[: len(s)] for s, p in zip(seqs, probs)]
            # production fold inputs: positional prior from the snippet
            # raw-span geometry + the round-5b confidence gate (derailed
            # low-confidence snippets dropped; results/CONF_GATE.md)
            lens = np.array([len(s) for s in seqs], dtype=np.int64)
            keep = np.ones(len(seqs), bool)
            if not args.no_conf_gate and len(seqs) > 1:
                from ravvent_tpu.assembly.merger import (
                    CONF_GATE_DEFAULT, confidence_keep_mask,
                )

                offsets = np.concatenate([[0], np.cumsum(lens)])
                flat = (np.concatenate(rows) if rows
                        else np.zeros(0, np.float64))
                keep = confidence_keep_mask(flat, offsets,
                                            *CONF_GATE_DEFAULT)
            from ravvent_tpu.assembly.merger import (
                expected_overlaps_from_ranges,
            )

            seqs_k = [s for s, k in zip(seqs, keep) if k]
            rows_k = [r for r, k in zip(rows, keep) if k]
            eo = (expected_overlaps_from_ranges(rr[keep], lens[keep])
                  if keep.sum() > 1 else None)
            merged = merger.merge_arrays(seqs_k, rows_k,
                                         expected_overlaps=eo)
            n_bases += len(merged.seq)
            if args.format == "fasta":
                out.write(f">{name}\n{merged.seq}\n")
            else:
                qual = "".join(
                    chr(33 + min(40, int(-10 * np.log10(max(1e-4, 1 - p)))))
                    for p in merged.logits
                )
                out.write(f"@{name}\n{merged.seq}\n+\n{qual}\n")
            print(f"{name}: {len(merged.seq)} bases", file=sys.stderr)
    dt = time.time() - t0
    print(f"{len(reads)} reads, {n_bases} bases in {dt:.1f}s "
          f"({n_bases / max(dt, 1e-9):.0f} bases/s)", file=sys.stderr)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Sweep the read-pipeline depth (inflight / finishers / stream length) on
the bench dataset and report steady-state throughput per configuration.

This is how the bench defaults (inflight=8, finishers=4, 3x read stream —
docs/PERFORMANCE.md entry 19) were chosen: with a shallow pipeline the
device idles whenever several reads sit in their merge/fetch tails, and
over a short read list the fill/drain edges dominate the wall. Compare
configurations within ONE process (min-of-N) — cross-process wall-clock on
the tunneled device varies with contention.

Usage:
  python tools/sweep_pipeline.py [--configs 3:2,4:3,6:4,8:4] [--mults 1,3]
                                 [--passes 3]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))

import numpy as np  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="3:2,4:3,6:4,8:4",
                    help="comma-separated inflight:finishers pairs")
    ap.add_argument("--mults", default="1,3",
                    help="read-stream repetitions of the bench read list")
    ap.add_argument("--passes", type=int, default=3,
                    help="min-of-N passes per configuration")
    ap.add_argument("--beam", type=int, default=5)
    args = ap.parse_args()

    saved_argv, sys.argv = sys.argv, ["bench"]
    import bench  # noqa: E402

    sys.argv = saved_argv
    import jax.numpy as jnp  # noqa: E402

    from ravvent_tpu.evaluation.basecall import BasecallEngine
    from ravvent_tpu.evaluation.performance import PerformanceEvaluator

    fi, fi_stream = bench.ensure_dataset()
    cfg, params, _ = bench.load_flagship()
    # Pallas beam kernels target TPU; mirror bench.py's backend guard so the
    # sweep still runs on a CPU backend (e.g. during a tunnel outage).
    beam_impl = "step" if jax.default_backend() in ("tpu", "axon") else "xla"
    eng = BasecallEngine(
        params, cfg, chunk_size=4096, memory_dtype=jnp.bfloat16,
        project_values=True, beam_impl=beam_impl, encoder_dtype=jnp.bfloat16,
        pack_u8=True, transport_dtype="i8dev", prob_bits=4,
    )

    # warm the compact-path compile (same shapes bench warms)
    rng = np.random.default_rng(0)
    w_sig = rng.normal(size=(4096 * 54,)).astype(np.float32)
    w_ev = rng.normal(size=(4096 * 6, 5)).astype(np.float32)
    st = (np.arange(4096) * 54).astype(np.int64)
    es = (np.arange(4096) * 6).astype(np.int64)
    w_aux = {"ev_lens": np.full(4096 * 6, 9, np.uint16),
             "scaler_mean": np.zeros(5, np.float32),
             "scaler_std": np.ones(5, np.float32),
             "raw_mean": 0.0, "raw_std": 1.0, "stride": 6, "contiguous": True}
    eng.predict_beam_compact(w_sig, np.stack([st, st + 190], 1), w_ev,
                             np.stack([es, es + 25], 1), 40, args.beam,
                             aux=w_aux)

    pe = PerformanceEvaluator(eng, beam_width=args.beam,
                              cache_dir=str(REPO / ".bench_data" / "cache"))
    # the distinct-read stream set (12 reads), like bench.py's pipelined
    # measurement — repeated short lists flatter the pipeline
    with open(fi_stream) as f:
        paths = [v["signal_path"] for v in json.load(f)]

    rows = []
    for mult in (int(m) for m in args.mults.split(",")):
        stream = paths * mult
        for pair in args.configs.split(","):
            infl, fin = (int(x) for x in pair.split(":"))
            # fastest pass = the min-wall record (same steady-state
            # discipline as bench.py; min over bases_per_s would pick the
            # SLOWEST pass and skew config comparisons)
            best = min(
                (pe.run_pipelined(stream, inflight=infl, finishers=fin)
                 for _ in range(args.passes)),
                key=lambda r: r["wall_s"],
            )["bases_per_s"]
            rows.append({"reads": len(stream), "inflight": infl,
                         "finishers": fin, "bases_per_s": round(best, 1)})
            print(f"reads={len(stream)} inflight={infl} finishers={fin}: "
                  f"{best / 1e3:8.1f}k bases/s", flush=True)
    print(json.dumps({"metric": "pipeline depth sweep", "rows": rows}))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Dump the optimized HLO of the packed compact beam program and summarize
its while loops (trip counts, body fusion shapes) — ground truth for mapping
profiler trace entries (tools/parse_trace.py) back to source constructs.

Usage: python tools/dump_hlo.py [--beam-impl step] [--transport i8dev]
       [--out /tmp/beam.hlo] [--summary]
"""

from __future__ import annotations

import argparse
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--beam-impl", default="step", choices=["xla", "loop", "step"])
    ap.add_argument("--memory", default="bf16", choices=["bf16", "i8", "f32"])
    ap.add_argument("--transport", default="i8dev",
                    choices=["f16", "f32", "i8", "i8sig", "i8dev"])
    ap.add_argument("--beam", type=int, default=5)
    ap.add_argument("--chunk", type=int, default=4096)
    ap.add_argument("--out", default="/tmp/beam_compact_packed.hlo")
    args = ap.parse_args()

    saved_argv, sys.argv = sys.argv, ["bench"]
    import bench  # noqa: E402

    sys.argv = saved_argv
    bench.ensure_dataset()
    cfg, params, trained = bench.load_flagship()
    from ravvent_tpu.data.snippets import load_read_compact_ex
    from ravvent_tpu.evaluation.basecall import BasecallEngine

    mem = {"bf16": jnp.bfloat16, "i8": "i8", "f32": None}[args.memory]
    eng = BasecallEngine(
        params, cfg, chunk_size=args.chunk, memory_dtype=mem,
        project_values=True, beam_impl=args.beam_impl,
        encoder_dtype=jnp.bfloat16, pack_u8=True,
        transport_dtype=args.transport,
    )
    # Capture the real packed call args by running one predict through a shim.
    sig_path = sorted((REPO / ".bench_data").glob("read_*.signal"))[0]
    sig, rr, ev, er, nuc, aux = load_read_compact_ex(
        sig_path, sig_path.with_suffix(".label"), 6, cache_dir=None
    )
    mol = int((nuc != 0).sum(axis=1).max())
    calls = []
    real = eng._beam_compact_packed_jit

    class Cap:
        def __call__(self, *a, **k):
            calls.append((a, k))
            return real(*a, **k)

    eng._beam_compact_packed_jit = Cap()
    eng.predict_beam_compact(sig, rr, ev, er, mol, args.beam, aux=aux)
    eng._beam_compact_packed_jit = real
    a, k = calls[0]
    lowered = jax.jit(
        real.__wrapped__,
        static_argnames=("S_b", "E_b", "beam_width", "T_out", "n_rows",
                         "stride"),
    ).lower(*a, **k)
    hlo = lowered.compile().as_text()
    Path(args.out).write_text(hlo)
    print(f"optimized HLO ({len(hlo.splitlines())} lines) -> {args.out}")

    # Summary: while loops with induction bounds + body op histogram.
    # Optimized HLO while loops carry trip counts in backend_config or can be
    # inferred from the condition's constant compare.
    lines = hlo.splitlines()
    bodies = {}
    cur = None
    for ln in lines:
        m = re.match(r"%?([\w.\-]+)\s*\([\w.,\s%:\[\]\/]*\)\s*->", ln)
        if m:
            cur = m.group(1)
            bodies[cur] = []
        elif cur is not None and ln.strip():
            bodies[cur].append(ln)
    whiles = [ln for ln in lines if " while(" in ln or "= while(" in ln]
    print(f"\n{len(whiles)} while ops:")
    for ln in whiles:
        m = re.search(r"body=%?([\w.\-]+)", ln)
        body = m.group(1) if m else "?"
        shape = ln.strip().split(" ")[1] if len(ln.strip().split(" ")) > 1 else ""
        n_fus = sum(1 for b in bodies.get(body, []) if "fusion" in b)
        n_dot = sum(1 for b in bodies.get(body, []) if " dot(" in b or "convolution" in b)
        n_cc = sum(1 for b in bodies.get(body, []) if "custom-call" in b)
        print(f"  body={body:30s} body_lines={len(bodies.get(body, [])):4d} "
              f"fusions={n_fus} dots={n_dot} custom_calls={n_cc}")
        # find trip-count hints: a constant compare in the matching condition
        cond = body.replace("body", "cond").replace("Body", "Cond")
        for b in bodies.get(cond, []):
            if "compare" in b and "constant" in b:
                print(f"      cond: {b.strip()[:120]}")


if __name__ == "__main__":
    main()

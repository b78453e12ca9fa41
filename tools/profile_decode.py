#!/usr/bin/env python
"""Decompose per-read beam-decode time: host pack, H2D upload, device
compute (resident args), D2H fetch, and end-to-end predict.

The end-to-end number is what the performance evaluator's ``t_predicting``
measures (reference timing partition: ravvent_performance_evaluator.py:32-87);
the decomposition shows which leg to optimize. On a remote-attached device
each H2D/D2H message pays ~30-50ms of fixed link latency, so the compute
leg must be measured with resident arguments — naive timing conflates the
legs.

Usage: python tools/profile_decode.py [--beam-impl step|loop|xla]
       [--memory bf16|i8|f32] [--transport f16|f32|i8] [--read N]
"""

from __future__ import annotations

import argparse
import sys
import time
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
    ap.add_argument("--memory", default="bf16",
                    choices=["bf16", "i8", "i8mxu", "f32"])
    ap.add_argument("--transport", default="f16",
                    choices=["f16", "f32", "i8", "i8sig", "i8dev"])
    ap.add_argument("--beam", type=int, default=5)
    ap.add_argument("--chunk", type=int, default=4096)
    ap.add_argument("--read", type=int, default=0)
    ap.add_argument("--repeats", type=int, default=6)
    args = ap.parse_args()

    saved_argv, sys.argv = sys.argv, ["bench"]
    import bench  # noqa: E402

    sys.argv = saved_argv
    bench.ensure_dataset()
    cfg, params, trained = bench.load_flagship()
    from ravvent_tpu.data.snippets import load_read_compact_ex
    from ravvent_tpu.evaluation.basecall import BasecallEngine

    mem = {"bf16": jnp.bfloat16, "i8": "i8", "i8mxu": "i8mxu",
           "f32": None}[args.memory]
    eng = BasecallEngine(
        params, cfg, chunk_size=args.chunk, memory_dtype=mem,
        project_values=True, beam_impl=args.beam_impl,
        encoder_dtype=jnp.bfloat16, pack_u8=True, transport_dtype=args.transport,
    )
    sig_path = sorted((REPO / ".bench_data").glob("read_*.signal"))[args.read]
    sig, rr, ev, er, nuc, aux = load_read_compact_ex(
        sig_path, sig_path.with_suffix(".label"), 6, cache_dir=None
    )
    mol = int((nuc != 0).sum(axis=1).max())
    print(f"read={sig_path.name} snippets={rr.shape[0]} max_output_len={mol} "
          f"impl={args.beam_impl} memory={args.memory} transport={args.transport}")

    calls = []
    real = eng._beam_compact_packed_jit

    class Cap:
        def __call__(self, *a, **k):
            calls.append((a, k))
            return real(*a, **k)

    t0 = time.perf_counter()
    eng._beam_compact_packed_jit = Cap()
    out = eng.predict_beam_compact(sig, rr, ev, er, mol, args.beam, aux=aux)
    eng._beam_compact_packed_jit = real
    print(f"cold predict: {time.perf_counter() - t0:.1f}s "
          f"(slabs: {[a[1].shape[0] for a, _ in calls]})")

    def best(fn):
        vals = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            fn()
            vals.append(time.perf_counter() - t0)
        return min(vals) * 1e3

    # end-to-end (what t_predicting measures)
    e2e = best(lambda: eng.predict_beam_compact(sig, rr, ev, er, mol, args.beam, aux=aux))

    # host pack only: no-op device call (the engine calls
    # copy_to_host_async() on the result before materializing it)
    class FakeBuf(np.ndarray):
        def copy_to_host_async(self):
            pass

    class Fake:
        def __call__(self, *a, **k):
            return out_arr

    out_arr = np.zeros_like(np.asarray(real(*calls[0][0], **calls[0][1]))).view(FakeBuf)
    eng._beam_compact_packed_jit = Fake()
    host = best(lambda: eng.predict_beam_compact(sig, rr, ev, er, mol, args.beam, aux=aux))
    eng._beam_compact_packed_jit = real

    tot_up = tot_comp = tot_fetch = 0.0
    for a, k in calls:
        h = np.asarray(a[1])
        tot_up += best(lambda: jax.device_put(h).block_until_ready())
        buf_d = jax.device_put(h)
        buf_d.block_until_ready()
        rargs = (a[0], buf_d) + tuple(a[2:])
        r = real(*rargs, **k)
        r.block_until_ready()
        tot_comp += best(lambda: real(*rargs, **k).block_until_ready())
        tot_fetch += best(lambda: np.asarray(real(*rargs, **k))) - tot_comp

    print(f"host pack+unpack : {host:8.1f} ms")
    print(f"H2D upload       : {tot_up:8.1f} ms "
          f"({sum(a[1].nbytes for a, _ in calls)} bytes)")
    print(f"device compute   : {tot_comp:8.1f} ms (resident args)")
    print(f"D2H fetch        : {max(tot_fetch, 0.0):8.1f} ms "
          f"({sum(np.asarray(real(*a, **k)).nbytes for a, k in calls)} bytes)")
    print(f"sum of legs      : {host + tot_up + tot_comp + max(tot_fetch, 0.0):8.1f} ms")
    print(f"end-to-end       : {e2e:8.1f} ms (async overlap may beat the sum)")


if __name__ == "__main__":
    main()

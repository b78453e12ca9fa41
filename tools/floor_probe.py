"""Floor-account the two unexplained pipeline numbers (VERDICT r4 item 5):

1. compact/i8dev pipelined `collect_wait` (1.12 s over 12 reads at round 4)
   — device-bound or fetch/host-bound? Probes:
     - pass A: the production pipeline (stage times + wall);
     - pass B: load+dispatch only, block on the LAST slab ("device stream
       floor": everything the device must do, with fetches overlapped and
       zero host postproc/merge);
     - pass C: host-only postprocess+merge over pre-collected decodes
       ("host work floor").
   If wall(A) ~= wall(B) the pipeline is device-bound and collect_wait is
   finishers idling on device compute — a floor, not an overhead.

2. sigdev `dispatch` (0.43 s over 12 reads at round 4, vs i8dev's 0.025 s)
   — per-read split of begin (upload + segmentation enqueue) vs finish
   (meta wait + slab planning/enqueue), under the pipeline's one-read lag,
   against the measured link round-trip.

Run on the TPU: python tools/floor_probe.py [--reads N]
Writes results/floor_probe.json.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))

import numpy as np

timer = time.perf_counter


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=12)
    ap.add_argument("--beam", type=int, default=5)
    ap.add_argument("--chunk", type=int, default=4096)
    ap.add_argument("--out", default="results/floor_probe.json")
    args = ap.parse_args()

    sys.argv = [sys.argv[0]]  # bench.py re-parses argv at import
    import bench

    fi, fi_stream = bench.ensure_dataset()
    cfg, params, trained = bench.load_flagship()
    import jax.numpy as jnp

    from ravvent_tpu.data import chiron
    from ravvent_tpu.data.snippets import load_read_compact_ex
    from ravvent_tpu.evaluation.basecall import BasecallEngine
    from ravvent_tpu.evaluation.performance import PerformanceEvaluator

    engine = BasecallEngine(params, cfg, chunk_size=args.chunk,
                            memory_dtype=jnp.bfloat16, project_values=True,
                            beam_impl="step", encoder_dtype=jnp.bfloat16,
                            pack_u8=True, transport_dtype="i8dev",
                            prob_bits=4)
    cache = str(bench.BENCH_DATA / "cache")
    with open(fi_stream) as f:
        stream = [v["signal_path"] for v in json.load(f)][: args.reads]

    out = {"device": str(jax.devices()[0]), "reads": len(stream)}

    # ---- link round-trip + upload bandwidth probes ----
    x = engine._put(np.zeros(8, np.uint8))
    for _ in range(3):
        np.asarray(engine._put(np.zeros(8, np.uint8)))
    t0 = timer()
    reps = 10
    for _ in range(reps):
        np.asarray(engine._put(np.zeros(8, np.uint8)))
    rtt = (timer() - t0) / reps
    big = np.zeros(1 << 22, np.uint8)  # 4 MB
    engine._put(big)
    t0 = timer()
    for _ in range(3):
        jax.block_until_ready(engine._put(big))
    up_bw = 3 * big.nbytes / (timer() - t0)
    out["link_rtt_ms"] = round(rtt * 1e3, 2)
    out["upload_MBps"] = round(up_bw / 1e6, 1)

    pe = PerformanceEvaluator(engine, beam_width=args.beam, cache_dir=cache)

    # warm both paths (compile + preprocessing cache)
    pe.run_pipelined(stream, inflight=8, finishers=4)

    # ---- pass A: production pipeline ----
    recA = min((pe.run_pipelined(stream, inflight=8, finishers=4)
                for _ in range(3)), key=lambda r: r["wall_s"])
    out["A_pipeline"] = {k: recA[k] for k in
                        ("wall_s", "bases_per_s", "stages_s")}

    # ---- pass B: load+dispatch only, block on last slab ----
    def pass_b():
        t0 = timer()
        handles = []
        for p in stream:
            lp = Path(p).with_suffix(".label")
            handles.append(pe._dispatch_compact(p, lp))
        # block on every slab of the last read (and drain the rest without
        # host postprocessing by materializing their packed buffers)
        for h in handles:
            for packed, n in h.pending:
                jax.block_until_ready(packed)
        return timer() - t0

    pass_b()  # warm
    out["B_device_stream_wall_s"] = round(min(pass_b() for _ in range(3)), 4)

    # ---- pass C: host-only postprocess + merge on collected decodes ----
    collected = []
    for p in stream:
        lp = Path(p).with_suffix(".label")
        h = pe._dispatch_compact(p, lp)
        tokens, probs = pe.engine.collect_beam_compact(h)
        sig, rr, ev, er, nuc, aux = load_read_compact_ex(
            p, lp, pe.stride, cache_dir=pe.cache_dir)
        collected.append((tokens, probs, rr))
    from ravvent_tpu.assembly.merger import expected_overlaps_from_ranges

    def pass_c():
        t0 = timer()
        for tokens, probs, rr in collected:
            blob, offsets, fp = pe._postprocess(tokens, probs)
            eo = (expected_overlaps_from_ranges(rr, np.diff(offsets))
                  if rr.shape[0] > 1 and rr.shape[0] == offsets.size - 1
                  else None)
            pe.merger.merge_flat(blob, offsets, fp, expected_overlaps=eo)
        return timer() - t0

    pass_c()
    out["C_host_work_s"] = round(min(pass_c() for _ in range(3)), 4)

    # ---- sigdev dispatch split ----
    pes = PerformanceEvaluator(engine, beam_width=args.beam, cache_dir=cache,
                               wire="sigdev")
    pes.run_pipelined(stream, inflight=8, finishers=4)  # warm
    recS = min((pes.run_pipelined(stream, inflight=8, finishers=4)
                for _ in range(3)), key=lambda r: r["wall_s"])
    out["S_sigdev_pipeline"] = {k: recS[k] for k in
                               ("wall_s", "bases_per_s", "stages_s")}

    begin_t, finish_t, slabs = [], [], []
    segs = []
    for p in stream:  # begin all first (mirrors the pipeline's lag)
        raw = chiron.load_signal(p)
        t0 = timer()
        seg = engine.begin_beam_signal(raw, stride=pes.stride,
                                       sig_wire=pes.sig_wire)
        begin_t.append(timer() - t0)
        segs.append(seg)
    for seg in segs:
        t0 = timer()
        h = engine.finish_beam_signal(seg, beam_width=args.beam)
        finish_t.append(timer() - t0)
        if h is not None:
            slabs.append(len(h.pending))
            for packed, n in h.pending:
                jax.block_until_ready(packed)
    out["sigdev_begin_ms_per_read"] = round(1e3 * float(np.mean(begin_t)), 2)
    out["sigdev_finish_ms_per_read"] = round(1e3 * float(np.mean(finish_t)), 2)
    out["sigdev_slabs_per_read"] = round(float(np.mean(slabs)), 2)

    Path(args.out).write_text(json.dumps(out, indent=2))
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()

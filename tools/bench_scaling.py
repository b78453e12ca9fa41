"""Multi-chip scaling benchmark: throughput vs mesh size.

The reference has no distributed execution (SURVEY.md §2.3); this harness
measures the green-field scaling story: snippet batches sharded over a
``('data',)`` mesh (ShardedBasecallEngine), reads owned per host. It runs the
reference throughput protocol (beam prediction + postprocessing + merge over
``total_processing``, reference: ravvent_performance_evaluator.py) at a
ladder of mesh sizes and reports bases/s + parallel efficiency per size.

On real multi-chip hardware this measures true scaling; without it, run on a
virtual CPU mesh (``--virtual N``) to exercise the identical sharded program
(numbers then characterize the harness, not TPU silicon).

Usage:
  python tools/bench_scaling.py --virtual 8 --sizes 1,2,4,8
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax  # noqa: E402

if "--virtual" in sys.argv:
    _n = int(sys.argv[sys.argv.index("--virtual") + 1])
    try:
        import jax.extend

        jax.extend.backend.clear_backends()
    except Exception:
        pass
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", _n)
cache = ".jax_cache_cpu" if "--virtual" in sys.argv else ".jax_cache"
jax.config.update("jax_compilation_cache_dir", str(REPO / cache))

import numpy as np  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--virtual", type=int, default=None, metavar="N",
                    help="use an N-device virtual CPU mesh (no TPU needed)")
    ap.add_argument("--sizes", default="1,2,4,8",
                    help="comma-separated mesh sizes to sweep")
    ap.add_argument("--reads", type=int, default=2)
    ap.add_argument("--read-len", type=int, default=6000)
    ap.add_argument("--chunk", type=int, default=512)
    ap.add_argument("--beam", type=int, default=5)
    ap.add_argument("--data-dir", default=str(REPO / ".bench_scaling_data"))
    ap.add_argument("--pipelined", action="store_true",
                    help="measure the pipelined read stream per mesh size "
                         "(steady-state production number) instead of the "
                         "sequential per-read partition")
    ap.add_argument("--compare-single", action="store_true",
                    help="also run the plain single-device engine to report "
                         "the mesh wrapper's n=1 overhead (the 'per-chip "
                         "throughput within ~10%% of single-chip' check)")
    args = ap.parse_args()

    import jax.numpy as jnp  # noqa: E402

    from ravvent_tpu.config import ModelConfig
    from ravvent_tpu.data import chiron, simulator
    from ravvent_tpu.evaluation.basecall import BasecallEngine
    from ravvent_tpu.evaluation.performance import PerformanceEvaluator
    from ravvent_tpu.models.basecaller import init_basecaller
    from ravvent_tpu.parallel.inference import ShardedBasecallEngine
    from ravvent_tpu.parallel.mesh import make_mesh

    data_dir = Path(args.data_dir)
    fi = data_dir / "files_info.snippets.stride_6.json"
    if not fi.exists():
        rng = np.random.default_rng(7)
        genome = simulator.generate_reduced_genome(43, 120_000, rng)
        simulator.generate_chiron_dataset(
            data_dir, genome, n_reads=args.reads,
            read_len_range=(args.read_len, args.read_len + 2000),
            seed=1234, noise_std=9.0,
        )
        fi = chiron.create_files_info(data_dir, stride=6, verbose=False)

    cfg = ModelConfig(
        enc_units=128, dec_units=128, encoder_depth=2, decoder_depth=1,
        rnn_type="bilstm", attention_type="luong", data_type="joint",
    )
    params = init_basecaller(jax.random.PRNGKey(0), cfg)
    ckpt = REPO / "checkpoints" / "flagship"
    if ckpt.exists():
        try:
            from ravvent_tpu.training.checkpoints import CheckpointManager

            state = CheckpointManager(str(ckpt.parent)).restore(
                "flagship", template={"params": params})
            params = state["params"]
        except Exception as e:  # pragma: no cover
            print(f"warning: checkpoint load failed: {e}", file=sys.stderr)

    # full fast-path configuration (the sharded engine runs the identical
    # single-device program per chip); Pallas beam kernels only on TPU
    on_tpu = jax.default_backend() in ("tpu", "axon")
    fast = dict(
        transport_dtype="i8dev", pack_u8=True, prob_bits=4,
        project_values=True,
        beam_impl="step" if on_tpu else "xla",
        memory_dtype=jnp.bfloat16 if on_tpu else None,
        encoder_dtype=jnp.bfloat16 if on_tpu else None,
    )

    with open(fi) as f:
        paths = [v["signal_path"] for v in json.load(f)]

    def measure(engine, tag):
        pe = PerformanceEvaluator(
            engine, beam_width=args.beam, cache_dir=str(data_dir / "cache"))
        if args.pipelined:
            rec = min((pe.run_pipelined(paths * 3) for _ in range(2)),
                      key=lambda r: r["wall_s"])
            return rec["bases_per_s"]
        results = pe.evaluate_files(
            fi, data_dir / f"perf_{tag}.json", verbose=False, repeats=3)
        bases = sum(r["bases_num"] for r in results)
        t = sum(r["total_processing"] for r in results)
        return bases / t

    sizes = [int(s) for s in args.sizes.split(",")]
    n_avail = len(jax.devices())
    sizes = [s for s in sizes if s <= n_avail]
    rows = []
    single = None
    if args.compare_single:
        engine = BasecallEngine(params, cfg, chunk_size=args.chunk, **fast)
        single = measure(engine, "single")
        print(f"plain single-device engine: {single:.1f} bases/s")
    for n in sizes:
        mesh = make_mesh(n)
        engine = ShardedBasecallEngine(
            params, cfg, mesh, chunk_size=args.chunk, **fast)
        rows.append({"mesh": n, "bases_per_s": measure(engine, f"mesh{n}")})

    base = rows[0]["bases_per_s"]
    print(f"{'mesh':>5} {'bases/s':>12} {'speedup':>8} {'efficiency':>10}")
    for r in rows:
        sp = r["bases_per_s"] / base
        eff = sp / r["mesh"]
        r["speedup"] = round(sp, 2)
        r["efficiency"] = round(eff, 3)
        print(f"{r['mesh']:>5} {r['bases_per_s']:>12.1f} {sp:>8.2f} {eff:>10.3f}")
    out = {
        "metric": "scaling sweep (sharded inference)",
        "device": str(jax.devices()[0]),
        "pipelined": args.pipelined,
        "rows": rows,
    }
    if single is not None:
        out["single_device_bases_per_s"] = single
        out["mesh1_vs_single"] = round(rows[0]["bases_per_s"] / single, 3) \
            if rows and rows[0]["mesh"] == 1 else None
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""Training memory/throughput profiling run.

The reference's ``test_training_memory_time.py`` is a manual profiling
script: a short fit (30 steps, 1 epoch) per data type under
``memory_profiler`` with a wall timer (reference:
test_training_memory_time.py:55-71). This is its rebuild: for each requested
data type it runs a timed N-step epoch (optionally resuming a checkpoint,
as the reference resumes epoch 20) and reports steps/s, examples/s, and
device memory stats (live bytes / peak bytes per device, the TPU analog of
host RSS profiling).

  python tools/train_profile.py --dataset datasets/sim_lambda \
      [--data-types raw,event,joint] [--steps 30] [--batch-size 128]

Writes one JSON with all results (default info/train_profile.json) and
prints a per-type summary line.
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

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))


def device_memory() -> dict:
    """Per-device live/peak bytes where the backend exposes them."""
    out = {}
    for d in jax.local_devices():
        try:
            s = d.memory_stats() or {}
        except Exception:
            s = {}
        out[str(d)] = {
            "bytes_in_use": s.get("bytes_in_use"),
            "peak_bytes_in_use": s.get("peak_bytes_in_use"),
        }
    return out


def profile_type(data_type: str, fi_train: str, cache: str, steps: int,
                 batch_size: int, resume_path: str | None) -> dict:
    from ravvent_tpu.config import DataConfig, ModelConfig, RunConfig, TrainConfig
    from ravvent_tpu.data.generator import SnippetBatchGenerator
    from ravvent_tpu.training.checkpoints import CheckpointManager
    from ravvent_tpu.training.loop import Trainer

    cfg = RunConfig(
        data=DataConfig(batch_size=batch_size),
        model=ModelConfig(data_type=data_type),
        train=TrainConfig(batch_size=batch_size, steps_per_epoch=steps),
    )
    gen = SnippetBatchGenerator.from_config(fi_train, cfg.data, cache_dir=cache)
    trainer = Trainer(cfg)
    if resume_path:
        state = CheckpointManager(".").restore(
            resume_path, template={"params": trainer.params})
        trainer.params = state["params"]

    # one warm-up step (compile), then the timed run — the reference's wall
    # timer includes compile; we report both so either comparison works
    it = iter(gen.epoch())
    t_compile0 = time.perf_counter()
    trainer.train_on_batch(next(it))
    jax.block_until_ready(trainer.params)
    t_compile = time.perf_counter() - t_compile0

    t0 = time.perf_counter()
    losses = []
    for _ in range(steps):
        try:
            batch = next(it)
        except StopIteration:
            it = iter(gen.epoch())
            batch = next(it)
        losses.append(trainer.train_on_batch(batch)["loss"])
    jax.block_until_ready(losses[-1])
    dt = time.perf_counter() - t0

    return {
        "data_type": data_type,
        "steps": steps,
        "batch_size": batch_size,
        "compile_plus_first_step_s": t_compile,
        "train_time_s": dt,
        "steps_per_s": steps / dt,
        "examples_per_s": steps * batch_size / dt,
        "final_loss": float(losses[-1]),
        "device_memory": device_memory(),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="datasets/sim_lambda")
    ap.add_argument("--files-info", default=None)
    ap.add_argument("--data-types", default="raw,event,joint")
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--resume-path", default=None,
                    help="params checkpoint to profile from (reference resumes epoch 20)")
    ap.add_argument("--out", default="info/train_profile.json")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    ds = Path(args.dataset)
    fi = args.files_info or str(ds / "train" / "files_info.snippets.stride_6.json")
    if not Path(fi).exists():
        alt = ds / "files_info.all_train.json"
        if alt.exists():
            fi = str(alt)
        else:
            sys.exit(f"no files_info found under {ds}")
    cache = str(ds / ".cache")

    results = []
    for dt in args.data_types.split(","):
        r = profile_type(dt, fi, cache, args.steps, args.batch_size,
                         args.resume_path)
        results.append(r)
        print(f"{dt}: {r['steps_per_s']:.2f} steps/s "
              f"({r['examples_per_s']:.0f} ex/s), "
              f"compile+1st {r['compile_plus_first_step_s']:.1f}s, "
              f"loss {r['final_loss']:.4f}", flush=True)

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(
        {"device": str(jax.devices()[0]), "results": results}, indent=2))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()

"""Staged-curriculum training + identity-based epoch selection, one process.

The working recipe for this model family (docs/TRAINING.md): teacher-forced
pretrain, scheduled-sampling fine-tune, then anneal the sampling probability —
each stage warm-starts from the previous one (params AND optimizer moments),
mirroring the reference's chained runs (reference: ravvent.py:57-59 resume
pattern + rename_models.py epoch chaining). After the last stage, the final
epochs are swept by held-out mapping identity (the reference's
``evaluate_specific`` epoch sweep, ravvent_mapping_evaluator.py:203-237) and
the best checkpoint is exported.

One model, one command:
  python tools/train_curriculum.py --dataset datasets/ref45 --tag ref45 \
      --data-type joint --export checkpoints/ref45_joint
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
    # separate cache: CPU AOT artifacts are machine-feature-specific and
    # must not mix with the TPU process's cache entries
    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache_cpu"))
else:
    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))

# (teacher_forcing, lr, epochs, steps_per_epoch) — docs/TRAINING.md curriculum
DEFAULT_STAGES = [
    (1.0, 2e-3, 10, 500),
    (0.5, 5e-4, 12, 500),
    (0.45, 1e-4, 12, 800),
    (0.4, 7e-5, 12, 800),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", required=True)
    ap.add_argument("--tag", required=True, help="dataset tag in run names")
    ap.add_argument("--data-type", default="joint", choices=["raw", "event", "joint"])
    ap.add_argument("--rnn-type", default="bilstm",
                    choices=["gru", "lstm", "bigru", "bilstm"])
    ap.add_argument("--enc-units", type=int, default=128)
    ap.add_argument("--dec-units", type=int, default=128)
    ap.add_argument("--encoder-depth", type=int, default=2)
    ap.add_argument("--decoder-depth", type=int, default=1)
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--seed", type=int, default=22)
    ap.add_argument("--stages", default=None,
                    help="JSON [[tf, lr, epochs, steps], ...] overriding the default curriculum")
    ap.add_argument("--sweep-epochs", type=int, default=10,
                    help="trailing epochs swept by val mapping identity")
    ap.add_argument("--beam", type=int, default=5)
    ap.add_argument("--workdir", default=None,
                    help="checkpoint/log root (default runs/<tag>.<type>...)")
    ap.add_argument("--cache-dir", default=None,
                    help="snippet cache dir (default <dataset>/.cache). Use "
                         "a dedicated dir when overriding the event-detector "
                         "config (RAVVENT_ED_W1/W2) — the cache is not keyed "
                         "by it")
    ap.add_argument("--export", default=None,
                    help="export the identity-best params here")
    ap.add_argument("--init-from", default=None,
                    help="params checkpoint to warm-start stage 1 from")
    ap.add_argument("--skip-stages", type=int, default=0,
                    help="skip the first N stages (resume with --init-from)")
    ap.add_argument("--restart-below", type=float, default=None,
                    help="bad-basin restart rule (VERDICT r4 item 3): if the "
                         "final stage-1 (teacher-forced) epoch's TRAIN acc is "
                         "below this, restart the whole curriculum with "
                         "seed+1. Deterministic and uniform — the committed "
                         "(3,2)-event curves give the discriminator (bad "
                         "basin 0.819 vs healthy 0.885 at stage-1 end; "
                         "runs/m3.event.d32*). 0.85 is the documented "
                         "threshold for the 2048-vocab matrix protocol.")
    ap.add_argument("--max-restarts", type=int, default=2,
                    help="max bad-basin restarts before accepting the run")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    from ravvent_tpu.config import DataConfig, ModelConfig, RunConfig, TrainConfig
    from ravvent_tpu.data.generator import SnippetBatchGenerator
    from ravvent_tpu.evaluation.basecall import BasecallEngine
    from ravvent_tpu.evaluation.mapping import MappingEvaluator
    from ravvent_tpu.training.checkpoints import CheckpointManager
    from ravvent_tpu.training.loop import Trainer

    stages = json.loads(args.stages) if args.stages else DEFAULT_STAGES
    ds = Path(args.dataset)
    mcfg = ModelConfig(
        enc_units=args.enc_units, dec_units=args.dec_units,
        encoder_depth=args.encoder_depth, decoder_depth=args.decoder_depth,
        rnn_type=args.rnn_type, data_type=args.data_type,
    )
    name = (f"{args.tag}.{args.data_type}.{args.rnn_type}"
            f".encd{args.encoder_depth}.decd{args.decoder_depth}")
    workdir = Path(args.workdir or f"runs/{name}")
    workdir.mkdir(parents=True, exist_ok=True)

    cache = args.cache_dir or str(ds / ".cache")
    fi_train = ds / "train" / "files_info.snippets.stride_6.json"
    fi_val = ds / "eval" / "files_info.val.snippets.stride_6.json"
    dcfg = DataConfig(batch_size=args.batch_size)
    gen = SnippetBatchGenerator.from_config(str(fi_train), dcfg, cache_dir=cache)
    val_gen = (SnippetBatchGenerator.from_config(str(fi_val), dcfg, cache_dir=cache)
               if fi_val.exists() else None)

    print(f"curriculum {name}: {len(stages)} stages on {jax.devices()}", flush=True)
    cm = CheckpointManager(str(workdir))
    params = opt_state = rng = None
    if args.init_from:
        from ravvent_tpu.models.basecaller import init_basecaller

        init = Path(args.init_from)
        template = {"params": init_basecaller(jax.random.PRNGKey(0), mcfg)}
        params = CheckpointManager(str(init.parent)).restore(
            init.name, template=template)["params"]
        print(f"warm-started from {init}", flush=True)

    warm_params = params  # --init-from snapshot for bad-basin restarts
    restart_log = []
    t_start = time.time()
    for attempt in range(max(0, args.max_restarts) + 1):
        seed = args.seed + attempt
        params = warm_params
        opt_state = rng = None
        epoch_ckpts = []  # (global_epoch, checkpoint_path)
        history_all = []
        epoch_base = 0
        restarted = False
        for si, (tf, lr, n_epochs, spe) in enumerate(stages):
            if si < args.skip_stages:
                epoch_base += n_epochs
                continue
            cfg = RunConfig(
                data=dcfg, model=mcfg,
                train=TrainConfig(
                    teacher_forcing=tf, learning_rate=lr, batch_size=args.batch_size,
                    epochs=epoch_base + n_epochs, steps_per_epoch=spe,
                    validation_steps=8, random_seed=seed,
                    dataset_tag=args.tag, checkpoint_dir=str(workdir),
                    info_dir=str(workdir),
                ),
            )
            trainer = Trainer(cfg)
            if params is not None:
                trainer.params = params
            if opt_state is not None:
                trainer.opt_state = opt_state  # carry Adam moments across stages
            if rng is not None:
                trainer.rng = rng
            print(f"--- stage {si + 1}/{len(stages)}: tf={tf} lr={lr} "
                  f"{n_epochs}x{spe} (seed {seed}) ---", flush=True)
            hist = trainer.fit(
                gen, val_gen,
                epochs=epoch_base + n_epochs, steps_per_epoch=spe,
                validation_steps=8, initial_epoch=epoch_base,
                csv_log_path=str(workdir / f"csvlog.{cfg.run_name}.log"),
                checkpoint_manager=cm,
            )
            history_all.append({"stage": si, "tf": tf, "lr": lr, **hist})
            for e in range(epoch_base + 1, epoch_base + n_epochs + 1):
                epoch_ckpts.append((e, cfg.checkpoint_path(e)))
            params, opt_state, rng = trainer.params, trainer.opt_state, trainer.rng
            epoch_base += n_epochs

            # bad-basin restart rule: checked once, at the end of the first
            # trained stage (the tf=1.0 pretrain) — slow progress there is
            # the committed discriminator for the basin, before any
            # scheduled-sampling stage can mask it
            if (si == args.skip_stages and args.restart_below is not None
                    and attempt < args.max_restarts):
                s1_acc = float(hist["acc"][-1]) if hist.get("acc") else 0.0
                fired = s1_acc < args.restart_below
                restart_log.append({
                    "attempt": attempt, "seed": seed,
                    "stage1_final_train_acc": round(s1_acc, 4),
                    "threshold": args.restart_below, "restarted": fired,
                })
                (workdir / "restart_log.json").write_text(
                    json.dumps(restart_log, indent=2))
                if fired:
                    print(f"RESTART: stage-1 train acc {s1_acc:.3f} < "
                          f"{args.restart_below} (bad basin); retrying with "
                          f"seed {seed + 1}", flush=True)
                    restarted = True
                    break
        if not restarted:
            break

    print(f"training done in {time.time() - t_start:.0f}s", flush=True)

    # ---- identity epoch sweep over the trailing checkpoints ----
    sweep = epoch_ckpts[-args.sweep_epochs:] if args.sweep_epochs else []
    best = None
    sweep_rows = []
    if sweep and fi_val.exists():
        from ravvent_tpu.models.basecaller import init_basecaller

        template = {"params": init_basecaller(jax.random.PRNGKey(0), mcfg)}
        for epoch, path in sweep:
            p = cm.restore(path, template=template)["params"]
            engine = BasecallEngine(p, mcfg, chunk_size=1024)
            ev = MappingEvaluator(engine, beam_width=args.beam, cache_dir=cache)
            res_path = workdir / f"val_sweep.epoch{epoch:02d}.json"
            ev.evaluate_files(str(fi_val), res_path, verbose=False)
            total, valid, invalid = ev.compute_total_results(res_path)
            sweep_rows.append({"epoch": epoch, "identity_total": total,
                               "identity_valid": valid, "invalid_pct": invalid})
            print(f"epoch {epoch}: val identity {total} ({invalid}% invalid)",
                  flush=True)
            if best is None or total > best[1]:
                best = (epoch, total, path, p)

    summary = {
        "name": name,
        "stages": stages,
        "seed": seed,
        "restarts": restart_log,
        "history": history_all,
        "epoch_sweep": sweep_rows,
        "best_epoch": best[0] if best else None,
        "best_val_identity": best[1] if best else None,
        "wall_s": round(time.time() - t_start, 1),
    }
    (workdir / "curriculum_summary.json").write_text(json.dumps(summary, indent=2))
    print(json.dumps({k: summary[k] for k in
                      ("name", "best_epoch", "best_val_identity", "wall_s")}))

    if args.export:
        out = Path(args.export)
        exp_params = best[3] if best else params
        exp_epoch = best[0] if best else epoch_base
        cm2 = CheckpointManager(str(out.parent))
        cm2.save(out.name, exp_params, epoch=exp_epoch)
        print(f"exported epoch {exp_epoch} -> {out}")


if __name__ == "__main__":
    main()

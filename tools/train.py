"""Training driver CLI — the reference's ``ravvent.py`` as a real tool.

Reference semantics (ravvent.py:11-88): run-name string from hyperparameters,
generator-fed fit loop with per-epoch checkpoints and CSV logs. Here all
hyperparameters are flags (the reference hard-codes them), training runs on
whatever accelerator JAX sees (data-parallel across all local devices), and
checkpoints carry full training state for exact resume.

Typical flagship run:
  python tools/train.py --dataset datasets/sim_lambda --data-type joint \
      --epochs 10 --steps-per-epoch 500 --lr 5e-4
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="datasets/sim_lambda")
    ap.add_argument("--files-info", default=None,
                    help="explicit training files_info JSON (default: <dataset>/train/...)")
    ap.add_argument("--dataset-tag", default="lambda",
                    help="dataset tag in the run-name schema (reference: ravvent.py:31)")
    ap.add_argument("--data-type", default="joint", choices=["raw", "event", "joint"])
    ap.add_argument("--rnn-type", default="bilstm")
    ap.add_argument("--attention", default="luong", choices=["luong", "bahdanau"])
    ap.add_argument("--enc-units", type=int, default=128)
    ap.add_argument("--dec-units", type=int, default=128)
    ap.add_argument("--encoder-depth", type=int, default=2)
    ap.add_argument("--decoder-depth", type=int, default=1)
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--steps-per-epoch", type=int, default=500)
    ap.add_argument("--validation-steps", type=int, default=30)
    ap.add_argument("--lr", type=float, default=5e-4)
    ap.add_argument("--teacher-forcing", type=float, default=0.5)
    ap.add_argument("--seed", type=int, default=22)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--resume-epoch", type=int, default=0)
    ap.add_argument("--resume-path", default=None,
                    help="explicit checkpoint dir to resume from (overrides the run-name schema)")
    ap.add_argument("--init-from", default=None,
                    help="params-only checkpoint to warm-start from (fresh optimizer; "
                         "e.g. seed a joint model from a trained raw model)")
    ap.add_argument("--checkpoint-dir", default="models")
    ap.add_argument("--info-dir", default="info")
    ap.add_argument("--export-flagship", default=None,
                    help="also save final params to this dir (e.g. checkpoints/flagship)")
    args = ap.parse_args()

    from ravvent_tpu.config import DataConfig, ModelConfig, RunConfig, TrainConfig
    from ravvent_tpu.data.generator import SnippetBatchGenerator
    from ravvent_tpu.training.checkpoints import CheckpointManager
    from ravvent_tpu.training.loop import Trainer

    cfg = RunConfig(
        data=DataConfig(batch_size=args.batch_size),
        model=ModelConfig(
            enc_units=args.enc_units, dec_units=args.dec_units,
            encoder_depth=args.encoder_depth, decoder_depth=args.decoder_depth,
            rnn_type=args.rnn_type, attention_type=args.attention,
            data_type=args.data_type,
        ),
        train=TrainConfig(
            teacher_forcing=args.teacher_forcing, learning_rate=args.lr,
            batch_size=args.batch_size, epochs=args.epochs,
            steps_per_epoch=args.steps_per_epoch,
            validation_steps=args.validation_steps, random_seed=args.seed,
            dataset_tag=args.dataset_tag,
            checkpoint_dir=args.checkpoint_dir, info_dir=args.info_dir,
        ),
    )
    print("RUNNING", cfg.run_name, flush=True)
    print("devices:", jax.devices(), flush=True)

    ds = Path(args.dataset)
    fi_train = (
        Path(args.files_info) if args.files_info
        else ds / "train" / "files_info.snippets.stride_6.json"
    )
    fi_val = ds / "eval" / "files_info.val.snippets.stride_6.json"
    if not fi_train.exists():
        print("dataset missing — building it first (tools/make_dataset.py)")
        from tools.make_dataset import build

        build(ds)

    cache = str(ds / ".cache")
    gen = SnippetBatchGenerator.from_config(str(fi_train), cfg.data, cache_dir=cache)
    val = (
        SnippetBatchGenerator.from_config(str(fi_val), cfg.data, cache_dir=cache)
        if fi_val.exists()
        else None
    )

    trainer = Trainer(cfg)
    cm = CheckpointManager(".")
    if args.init_from:
        # Params-only warm start (e.g. seed a joint model from a trained
        # raw model: the params tree carries both encoders regardless of
        # data_type, so trees are interchangeable across modalities).
        init = Path(args.init_from)
        cm0 = CheckpointManager(str(init.parent))
        trainer.params = cm0.restore(
            init.name, template={"params": trainer.params}
        )["params"]
        print(f"warm-started params from {init}")
    if args.resume_epoch > 0 or args.resume_path:
        state = cm.restore(
            args.resume_path or cfg.checkpoint_path(args.resume_epoch),
            template={
                "params": trainer.params, "opt_state": trainer.opt_state,
                "epoch": __import__("numpy").asarray(0),
                "rng": trainer.rng,
                "data_seed": __import__("numpy").asarray(0),
            },
        )
        trainer.params = state["params"]
        trainer.opt_state = state["opt_state"]
        trainer.rng = state["rng"]
        print(f"resumed from epoch {int(state['epoch'])}")

    t0 = time.time()
    trainer.fit(
        gen, val,
        epochs=args.epochs,
        steps_per_epoch=args.steps_per_epoch,
        validation_steps=args.validation_steps,
        initial_epoch=args.resume_epoch,
        csv_log_path=f"{args.info_dir}/csvlog.{cfg.run_name}.log",
        checkpoint_manager=cm,
    )
    print(f"training done in {time.time() - t0:.0f}s")

    if args.export_flagship:
        out = Path(args.export_flagship)
        cm2 = CheckpointManager(str(out.parent))
        cm2.save(out.name, trainer.params, epoch=args.epochs)
        print(f"flagship params exported to {out}")


if __name__ == "__main__":
    main()

"""Per-snippet token test accuracy — the reference's reduced-curve metric.

The reference's headline accuracy-vs-#6-mers curve (make_plots.py:54-78)
reports model TEST ACCURACY, not merged-read mapping identity: its reduced
experiments score a test split of the simulation set with the masked
exact-match accuracy of utils.py:15-24 (the curve's models predate the
mapping evaluator; see make_plots.py:160 ``...test.dataset``). This tool
computes that metric for one checkpoint over a files_info index:

- ``strict``   — omit start/end AND pad (the reference's train-step metric,
                 basecaller.py:247)
- ``val_style``— omit start/end only (the reference's val-step quirk,
                 basecaller.py:277 — pads counted)

Results are folded into ``<out_dir>/token_acc.<tag>.json`` keyed like the
accuracy_results_all schema: {"(encd, decd)": {data_type: {...}}}.

  python tools/eval_token_acc.py --checkpoint checkpoints/sweep/ref45_joint \
      --files-info datasets/ref45/eval/files_info.test.snippets.stride_6.json \
      --data-type joint --tag ref45 --out-dir results/ref_sweep
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
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--files-info", required=True)
    ap.add_argument("--data-type", default="joint", choices=["raw", "event", "joint"])
    ap.add_argument("--enc-units", type=int, default=128)
    ap.add_argument("--dec-units", type=int, default=128)
    ap.add_argument("--encoder-depth", type=int, default=2)
    ap.add_argument("--decoder-depth", type=int, default=1)
    ap.add_argument("--rnn-type", default="bilstm",
                    choices=["gru", "lstm", "bigru", "bilstm"])
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--max-batches", type=int, default=24)
    ap.add_argument("--out-dir", default="results/ref_sweep")
    ap.add_argument("--tag", required=True)
    ap.add_argument("--cache-dir", default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax.numpy as jnp
    import numpy as np

    from ravvent_tpu.config import DataConfig, ModelConfig
    from ravvent_tpu.data.generator import SnippetBatchGenerator
    from ravvent_tpu.models import attention as attn
    from ravvent_tpu.models.basecaller import (
        init_basecaller, encode_input, train_forward)
    from ravvent_tpu.decode.greedy import greedy_decode
    from ravvent_tpu.training.checkpoints import CheckpointManager
    from ravvent_tpu.utils.masking import masked_accuracy

    mcfg = ModelConfig(
        enc_units=args.enc_units, dec_units=args.dec_units,
        encoder_depth=args.encoder_depth, decoder_depth=args.decoder_depth,
        rnn_type=args.rnn_type, data_type=args.data_type,
    )
    ckpt = Path(args.checkpoint)
    params = CheckpointManager(str(ckpt.parent)).restore(
        ckpt.name, template={"params": init_basecaller(jax.random.PRNGKey(0), mcfg)}
    )["params"]

    gen = SnippetBatchGenerator.from_config(
        args.files_info, DataConfig(batch_size=args.batch_size),
        cache_dir=args.cache_dir,
    )

    @jax.jit
    def step(raw, event, targets):
        enc_out, mask = encode_input(params, raw, event, mcfg)
        mem = attn.setup_memory(params["decoder"]["attention"], enc_out, mask)
        T = targets.shape[1]
        tokens, _logits = greedy_decode(
            params["decoder"], mem, mcfg.vocab_size, T - 1, T - 1,
            mcfg.effective_attention, mcfg.cell_type,
        )
        y = targets[:, 1:]
        n_strict = jnp.sum((y != 0) & (y != 1) & (y != 2))
        n_val = jnp.sum((y != 1) & (y != 2))
        # teacher-forced per-step accuracy: conditioned on the gold prefix,
        # so a single greedy insertion/deletion doesn't shift-penalize every
        # later position (the free-running metrics above do) — the cleanest
        # signal->base mapping readout (reference train-step metric,
        # basecaller.py:247)
        tf_out = train_forward(params, raw, event, targets, mcfg)
        return (masked_accuracy(y, tokens, omit_vals=(0, 1, 2)) * n_strict,
                n_strict,
                masked_accuracy(y, tokens, omit_vals=(1, 2)) * n_val,
                n_val,
                tf_out.acc * n_strict)

    s_num = s_den = v_num = v_den = t_num = 0.0
    n_batches = 0
    for i, (raw, event, nuc) in enumerate(gen.epoch()):
        if i >= args.max_batches:
            break
        a, b, c, d, e = step(jnp.asarray(raw), jnp.asarray(event),
                             jnp.asarray(nuc))
        s_num += float(a); s_den += float(b)
        v_num += float(c); v_den += float(d)
        t_num += float(e)
        n_batches += 1
    strict = s_num / max(s_den, 1.0)
    val_style = v_num / max(v_den, 1.0)
    tf_acc = t_num / max(s_den, 1.0)
    print(f"[{args.tag} {args.data_type}] token acc strict={strict:.4f} "
          f"val_style={val_style:.4f} tf={tf_acc:.4f} over {n_batches} batches")

    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    out = out_dir / f"token_acc.{args.tag}.json"
    data = json.loads(out.read_text()) if out.exists() else {}
    depth_key = f"({args.encoder_depth}, {args.decoder_depth})"
    data.setdefault(depth_key, {})[args.data_type] = {
        "strict": round(strict, 5), "val_style": round(val_style, 5),
        "teacher_forced": round(tf_acc, 5), "batches": n_batches,
    }
    out.write_text(json.dumps(data, indent=2))
    print(f"-> {out}")


if __name__ == "__main__":
    main()

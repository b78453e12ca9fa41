"""Build the full accuracy-results table in the reference's schema.

The reference's committed regression oracle is four JSON files
(``accuracy_results_all.{lambda,ecoli}.beam{1,5}.json``) with layout
``{"(encd, decd)": {data_type: [identity_total, identity_valid, invalid%]}}``
(reference: analyse_accuracies.py:144-180; produced by per-config mapping
evaluation, ravvent_mapping_evaluator.py:130-174). This tool reproduces that
artifact for our trained checkpoints: for every (depth config x data type)
checkpoint present in the registry, it runs read-level beam evaluation over
the lambda test split and the shared-vocab cross-genome ("ecoli") test set,
at beam widths 1 and 5, and writes the four JSONs plus a markdown summary.

  python tools/make_results_table.py --results-dir results \
      [--configs joint:2:1,raw:2:1,...] [--beams 1,5]

Checkpoint registry: ``checkpoints/best.<data_type><encd><decd>`` params
checkpoints (exported by tools/sweep_epochs.py --export-best), with
``checkpoints/flagship`` (joint 2,1) and ``checkpoints/flagship32``
(joint 3,2) as fallbacks for their cells.
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
jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))

DATASETS = {
    "sim_lambda": "datasets/sim_lambda/eval/files_info.test.snippets.stride_6.json",
    "sim_ecoli": "datasets/sim_ecoli/test/files_info.snippets.stride_6.json",
}


def checkpoint_for(data_type: str, encd: int, decd: int) -> Path | None:
    cands = [REPO / "checkpoints" / f"best.{data_type}{encd}{decd}"]
    if (data_type, encd, decd) == ("joint", 2, 1):
        cands.append(REPO / "checkpoints" / "flagship")
    if (data_type, encd, decd) == ("joint", 3, 2):
        cands.append(REPO / "checkpoints" / "flagship32")
    for c in cands:
        if c.exists():
            return c
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--results-dir", default="results")
    ap.add_argument("--configs",
                    default="joint:2:1,raw:2:1,event:2:1,joint:3:2,raw:3:2,event:3:2")
    ap.add_argument("--beams", default="1,5")
    ap.add_argument("--datasets", default="sim_lambda,sim_ecoli")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    from ravvent_tpu.config import ModelConfig
    from ravvent_tpu.evaluation.basecall import BasecallEngine
    from ravvent_tpu.evaluation.mapping import MappingEvaluator
    from ravvent_tpu.models.basecaller import init_basecaller
    from ravvent_tpu.training.checkpoints import CheckpointManager

    out_dir = Path(args.results_dir)
    (out_dir / "per_read").mkdir(parents=True, exist_ok=True)
    beams = [int(b) for b in args.beams.split(",")]
    configs = []
    for c in args.configs.split(","):
        dt, encd, decd = c.split(":")
        configs.append((dt, int(encd), int(decd)))

    tables = {}  # (dataset, beam) -> {depth_key: {dt: [total, valid, invalid]}}
    for dt, encd, decd in configs:
        ckpt = checkpoint_for(dt, encd, decd)
        if ckpt is None:
            print(f"skip {dt} ({encd},{decd}): no checkpoint", file=sys.stderr)
            continue
        cfg = ModelConfig(enc_units=128, dec_units=128, encoder_depth=encd,
                          decoder_depth=decd, data_type=dt)
        params = init_basecaller(jax.random.PRNGKey(0), cfg)
        cm = CheckpointManager(str(ckpt.parent))
        params = cm.restore(ckpt.name, template={"params": params})["params"]
        for beam in beams:
            engine = BasecallEngine(params, cfg, chunk_size=1024)
            ev = MappingEvaluator(engine, beam_width=beam)
            for ds in args.datasets.split(","):
                res = out_dir / "per_read" / (
                    f"mapping.{ds}.{dt}.encd{encd}.decd{decd}.beam{beam}.json")
                res.unlink(missing_ok=True)
                ev.evaluate_files(DATASETS[ds], res, verbose=False)
                total, valid, invalid = ev.compute_total_results(res)
                key = f"({encd}, {decd})"
                tables.setdefault((ds, beam), {}).setdefault(key, {})[dt] = [
                    total, valid, invalid]
                print(f"{ds} beam{beam} {dt} ({encd},{decd}): "
                      f"{total} / {valid} / {invalid}%", flush=True)

    for (ds, beam), table in tables.items():
        tag = {"sim_lambda": "lambda", "sim_ecoli": "ecoli"}.get(ds, ds)
        p = out_dir / f"accuracy_results_all.{tag}.beam{beam}.json"
        merged = json.loads(p.read_text()) if p.exists() else {}
        for k, v in table.items():
            merged.setdefault(k, {}).update(v)
        p.write_text(json.dumps(merged, indent=2))
        print(f"wrote {p}")

    # markdown summary — rendered from the merged JSON artifacts so partial
    # (re)runs still produce the complete table
    lines = ["# Accuracy results (ref-length-weighted minimap2-convention identity)",
             "", "Identity (total) per config; reference schema "
             "`accuracy_results_all.*.json` files alongside.", ""]
    for p in sorted(out_dir.glob("accuracy_results_all.*.json")):
        _, tag, beam_tag, _ = p.name.split(".")
        merged = json.loads(p.read_text())
        lines.append(f"## {tag}, {beam_tag.replace('beam', 'beam ')}")
        lines.append("")
        lines.append("| depths | raw | event | joint |")
        lines.append("|---|---|---|---|")
        for key in sorted(merged):
            row = merged[key]
            cells = [str(row.get(dt, ["-"])[0]) for dt in ("raw", "event", "joint")]
            lines.append(f"| {key} | " + " | ".join(cells) + " |")
        lines.append("")
    (out_dir / "ACCURACY.md").write_text("\n".join(lines))
    print(f"wrote {out_dir / 'ACCURACY.md'}")


if __name__ == "__main__":
    main()

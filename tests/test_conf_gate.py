"""Confidence gate: derailed-snippet dropping before the merge fold.

The round-5 beam-1 decomposition (tools/diag_beam1_decode.py) showed the
residual beam5-beam1 deficit is catastrophic early-commit derailments:
greedy commits a wrong token in the first ~3 steps and free-runs an
unrelated sequence that beam-5 decodes near-perfectly. Those snippets are
reliably low-confidence (AUC ~0.95, tools/diag_conf_vs_id.py), so the
fold drops them label-free (assembly.merger.confidence_keep_mask) and
lets the ~80% window overlap cover the span."""

import numpy as np
import pytest

from ravvent_tpu.assembly.merger import (
    CONF_GATE_DEFAULT,
    Merger,
    confidence_keep_mask,
    drop_snippet_rows,
    expected_overlaps_from_ranges,
    snippet_confidences,
)


def _flat(rows):
    """Build (flat_probs, offsets) from per-snippet prob lists."""
    offsets = np.concatenate([[0], np.cumsum([len(r) for r in rows])]).astype(
        np.int64)
    flat = np.concatenate([np.asarray(r, float) for r in rows]) if rows else \
        np.zeros(0)
    return flat, offsets


def test_snippet_confidences_basic():
    flat, off = _flat([[1.0, 1.0], [0.5, 0.5], []])
    conf = snippet_confidences(flat, off)
    assert conf.shape == (3,)
    assert conf[0] == pytest.approx(0.0)
    assert conf[1] == pytest.approx(np.log(0.5))
    assert conf[2] == pytest.approx(0.0)  # empty row: neutral


def test_snippet_confidences_clips_zeros():
    flat, off = _flat([[0.0, 1.0]])
    conf = snippet_confidences(flat, off)
    assert np.isfinite(conf).all()


def test_keep_mask_drops_only_the_derailed_outlier():
    # 19 healthy snippets (p ~ 0.95) + 1 derailed (p ~ 0.5)
    rows = [[0.95] * 20 for _ in range(19)] + [[0.5] * 20]
    flat, off = _flat(rows)
    keep = confidence_keep_mask(flat, off, *CONF_GATE_DEFAULT)
    assert keep[:19].all()
    assert not keep[19]


def test_keep_mask_saturated_regime_untouched():
    # ref45-style: uniformly confident; tiny MAD must not cause drops
    # because nothing is below the absolute floor
    rng = np.random.default_rng(0)
    rows = [list(np.clip(rng.normal(0.97, 0.005, 20), 0.9, 1.0))
            for _ in range(30)]
    flat, off = _flat(rows)
    keep = confidence_keep_mask(flat, off, *CONF_GATE_DEFAULT)
    assert keep.all()


def test_keep_mask_low_quality_regime_untouched():
    # 4096-style: every snippet well below the absolute floor with ordinary
    # per-read fluctuation, but none a full rel_gap below the median — the
    # gate must not fire (dropping "everything mediocre" would shred the
    # read). This is why the relative criterion is a fixed nats margin and
    # not a MAD multiple: in a tight low distribution 3 MADs is a hair.
    rng = np.random.default_rng(1)
    rows = [list(np.clip(rng.normal(0.70, 0.03, 20), 0.5, 0.9))
            for _ in range(30)]
    flat, off = _flat(rows)
    keep = confidence_keep_mask(flat, off, *CONF_GATE_DEFAULT)
    assert keep.all()


def test_keep_mask_cap_keeps_worst_dropped_first():
    # 6 derailed among 14 healthy with cap 2/20: only the 2 worst drop
    rows = ([[0.95] * 20] * 14
            + [[p] * 20 for p in (0.50, 0.45, 0.40, 0.55, 0.52, 0.48)])
    flat, off = _flat(rows)
    keep = confidence_keep_mask(flat, off, rel_gap=0.12, abs_floor=-0.15,
                                max_drop_frac=0.10)
    dropped = np.where(~keep)[0]
    assert len(dropped) == 2
    assert set(dropped) == {16, 15}  # p=0.40 (idx 16) and p=0.45 (idx 15)


def test_keep_mask_max_consecutive_splits_runs():
    # a long run of derailed snippets is thinned so no more than
    # max_consecutive consecutive drops remain (coverage constraint: the
    # windows flanking a <=mc-run still overlap)
    rows = [[0.95] * 20] * 15 + [[0.5] * 20] * 10 + [[0.95] * 20] * 15
    flat, off = _flat(rows)
    keep = confidence_keep_mask(flat, off, 0.12, -0.15, 0.9,
                                max_consecutive=3)
    bad = ~keep
    assert bad.sum() == 8  # 10-run thinned to 3/3/2 with 2 separators
    run = 0
    for b in bad:
        run = run + 1 if b else 0
        assert run <= 3
    # healthy snippets are never touched
    assert keep[:15].all() and keep[25:].all()


def test_keep_mask_tiny_read_untouched():
    flat, off = _flat([[0.9] * 5, [0.2] * 5, [0.9] * 5])
    keep = confidence_keep_mask(flat, off, *CONF_GATE_DEFAULT)
    assert keep.all()  # <4 snippets: never gate


def test_drop_snippet_rows_layout():
    blob = b"AAACCCCGGT"
    rows = [[0.9] * 3, [0.5] * 4, [0.8] * 2, [0.7] * 1]
    flat, off = _flat(rows)
    keep = np.array([True, False, True, True])
    nb, no, nf = drop_snippet_rows(blob, off, flat, keep)
    assert nb == b"AAAGGT"
    assert list(no) == [0, 3, 5, 6]
    assert np.allclose(nf, [0.9] * 3 + [0.8] * 2 + [0.7])
    # keep-all returns the same objects (no copy)
    b2, o2, f2 = drop_snippet_rows(blob, off, flat, np.ones(4, bool))
    assert b2 is blob and o2 is off and f2 is flat


def test_gated_merge_removes_garbage_snippet():
    """A derailed middle snippet must not contaminate the merged read:
    the gated fold equals the fold over the healthy rows."""
    read = "ACGTTGCAAGGCTTACGGATCCAATGGCATCCGTTAGCAT" * 3
    win, stride = 30, 6
    seqs, rrs = [], []
    for s in range(0, len(read) - win + 1, stride):
        seqs.append(read[s:s + win])
        rrs.append((s * 9, (s + win) * 9))  # ~9 samples/base spans
    rr = np.asarray(rrs, float)
    garbage_i = len(seqs) // 2
    seqs[garbage_i] = "TTTTTTTTTTGGGGGGGGGGAAAAAAAAAA"
    rows = [[0.95] * len(x) for x in seqs]
    rows[garbage_i] = [0.45] * len(seqs[garbage_i])
    blob = "".join(seqs).encode()
    flat, off = _flat(rows)

    keep = confidence_keep_mask(flat, off, *CONF_GATE_DEFAULT)
    assert not keep[garbage_i] and keep.sum() == len(seqs) - 1

    merger = Merger()
    nb, no, nf = drop_snippet_rows(blob, off, flat, keep)
    eo = expected_overlaps_from_ranges(rr[keep], np.diff(no))
    gated = merger.merge_flat(nb, no, nf, expected_overlaps=eo)
    assert gated.seq == read

    # ungated, the garbage snippet degrades the merged read
    eo_all = expected_overlaps_from_ranges(rr, np.diff(off))
    ungated = merger.merge_flat(blob, off, flat, expected_overlaps=eo_all)
    assert ungated.seq != read


def test_performance_evaluator_gate_plumbing():
    """The timed workload gates identically to the identity path, and
    rr filters alongside the rows."""
    from ravvent_tpu.evaluation.performance import PerformanceEvaluator

    pe = PerformanceEvaluator.__new__(PerformanceEvaluator)
    pe.conf_gate = CONF_GATE_DEFAULT
    rows = [[0.95] * 10 for _ in range(9)] + [[0.4] * 10]
    blob = b"A" * 100
    flat, off = _flat(rows)
    rr = np.arange(20, dtype=float).reshape(10, 2)
    b2, o2, f2, r2 = pe._gate(blob, off, flat, rr)
    assert o2.size == 10 and r2.shape == (9, 2) and len(b2) == 90

    pe.conf_gate = None
    b3, o3, f3, r3 = pe._gate(blob, off, flat, rr)
    assert b3 is blob and o3 is off and f3 is flat and r3 is rr


def test_evaluate_cli_reference_fold_implies_no_gate():
    """--reference-fold promises bit-parity with the reference merge
    semantics, so the evaluate CLI must disable the gate with it (the
    implication lives in tools/evaluate.py's evaluator construction)."""
    import re
    from pathlib import Path

    src = (Path(__file__).resolve().parents[1] / "tools"
           / "evaluate.py").read_text()
    assert re.search(r"args\.no_conf_gate or args\.reference_fold", src)


def test_mapping_evaluator_gate_plumbing():
    """conf_gate=None leaves the layout untouched; the default gate drops
    the garbage row and filters rr alongside."""
    from ravvent_tpu.evaluation.mapping import MappingEvaluator

    ev_off = MappingEvaluator(engine=None, conf_gate=None)
    ev_on = MappingEvaluator(engine=None)
    assert ev_off.conf_gate is None
    assert ev_on.conf_gate == CONF_GATE_DEFAULT

    rows = [[0.95] * 10 for _ in range(9)] + [[0.4] * 10]
    blob = b"A" * 100
    flat, off = _flat(rows)
    rr = np.arange(20, dtype=float).reshape(10, 2)

    b2, o2, f2, r2 = ev_off._apply_conf_gate(blob, off, flat, rr)
    assert b2 is blob and o2 is off and f2 is flat and r2 is rr

    b3, o3, f3, r3 = ev_on._apply_conf_gate(blob, off, flat, rr)
    assert o3.size == 10 and r3.shape == (9, 2)
    assert len(b3) == 90 and f3.shape == (90,)

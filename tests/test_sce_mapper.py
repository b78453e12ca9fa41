"""Seed-chain-extend mapper (the minimap2 substitute) and the exact-affine
banded-global fallback.

The reference's metric of record is minimap2 map-ont PAF identity
(reference: ravvent_mapping_evaluator.py:85-108); these tests pin the
substitute's local-mapping semantics (soft clipping, split mapping, strand
handling) and native<->numpy parity.
"""

import numpy as np
import pytest

from ravvent_tpu.assembly import sce_mapper
from ravvent_tpu.assembly.alignment import (
    _banded_global_identity_np,
    banded_global_identity,
)
from ravvent_tpu.ops import native


def _mutate(seq, rng, sub=0.05, ins=0.03, dele=0.03):
    """Apply sequencing-like errors."""
    out = []
    bases = "ACGT"
    for ch in seq:
        r = rng.random()
        if r < dele:
            continue
        if r < dele + sub:
            out.append(bases[rng.integers(4)])
        else:
            out.append(ch)
        if rng.random() < ins:
            out.append(bases[rng.integers(4)])
    return "".join(out)


def _random_seq(n, rng):
    return "".join("ACGT"[i] for i in rng.integers(0, 4, n))


# ---------------------------------------------------------------- banded NW
@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_banded_global_np_native_parity():
    rng = np.random.default_rng(0)
    for trial in range(8):
        ref = _random_seq(400 + 100 * trial, rng)
        qry = _mutate(ref, rng, sub=0.08, ins=0.05, dele=0.05)
        got_np = _banded_global_identity_np(qry, ref, 1.0, -1.0, -2.0, -0.5, None)
        got_nat = native.banded_global_identity(qry, ref, 1.0, -1.0, -2.0, -0.5, 0)
        assert got_np[0] == got_nat[0], f"matches differ on trial {trial}"
        assert got_np[1] == got_nat[1], f"cols differ on trial {trial}"
        assert got_np[2] == pytest.approx(got_nat[2])


def test_banded_global_np_exact_affine():
    # one long gap must cost open + (L-1)*extend, not open per char:
    # query = ref with a 10-base deletion; identical elsewhere
    rng = np.random.default_rng(1)
    ref = _random_seq(300, rng)
    qry = ref[:150] + ref[160:]
    matches, cols, score = _banded_global_identity_np(
        qry, ref, 1.0, -1.0, -2.0, -0.5, None)
    assert matches == 290
    assert cols == 300  # 290 aligned + 10 gap columns
    # score = 290 matches - (2 + 9*0.5) for the single affine gap
    assert score == pytest.approx(290 - (2 + 9 * 0.5))


def test_banded_global_identity_perfect():
    seq = _random_seq(200, np.random.default_rng(2))
    matches, cols, _ = banded_global_identity(seq, seq)
    assert matches == 200 and cols == 200


# ---------------------------------------------------------------- minimizers
def test_minimizers_deterministic_and_cover():
    rng = np.random.default_rng(3)
    seq = _random_seq(2000, rng)
    m1 = sce_mapper.minimizers(seq)
    m2 = sce_mapper.minimizers(seq)
    assert m1 == m2
    # density ~ 2/(w+1) for random sequence
    assert 2000 / 10 < len(m1) < 2000 / 2
    poss = [p for _, p in m1]
    assert poss == sorted(poss)


# ------------------------------------------------------------------- mapper
def test_map_identity_near_perfect_read():
    rng = np.random.default_rng(4)
    ref = _random_seq(3000, rng)
    qry = _mutate(ref, rng, sub=0.03, ins=0.02, dele=0.02)
    res = sce_mapper.map_identity(qry, ref)
    assert res["read_length"] == len(qry)
    assert res["identity"] > 0.85
    assert res["strand"] == "+"


def test_map_identity_soft_clips_garbage_tail():
    # 2500 good bases + 800 garbage: map-ont clips the tail; identity stays
    # high and block_len ~ the good region (a global aligner would charge
    # the tail as gaps/mismatches and misgrade the read)
    rng = np.random.default_rng(5)
    ref = _random_seq(2500, rng)
    good = _mutate(ref, rng, sub=0.03, ins=0.02, dele=0.02)
    qry = good + _random_seq(800, rng)
    res = sce_mapper.map_identity(qry, ref)
    assert res["identity"] > 0.85
    assert res["total_block_len"] < len(good) * 1.1  # tail not charged
    # global alignment on the same read pays for the tail
    g_matches, g_cols, _ = banded_global_identity(qry, ref, band=1000)
    assert g_matches / g_cols < res["identity"] - 0.15


def test_map_identity_split_read():
    # good head + long query-only garbage insert + good tail: the diagonal
    # jump (|dq-dt| ~ 1400) exceeds the 500 chain bandwidth (map-ont -r), so
    # the read split-maps into 2 chains, both counted — the reference sums
    # matches/block_len over all PAF lines
    rng = np.random.default_rng(6)
    ref = _random_seq(6000, rng)
    head = _mutate(ref[:2500], rng, sub=0.03, ins=0.02, dele=0.02)
    tail = _mutate(ref[2600:], rng, sub=0.03, ins=0.02, dele=0.02)
    qry = head + _random_seq(1500, rng) + tail
    res = sce_mapper.map_identity(qry, ref)
    assert res["n_chains"] == 2
    assert res["identity"] > 0.85
    assert res["total_block_len"] > 4000


def test_map_identity_reverse_strand():
    rng = np.random.default_rng(7)
    ref = _random_seq(2000, rng)
    qry = sce_mapper.revcomp(_mutate(ref, rng, sub=0.03, ins=0.02, dele=0.02))
    res = sce_mapper.map_identity(qry, ref)
    assert res["strand"] == "-"
    assert res["identity"] > 0.85


def test_map_identity_unmapped_garbage():
    rng = np.random.default_rng(8)
    ref = _random_seq(2000, rng)
    qry = _random_seq(2000, np.random.default_rng(9))
    res = sce_mapper.map_identity(qry, ref)
    assert res["read_length"] == 0  # invalid-read outcome
    assert res["identity"] == 0.0


def test_map_identity_empty():
    assert sce_mapper.map_identity("", "ACGT" * 100)["read_length"] == 0


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_mapper_native_python_parity():
    rng = np.random.default_rng(10)
    for trial in range(4):
        ref = _random_seq(1500 + 500 * trial, rng)
        qry = _mutate(ref, rng, sub=0.05, ins=0.04, dele=0.04)
        if trial == 2:  # clipped tail case
            qry = qry + _random_seq(400, rng)
        py = sce_mapper.map_read_py(qry, ref)
        nat = sce_mapper.map_read_native(qry, ref)
        assert nat is not None
        assert [tuple(c) for c in py] == [tuple(c) for c in nat], \
            f"trial {trial}: {py} vs {nat}"


def test_mapper_on_reduced_vocab_genome():
    # reduced-vocabulary genomes (the reference's committed sets) are highly
    # repetitive — the occurrence cap must not wipe out all seeds
    from ravvent_tpu.data import simulator

    rng = np.random.default_rng(11)
    genome = simulator.generate_reduced_genome(43, 30000, rng)
    read = genome[5000:8000]
    qry = _mutate(read, rng, sub=0.05, ins=0.03, dele=0.03)
    res = sce_mapper.map_identity(qry, read)
    assert res["identity"] > 0.8


def test_crosscheck_fixtures_self_check():
    """The committed crosscheck fixtures (the external minimap2 validation
    harness, tools/crosscheck_mapper.py) must reproduce exactly — guards the
    mapper against silent behavior drift."""
    import importlib
    import sys as _sys
    from pathlib import Path

    _sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    cc = importlib.import_module("crosscheck_mapper")
    assert cc.self_check() == 0


def test_rescue_triggers_on_low_identity_phase_shifted_chain():
    """Round-5 de-cliff extension: a seed chain that covers the read but
    grades at/below the random-alignment band (<0.55) must re-grade
    through the exact-DP rescue stage. The motivating case: on periodic
    genomes the chain locks onto the wrong phase and grades a ~0.97 read
    at ~0.4 (observed on a ref45-cross event read). The trigger must NOT
    inflate genuinely-bad reads."""
    import numpy as np

    from ravvent_tpu.assembly import sce_mapper

    unit = "ACGTGA"  # 6-periodic reference
    ref = unit * 300
    q = ref[3:1500]  # phase-shifted, near-perfect slice
    out = sce_mapper.map_identity(q, ref)
    assert out["identity"] > 0.9, out
    assert out["stage"] == "rescue"

    rng = np.random.default_rng(0)
    bad = "".join(rng.choice(list("ACGT"), 800))
    ob = sce_mapper.map_identity(bad, ref)
    assert ob["read_length"] == 0 or ob["identity"] < 0.65, ob

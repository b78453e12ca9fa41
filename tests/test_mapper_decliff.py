"""De-cliffed sce mapper: graded identity below the seed-chain cliff.

Round 3's mapper returned NOTHING below ~65% read accuracy (k=15 seeds have
~a^15 survival probability), so struggling models scored 0.0 instead of a
graded number. The rescue stage (windowed exact Smith-Waterman,
assembly/sce_mapper.rescue_map) must:
  1. produce no 0-maps for reads at >= 50% true identity, and
  2. report identity within ~3 points of the exact full-read local-DP
     oracle (assembly/alignment.sw_local_identity) across 50-90% reads,
on random AND reduced-vocabulary (repetitive) genomes.

Reference metric semantics being preserved:
minimap2 -x map-ont -c identity = sum(matches)/sum(block_len)
(/root/reference/ravvent_mapping_evaluator.py:85-108). Rescue mappings are
marked stage="rescue" in the result record so aggregate reports can
distinguish seed-chain recall from DP-rescued recall.
"""

import numpy as np
import pytest

from ravvent_tpu.assembly.alignment import local_align, sw_local_identity
from ravvent_tpu.assembly.sce_mapper import map_identity


def mutate(seq: str, rate: float, rng) -> str:
    """Apply substitutions/insertions/deletions (60/20/20 mix) at ``rate``
    per base — true identity ~= 1 - rate."""
    bases = "ACGT"
    out = []
    for ch in seq:
        r = rng.random()
        if r >= rate:
            out.append(ch)
        else:
            kind = rng.random()
            if kind < 0.6:  # substitution
                out.append(bases[(bases.index(ch) + rng.integers(1, 4)) % 4])
            elif kind < 0.8:  # insertion
                out.append(ch)
                out.append(bases[rng.integers(0, 4)])
            # else: deletion (emit nothing)
    return "".join(out)


def _oracle_identity(pred: str, ref: str) -> float:
    out = sw_local_identity(pred, ref)
    if out is None:
        return 0.0
    matches, cols = out[0], out[1]
    return matches / max(cols, 1)


@pytest.mark.parametrize("genome_kind", ["random", "reduced2048"])
def test_no_zero_maps_above_50pct(genome_kind):
    rng = np.random.default_rng(3)
    if genome_kind == "random":
        ref = "".join(rng.choice(list("ACGT"), 3000))
    else:
        from ravvent_tpu.data import simulator

        ref = simulator.generate_reduced_genome(43, 3000, rng)
    for rate in (0.5, 0.45, 0.4, 0.35, 0.25, 0.1):
        pred = mutate(ref, rate, rng)
        res = map_identity(pred, ref)
        oracle = _oracle_identity(pred, ref)
        if oracle < 0.5:
            continue  # mutation overshot; only the >= 50% regime is gated
        assert res["read_length"] > 0, (
            f"unmapped at rate={rate} (oracle identity {oracle:.3f})")
        assert abs(res["identity"] - oracle) < 0.035, (
            f"rate={rate} stage={res.get('stage')}: mapper "
            f"{res['identity']:.3f} vs oracle {oracle:.3f}")


def test_rescue_stage_marked_and_chain_stage_preserved():
    rng = np.random.default_rng(11)
    ref = "".join(rng.choice(list("ACGT"), 2500))
    clean = mutate(ref, 0.05, rng)
    res = map_identity(clean, ref)
    assert res.get("stage") == "chain"
    assert res["identity"] > 0.9
    bad = mutate(ref, 0.42, rng)
    res_bad = map_identity(bad, ref)
    assert res_bad["read_length"] > 0
    assert res_bad.get("stage") == "rescue"


def test_rescue_rejects_garbage():
    """A random query unrelated to the reference must stay unmapped (the
    'invalid read' outcome survives de-cliffing)."""
    rng = np.random.default_rng(5)
    ref = "".join(rng.choice(list("ACGT"), 2000))
    garbage = "".join(rng.choice(list("ACGT"), 150))
    res = map_identity(garbage, ref)
    # a 150-base random query can only clear the gates by chance alignment;
    # identity of any surviving block must be far below real-read levels
    assert res["read_length"] == 0 or res["identity"] < 0.8


def test_rescue_reverse_strand():
    from ravvent_tpu.assembly.sce_mapper import revcomp

    rng = np.random.default_rng(9)
    ref = "".join(rng.choice(list("ACGT"), 2200))
    pred = revcomp(mutate(ref, 0.4, rng))
    res = map_identity(pred, ref)
    assert res["read_length"] > 0
    assert res.get("strand") == "-"


def test_sw_local_identity_native_matches_python_oracle():
    """Native exact-DP vs the pure-python aligner on rescue-scale input:
    identical (matches, block_len) — the independence anchor for using the
    native kernel as the test oracle."""
    from ravvent_tpu.ops import native

    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(17)
    ref = "".join(rng.choice(list("ACGT"), 400))
    pred = mutate(ref, 0.35, rng)
    a = sw_local_identity(pred, ref, use_native=True)
    b = sw_local_identity(pred, ref, use_native=False)
    assert a is not None and b is not None
    assert a[:2] == b[:2], (a, b)


def test_coverage_rescue_on_repetitive_reference():
    """Seed starvation on ultra-repetitive references (occurrence-capped
    minimizers all filtered — the 45-6-mer genomes): chains cover a
    fraction of a near-perfect read and the chain identity misgrades it.
    The coverage-triggered rescue must grade it with the exact DP."""
    rng = np.random.default_rng(21)
    ref = ("ACGTGA" * 500)[:2800]
    pred = mutate(ref, 0.03, rng)
    res = map_identity(pred, ref)
    assert res.get("stage") == "rescue", res
    oracle = _oracle_identity(pred, ref)
    assert res["identity"] > 0.9
    assert abs(res["identity"] - oracle) < 0.035, (res["identity"], oracle)

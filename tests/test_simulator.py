"""Signal-simulator realism model (DeepSimulator's role in the reference
pipeline, reference: data/generate_simulator_reduced.py:75-77)."""

import json

import numpy as np
import pytest

from ravvent_tpu.data import chiron, simulator


def _rng():
    return np.random.default_rng(3)


def test_clean_profile_matches_legacy():
    # the "clean" profile is the round-1 simulator: same signal bit-for-bit
    genome = simulator.random_genome(800, _rng())
    s1, r1 = simulator.simulate_read(genome, np.random.default_rng(5),
                                     simulator.PoreModel())
    s2, r2 = simulator.simulate_read(genome, np.random.default_rng(5),
                                     simulator.PoreModel(),
                                     profile=simulator.CLEAN)
    np.testing.assert_array_equal(s1, s2)
    np.testing.assert_array_equal(r1, r2)


def test_realistic_profile_valid_and_deterministic():
    genome = simulator.random_genome(1200, _rng())
    pore = simulator.PoreModel(kmer_noise_sigma=0.35)
    s1, r1 = simulator.simulate_read(genome, np.random.default_rng(9), pore,
                                     profile=simulator.REALISTIC)
    s2, r2 = simulator.simulate_read(genome, np.random.default_rng(9), pore,
                                     profile=simulator.REALISTIC)
    np.testing.assert_array_equal(s1, s2)
    np.testing.assert_array_equal(r1, r2)
    # labels: contiguous [start, end) spans covering the signal, all nonempty
    assert r1.shape == (len(genome), 2)
    assert (r1[:, 1] > r1[:, 0]).all()
    assert (r1[1:, 0] == r1[:-1, 1]).all()
    assert r1[-1, 1] == len(s1)


def test_realism_effects_present():
    genome = simulator.random_genome(4000, _rng())
    pore = simulator.PoreModel(kmer_noise_sigma=0.35)
    rng = np.random.default_rng(11)
    _, ranges = simulator.simulate_read(genome, rng, pore,
                                        profile=simulator.REALISTIC)
    dwells = ranges[:, 1] - ranges[:, 0]
    # skipped bases exist (dwell == 1) at roughly skip_prob
    skip_frac = (dwells == 1).mean()
    assert 0.005 < skip_frac < 0.1
    # stalls exist: dwells beyond the clean profile's dwell_max
    assert (dwells > simulator.REALISTIC.dwell_max).any()


def test_lowpass_smears_transitions():
    # an ideal step, filtered, no longer jumps in one sample
    x = np.concatenate((np.zeros(50), np.ones(50) * 100.0))
    y = simulator._lowpass(x, 0.35)
    assert y.shape == x.shape
    assert abs(y[49] - 0.0) < 1.0  # pre-step level preserved
    assert 20.0 < y[50] < 60.0  # transition is gradual
    assert abs(y[-1] - 100.0) < 1.0  # settles at the new level


def test_kmer_noise_scales_vary():
    pore = simulator.PoreModel(kmer_noise_sigma=0.35)
    scales = pore.base_noise_scales("ACGTACGTAACCGGTT")
    assert scales.std() > 0
    clean = simulator.PoreModel(kmer_noise_sigma=0.0)
    np.testing.assert_array_equal(
        clean.base_noise_scales("ACGTACGT"), np.ones(8))


def test_dataset_meta_records_profile(tmp_path):
    genome = simulator.random_genome(1500, _rng())
    simulator.generate_chiron_dataset(
        tmp_path, genome, n_reads=2, read_len_range=(300, 500), seed=4,
        profile=simulator.REALISTIC,
    )
    meta = json.loads((tmp_path / "dataset_meta.json").read_text())
    assert meta["profile"]["name"] == "harsh"
    # reads parse back through the chiron loader
    pairs = chiron.list_read_pairs(tmp_path)
    assert len(pairs) == 2
    sig = chiron.load_signal(pairs[0][0])
    rr, syms = chiron.load_label(pairs[0][1])
    assert rr[-1, 1] == len(sig)
    assert set("".join(syms)) <= set("ACGT")


def test_ref_reduced_genomes_load():
    # the reference's committed genomes anchor the accuracy protocol;
    # skip gracefully when the reference checkout is absent
    import tools.make_dataset as md

    from pathlib import Path
    if not Path(md.REF_REDUCED_DIR).exists():
        pytest.skip("reference data not present")
    tg, eg, name = md.load_ref_reduced_genomes(45)
    assert name == "seq.3.25000.45"
    assert len(tg) == 25000 and len(eg) == 25000
    assert set(tg) <= set("ACGT")
    # reduced genome: far fewer distinct 6-mers than a random one
    distinct = {tg[i:i + 6] for i in range(len(tg) - 5)}
    assert len(distinct) < 200

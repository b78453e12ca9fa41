"""Phase-aware beam selection (periodic-genome decode phase fix).

Round 3's residual on the 45-6-mer set: per-snippet free-running decode can
lock onto the wrong phase of a periodic sequence (token accuracy ~0.99, but
the merged read gains/loses whole periods at junctions — no alignment prior
can repair a junction whose two sides genuinely disagree). The fix chains
snippets through the beam that maximizes junction overlap agreement
(Viterbi; assembly.merger.select_beams_by_overlap), fetched via the
engine's n_beams option.
"""

import numpy as np
import pytest

from ravvent_tpu.assembly.merger import Merger


def test_selection_recovers_phase_on_periodic_sequence():
    """Construct a periodic read cut into overlapping snippets; corrupt the
    TOP beam of some snippets with a one-period phase shift (the observed
    failure mode) while keeping the true phase as beam 1. Selection must
    choose the phase-consistent chain."""
    period = "ACGTGA"
    genome = period * 40  # 240 bases
    L = 30  # snippet length (bases)
    step = 12
    snips = [genome[s:s + L] for s in range(0, len(genome) - L + 1, step)]
    N = len(snips)
    K = 3
    rng = np.random.default_rng(0)
    beam_seqs = []
    shifted = set()
    for i, s in enumerate(snips):
        # beam candidates: true phase + two period-shifted variants
        shift = s[len(period):] + period  # one period ahead (wrong phase)
        shift2 = period + s[:-len(period)]
        if i % 3 == 1:
            beam_seqs.append([shift, s, shift2])  # top beam is WRONG
            shifted.add(i)
        else:
            beam_seqs.append([s, shift, shift2])
    lp = np.zeros((N, K))
    lp[:, 0] = -1.0  # top beam has the best model score, as in practice
    lp[:, 1] = -1.2
    lp[:, 2] = -1.4
    m = Merger(scores_id=0)
    # expected overlap between consecutive snippets = L - step bases
    eo = np.full(N - 1, float(L - step))
    sel = m.select_beams_by_overlap(beam_seqs, lp, expected_overlaps=eo)
    chosen = [beam_seqs[i][sel[i]] for i in range(N)]
    # the chosen chain must be phase-consistent: every chosen sequence is
    # the true snippet (the only globally consistent chain here)
    n_true = sum(c == s for c, s in zip(chosen, snips))
    assert n_true == N, (n_true, N, sel.tolist())
    assert shifted, "test must actually corrupt some top beams"


def test_selection_keeps_top_beam_when_unambiguous():
    """On a non-periodic read where the top beam is already consistent,
    selection must keep beam 0 everywhere (model ranking respected)."""
    rng = np.random.default_rng(1)
    genome = "".join(rng.choice(list("ACGT"), 300))
    L, step = 30, 12
    snips = [genome[s:s + L] for s in range(0, len(genome) - L + 1, step)]
    N = len(snips)
    beam_seqs = []
    for s in snips:
        # beams 1/2 are mutated variants (worse junction agreement)
        bad1 = s[:10] + "TTTT" + s[14:]
        bad2 = s[::-1]
        beam_seqs.append([s, bad1, bad2])
    lp = np.tile(np.array([-1.0, -1.2, -1.4]), (N, 1))
    m = Merger(scores_id=0)
    sel = m.select_beams_by_overlap(
        beam_seqs, lp, expected_overlaps=np.full(N - 1, float(L - step)))
    assert (sel == 0).all(), sel.tolist()


def test_engine_multibeam_fetch_consistent_with_single():
    """n_beams=3 fetch: [N, 3, T] whose beam 0 equals the n_beams=1 result
    (same params, same inputs, compact packed wire)."""
    import jax

    from ravvent_tpu.config import ModelConfig
    from ravvent_tpu.data import simulator, chiron
    from ravvent_tpu.data.snippets import load_read_compact_ex
    from ravvent_tpu.evaluation.basecall import BasecallEngine
    from ravvent_tpu.models.basecaller import init_basecaller

    import pathlib
    import tempfile

    mcfg = ModelConfig(enc_units=12, dec_units=12, encoder_depth=1,
                      decoder_depth=1, rnn_type="bilstm", data_type="joint")
    params = init_basecaller(jax.random.PRNGKey(0), mcfg)
    with tempfile.TemporaryDirectory() as td:
        d = pathlib.Path(td)
        rng = np.random.default_rng(3)
        genome = simulator.random_genome(1200, rng)
        sig, ranges = simulator.simulate_read(genome, rng, simulator.PoreModel())
        chiron.write_read(d / "r.signal", d / "r.label", sig, ranges, genome)
        sigc, rr, ev, er, nuc, aux = load_read_compact_ex(
            d / "r.signal", d / "r.label", stride=6)
    max_len = int((nuc != 0).sum(axis=1).max())

    e1 = BasecallEngine(params, mcfg, chunk_size=128, pack_u8=True,
                        prob_bits=4, transport_dtype="i8dev")
    t1, p1 = e1.predict_beam_compact(sigc, rr, ev, er, max_len, 5, aux=aux)
    e3 = BasecallEngine(params, mcfg, chunk_size=128, pack_u8=True,
                        prob_bits=4, transport_dtype="i8dev", n_beams=3)
    t3, p3 = e3.predict_beam_compact(sigc, rr, ev, er, max_len, 5, aux=aux)
    assert t3.ndim == 3 and t3.shape[1] == 3
    np.testing.assert_array_equal(t3[:, 0], t1)
    np.testing.assert_array_equal(p3[:, 0], p1)
    # beams must be distinct decodes somewhere
    assert (t3[:, 0] != t3[:, 1]).any()


def test_mapping_evaluator_multibeam_path(tmp_path):
    """End-to-end: MappingEvaluator with an n_beams>1 engine runs the
    selection pass and still produces a merged read."""
    import jax

    from ravvent_tpu.config import ModelConfig
    from ravvent_tpu.data import simulator, chiron
    from ravvent_tpu.evaluation.basecall import BasecallEngine
    from ravvent_tpu.evaluation.mapping import MappingEvaluator
    from ravvent_tpu.models.basecaller import init_basecaller

    mcfg = ModelConfig(enc_units=12, dec_units=12, encoder_depth=1,
                      decoder_depth=1, rnn_type="bilstm", data_type="joint")
    params = init_basecaller(jax.random.PRNGKey(0), mcfg)
    d = tmp_path
    rng = np.random.default_rng(5)
    genome = simulator.random_genome(1500, rng)
    sig, ranges = simulator.simulate_read(genome, rng, simulator.PoreModel())
    chiron.write_read(d / "r.signal", d / "r.label", sig, ranges, genome)
    engine = BasecallEngine(params, mcfg, chunk_size=128, n_beams=2)
    ev = MappingEvaluator(engine, beam_width=5)
    out = ev.basecall_read(str(d / "r.signal"))
    assert isinstance(out.seq, str)

"""Mesh-sharded inference must match single-device outputs exactly."""

import jax
import jax.numpy as jnp
import numpy as np

from ravvent_tpu.config import ModelConfig
from ravvent_tpu.evaluation.basecall import BasecallEngine
from ravvent_tpu.models.basecaller import init_basecaller
from ravvent_tpu.parallel.inference import ShardedBasecallEngine
from ravvent_tpu.parallel.mesh import make_mesh


def test_sharded_engine_matches_single_device():
    cfg = ModelConfig(enc_units=16, dec_units=16, encoder_depth=1, data_type="joint")
    params = init_basecaller(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    raw = rng.normal(size=(48, 40, 1)).astype(np.float32)
    event = rng.normal(size=(48, 8, 5)).astype(np.float32)

    single = BasecallEngine(params, cfg, chunk_size=16, total_steps=12)
    t1, p1 = single.predict_beam(raw, event, 12, beam_width=3)

    mesh = make_mesh(8)
    sharded = ShardedBasecallEngine(params, cfg, mesh, chunk_size=16, total_steps=12)
    t2, p2 = sharded.predict_beam(raw, event, 12, beam_width=3)

    np.testing.assert_array_equal(t1, t2)
    np.testing.assert_allclose(p1, p2, rtol=1e-5, atol=1e-6)


def test_sharded_compact_matches_single_device(tmp_path):
    """The mesh-sharded compact path (replicated signal, sharded index
    ranges, per-chip gather+decode) must match the single-device compact
    path exactly (f32 wire both sides)."""
    from ravvent_tpu.data import chiron, simulator
    from ravvent_tpu.data.snippets import load_read_compact

    rng = np.random.default_rng(3)
    genome = simulator.random_genome(1500, rng)
    sig, ranges = simulator.simulate_read(genome, rng, simulator.PoreModel())
    sp, lp = tmp_path / "r.signal", tmp_path / "r.label"
    chiron.write_read(sp, lp, sig, ranges, genome)
    sigc, rr, ev, er, nuc = load_read_compact(sp, lp, stride=6)
    max_len = int((nuc != 0).sum(axis=1).max())

    cfg = ModelConfig(enc_units=16, dec_units=16, encoder_depth=1, data_type="joint")
    params = init_basecaller(jax.random.PRNGKey(0), cfg)

    single = BasecallEngine(params, cfg, chunk_size=64, transport_dtype="f32")
    t1, p1 = single.predict_beam_compact(sigc, rr, ev, er, max_len, 3)

    mesh = make_mesh(8)
    sharded = ShardedBasecallEngine(params, cfg, mesh, chunk_size=64,
                                    transport_dtype="f32")
    t2, p2 = sharded.predict_beam_compact(sigc, rr, ev, er, max_len, 3)

    T = min(t1.shape[1], t2.shape[1])
    np.testing.assert_array_equal(t1[:, :T], t2[:, :T])
    np.testing.assert_allclose(p1[:, :T], p2[:, :T], rtol=2e-2, atol=1e-3)


def test_sharded_fast_path_matches_single_device(tmp_path):
    """The FULL fast-path configuration under sharding — i8dev wire (signal
    i8 + event lengths u16, features + snippet ranges derived on device),
    packed u8 fetch, nibble probs, pre-projected values — must equal the
    same configuration on one device bit-for-bit (each chip runs the
    identical program on its row shard; no cross-row math anywhere)."""
    from ravvent_tpu.data import chiron, simulator
    from ravvent_tpu.data.snippets import load_read_compact_ex

    rng = np.random.default_rng(11)
    genome = simulator.random_genome(2500, rng)
    sig, ranges = simulator.simulate_read(genome, rng, simulator.PoreModel())
    sp, lp = tmp_path / "r.signal", tmp_path / "r.label"
    chiron.write_read(sp, lp, sig, ranges, genome)
    sigc, rr, ev, er, nuc, aux = load_read_compact_ex(sp, lp, stride=6)
    max_len = int((nuc != 0).sum(axis=1).max())

    cfg = ModelConfig(enc_units=16, dec_units=16, encoder_depth=1, data_type="joint")
    params = init_basecaller(jax.random.PRNGKey(0), cfg)
    fast = dict(chunk_size=512, transport_dtype="i8dev", pack_u8=True,
                prob_bits=4, project_values=True)

    single = BasecallEngine(params, cfg, **fast)
    t1, p1 = single.predict_beam_compact(sigc, rr, ev, er, max_len, 3, aux=aux)

    mesh = make_mesh(8)
    sharded = ShardedBasecallEngine(params, cfg, mesh, total_steps=47, **fast)
    t2, p2 = sharded.predict_beam_compact(sigc, rr, ev, er, max_len, 3, aux=aux)

    np.testing.assert_array_equal(t1, t2)
    np.testing.assert_array_equal(p1, p2)


def test_sharded_dispatch_collect_pipelining(tmp_path):
    """dispatch/collect must work under sharding (the pipelined evaluator
    path): dispatch two reads back-to-back, then collect both."""
    from ravvent_tpu.data import chiron, simulator
    from ravvent_tpu.data.snippets import load_read_compact_ex

    cfg = ModelConfig(enc_units=16, dec_units=16, encoder_depth=1, data_type="joint")
    params = init_basecaller(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(8)
    eng = ShardedBasecallEngine(params, cfg, mesh, chunk_size=512,
                                pack_u8=True, project_values=True)

    rng = np.random.default_rng(12)
    handles, wants = [], []
    for r in range(2):
        genome = simulator.random_genome(1200 + 300 * r, rng)
        sig, ranges = simulator.simulate_read(genome, rng, simulator.PoreModel())
        sp, lp = tmp_path / f"r{r}.signal", tmp_path / f"r{r}.label"
        chiron.write_read(sp, lp, sig, ranges, genome)
        sigc, rr, ev, er, nuc, aux = load_read_compact_ex(sp, lp, stride=6)
        max_len = int((nuc != 0).sum(axis=1).max())
        handles.append(eng.dispatch_beam_compact(sigc, rr, ev, er, max_len, 3, aux=aux))
        wants.append(rr.shape[0])
    for h, n in zip(handles, wants):
        toks, probs = eng.collect_beam_compact(h)
        assert toks.shape[0] == n == probs.shape[0]
        assert (toks >= 0).all() and (toks < 7).all()


def test_sharded_multibeam_matches_single_device(tmp_path):
    """n_beams>1 over the mesh: the beam-flattened wire shards over rows
    like any other fetch; sharded [N, K, T] must equal single-device."""
    from ravvent_tpu.data import chiron, simulator
    from ravvent_tpu.data.snippets import load_read_compact

    rng = np.random.default_rng(13)
    genome = simulator.random_genome(1200, rng)
    sig, ranges = simulator.simulate_read(genome, rng, simulator.PoreModel())
    sp, lp = tmp_path / "r.signal", tmp_path / "r.label"
    chiron.write_read(sp, lp, sig, ranges, genome)
    sigc, rr, ev, er, nuc = load_read_compact(sp, lp, stride=6)
    max_len = int((nuc != 0).sum(axis=1).max())

    cfg = ModelConfig(enc_units=16, dec_units=16, encoder_depth=1, data_type="joint")
    params = init_basecaller(jax.random.PRNGKey(0), cfg)

    single = BasecallEngine(params, cfg, chunk_size=64, transport_dtype="f32",
                            n_beams=2)
    t1, p1 = single.predict_beam_compact(sigc, rr, ev, er, max_len, 3)
    assert t1.ndim == 3 and t1.shape[1] == 2

    mesh = make_mesh(8)
    sharded = ShardedBasecallEngine(params, cfg, mesh, chunk_size=64,
                                    transport_dtype="f32", n_beams=2)
    t2, p2 = sharded.predict_beam_compact(sigc, rr, ev, er, max_len, 3)
    T = min(t1.shape[-1], t2.shape[-1])
    np.testing.assert_array_equal(t1[..., :T], t2[..., :T])
    np.testing.assert_allclose(p1[..., :T], p2[..., :T], rtol=2e-2, atol=1e-3)

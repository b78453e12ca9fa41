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
    sharded = ShardedBasecallEngine(params, cfg, mesh, chunk_size=64)
    t2, p2 = sharded.predict_beam_compact(sigc, rr, ev, er, max_len, 3)

    T = min(t1.shape[1], t2.shape[1])
    np.testing.assert_array_equal(t1[:, :T], t2[:, :T])
    np.testing.assert_allclose(p1[:, :T], p2[:, :T], rtol=2e-2, atol=1e-3)

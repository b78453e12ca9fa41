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

"""Fused Pallas decode-step kernel vs the unfused reference step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ravvent_tpu.config import ModelConfig
from ravvent_tpu.models import attention as attn
from ravvent_tpu.models import decoder as dec
from ravvent_tpu.models.basecaller import encode_input, init_basecaller
from ravvent_tpu.ops.decode_step_pallas import (
    fused_decode_step,
    pack_decoder_weights,
)


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig(
        enc_units=128, dec_units=128, encoder_depth=1, decoder_depth=1, data_type="raw"
    )
    params = init_basecaller(jax.random.PRNGKey(0), cfg)
    B = 8
    raw = jax.random.normal(jax.random.PRNGKey(1), (B, 40, 1))
    enc_out, mask = encode_input(params, raw, jnp.zeros((B, 6, 5)), cfg)
    # pad memory S to a multiple of 8 (f32 sublane), masked off
    S = enc_out.shape[1]
    S_p = ((S + 7) // 8) * 8
    enc_out = jnp.pad(enc_out, ((0, 0), (0, S_p - S), (0, 0)))
    mask = jnp.pad(mask, ((0, 0), (0, S_p - S)))
    mem = attn.setup_memory(params["decoder"]["attention"], enc_out, mask)
    return cfg, params, mem, B


def test_fused_step_matches_unfused(setup):
    cfg, params, mem, B = setup
    dp = params["decoder"]
    w = pack_decoder_weights(dp, cfg.vocab_size)

    state = dec.zero_state(dp, B, cfg.dec_units, "lstm")
    token = jnp.array([2] * B)
    emb = dec.embed(token, cfg.vocab_size)

    # a couple of chained steps to also exercise state handoff
    for step in range(3):
        state_ref, logits_ref, _ = dec.decoder_step(dp, state, emb, mem, "luong", "lstm")
        (h, c) = state.cells[0]
        h2, c2, att2, logits2 = fused_decode_step(
            w, cfg.vocab_size, emb, state.attention, h, c, mem.keys, mem.values,
            mem.mask.astype(jnp.float32), b_tile=8, interpret=True,
        )
        np.testing.assert_allclose(np.asarray(state_ref.cells[0][0]), np.asarray(h2),
                                   rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(state_ref.cells[0][1]), np.asarray(c2),
                                   rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(state_ref.attention), np.asarray(att2),
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(logits_ref), np.asarray(logits2),
                                   rtol=2e-4, atol=2e-4)
        # next step input from the reference path
        state = state_ref
        emb = dec.embed(jnp.argmax(logits_ref, axis=-1), cfg.vocab_size)

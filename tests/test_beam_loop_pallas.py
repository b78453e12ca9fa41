"""Whole-loop fused beam kernel vs the XLA beam path (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ravvent_tpu.config import ModelConfig
from ravvent_tpu.decode.beam import beam_decode
from ravvent_tpu.models import attention as attn
from ravvent_tpu.models.basecaller import encode_input, init_basecaller
from ravvent_tpu.ops.beam_loop_pallas import beam_loop_decode, beam_step_decode


@pytest.mark.parametrize("max_steps", [12, 7])
def test_beam_loop_matches_xla(max_steps):
    cfg = ModelConfig(
        enc_units=128, dec_units=128, encoder_depth=1, decoder_depth=1, data_type="raw"
    )
    params = init_basecaller(jax.random.PRNGKey(0), cfg)
    B = 8
    raw = jax.random.normal(jax.random.PRNGKey(1), (B, 40, 1))
    enc_out, mask = encode_input(params, raw, jnp.zeros((B, 6, 5)), cfg)
    S = enc_out.shape[1]
    S_p = ((S + 7) // 8) * 8
    enc_out = jnp.pad(enc_out, ((0, 0), (0, S_p - S), (0, 0)))
    mask = jnp.pad(mask, ((0, 0), (0, S_p - S)))
    mem = attn.setup_memory(
        params["decoder"]["attention"], enc_out, mask,
        attention_layer=params["decoder"]["attention_layer"],
    )

    ref = beam_decode(params["decoder"], mem, 7, 5, 12, max_steps)
    for decode_fn in (beam_loop_decode, beam_step_decode):
        fused = decode_fn(
            params["decoder"], mem, 7, 5, 12, max_steps, b_tile=8, interpret=True
        )
        np.testing.assert_array_equal(np.asarray(ref.tokens), np.asarray(fused.tokens))
        # scores beyond max_steps are dead outputs (the consumer slices
        # [:len(seq)] <= max_steps; both paths recompute-from-frozen-state
        # there with tiny numeric divergence) — compare the live range.
        np.testing.assert_allclose(
            np.asarray(ref.scores[:, :max_steps]),
            np.asarray(fused.scores[:, :max_steps]),
            rtol=2e-4, atol=2e-4,
        )


def test_beam_step_i8_memory_close_to_f32():
    """int8-quantized memory (per-position scales) in the per-step kernel:
    same beams on nearly every row, scores close — quantization noise is
    ~0.4% of the max |key|/|value| per position."""
    cfg = ModelConfig(
        enc_units=128, dec_units=128, encoder_depth=1, decoder_depth=1, data_type="raw"
    )
    params = init_basecaller(jax.random.PRNGKey(0), cfg)
    B = 8
    raw = jax.random.normal(jax.random.PRNGKey(1), (B, 40, 1))
    enc_out, mask = encode_input(params, raw, jnp.zeros((B, 6, 5)), cfg)
    S = enc_out.shape[1]
    S_p = ((S + 7) // 8) * 8
    enc_out = jnp.pad(enc_out, ((0, 0), (0, S_p - S), (0, 0)))
    mask = jnp.pad(mask, ((0, 0), (0, S_p - S)))
    mem_f32 = attn.setup_memory(
        params["decoder"]["attention"], enc_out, mask,
        attention_layer=params["decoder"]["attention_layer"],
    )
    mem_i8 = attn.setup_memory(
        params["decoder"]["attention"], enc_out, mask, "i8",
        attention_layer=params["decoder"]["attention_layer"],
    )
    assert mem_i8.quantized and mem_i8.keys.dtype == jnp.int8

    ref = beam_step_decode(
        params["decoder"], mem_f32, 7, 5, 12, 12, b_tile=8, interpret=True
    )
    q = beam_step_decode(
        params["decoder"], mem_i8, 7, 5, 12, 12, b_tile=8, interpret=True
    )
    # top-beam tokens agree on most rows (ties can flip under quantization)
    agree = (np.asarray(ref.tokens[:, :, 0]) == np.asarray(q.tokens[:, :, 0]))
    assert agree.all(axis=1).mean() >= 0.75
    assert np.abs(np.asarray(ref.scores[:, :, 0]) - np.asarray(q.scores[:, :, 0])).max() < 0.5

    # native-MXU int8 dots (fixed 127 query scale + per-row align scale):
    # same tolerance class as the dequant path
    qm = beam_step_decode(
        params["decoder"], mem_i8, 7, 5, 12, 12, b_tile=8, interpret=True,
        quant_mxu=True,
    )
    agree_m = (np.asarray(ref.tokens[:, :, 0]) == np.asarray(qm.tokens[:, :, 0]))
    assert agree_m.all(axis=1).mean() >= 0.75
    assert np.abs(
        np.asarray(ref.scores[:, :, 0]) - np.asarray(qm.scores[:, :, 0])
    ).max() < 0.5

"""Fused Pallas bidirectional-LSTM layer vs the XLA scan path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ravvent_tpu.models.rnn import init_encoder, run_bidi_layer, encoder_apply
import ravvent_tpu.models.rnn as rnn_mod
from ravvent_tpu.ops.rnn_pallas import run_bidi_lstm_pallas


@pytest.mark.parametrize("F,T", [(1, 24), (5, 16), (256, 9)])
def test_bilstm_layer_parity(F, T):
    B, U = 16, 128
    layers = init_encoder(jax.random.PRNGKey(0), U, 1, F)
    xs = jax.random.normal(jax.random.PRNGKey(1), (B, T, F))
    ref_out, (ref_h, ref_c) = run_bidi_layer(layers[0], "lstm", xs)
    out, (h, c) = run_bidi_lstm_pallas(layers[0], xs, interpret=True)
    np.testing.assert_allclose(np.asarray(ref_out), np.asarray(out), atol=2e-6)
    np.testing.assert_allclose(np.asarray(ref_h), np.asarray(h), atol=2e-6)
    np.testing.assert_allclose(np.asarray(ref_c), np.asarray(c), atol=2e-6)


def test_bilstm_layer_initial_state_parity():
    B, U, F, T = 8, 128, 3, 12
    layers = init_encoder(jax.random.PRNGKey(0), U, 1, F)
    xs = jax.random.normal(jax.random.PRNGKey(1), (B, T, F))
    h0 = jax.random.normal(jax.random.PRNGKey(2), (2, B, U)) * 0.1
    c0 = jax.random.normal(jax.random.PRNGKey(3), (2, B, U)) * 0.1
    ref_out, (rh, rc) = run_bidi_layer(layers[0], "lstm", xs, initial_state=(h0, c0))
    out, (h, c) = run_bidi_lstm_pallas(layers[0], xs, initial_state=(h0, c0), interpret=True)
    np.testing.assert_allclose(np.asarray(ref_out), np.asarray(out), atol=2e-6)
    np.testing.assert_allclose(np.asarray(rh), np.asarray(h), atol=2e-6)
    np.testing.assert_allclose(np.asarray(rc), np.asarray(c), atol=2e-6)


def test_bilstm_layer_bf16_stream():
    """bf16 stream (inputs/weights bf16, fp32 state+accum) tracks fp32."""
    B, U, F, T = 8, 128, 5, 16
    layers = init_encoder(jax.random.PRNGKey(0), U, 1, F)
    xs = jax.random.normal(jax.random.PRNGKey(1), (B, T, F))
    ref_out, _ = run_bidi_layer(layers[0], "lstm", xs)
    out, _ = run_bidi_lstm_pallas(layers[0], xs.astype(jnp.bfloat16), interpret=True)
    assert out.dtype == jnp.bfloat16
    err = np.abs(np.asarray(ref_out) - np.asarray(out, dtype=np.float32)).max()
    assert err < 0.05, err


def test_stacked_encoder_parity_through_routing(monkeypatch):
    """encoder_apply with the pallas path forced (interpret via monkeypatched
    runner) matches the scan path for a depth-2 stack."""
    B, T, F, U = 8, 10, 5, 128
    layers = init_encoder(jax.random.PRNGKey(0), U, 2, F)
    xs = jax.random.normal(jax.random.PRNGKey(1), (B, T, F))
    ref_out, _ = encoder_apply(layers, xs)

    import ravvent_tpu.ops.rnn_pallas as rp

    orig = rp.run_bidi_lstm_pallas
    monkeypatch.setattr(
        rp, "run_bidi_lstm_pallas",
        lambda layer, xs, initial_state=None: orig(
            layer, xs, initial_state=initial_state, interpret=True
        ),
    )
    monkeypatch.setattr(rnn_mod, "USE_PALLAS_ENCODER", True)
    out, _ = encoder_apply(layers, xs)
    np.testing.assert_allclose(np.asarray(ref_out), np.asarray(out), atol=5e-6)

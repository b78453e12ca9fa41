"""Model-core tests: cells, encoder, attention, decoder, losses."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ravvent_tpu.config import ModelConfig
from ravvent_tpu.models import attention as attn
from ravvent_tpu.models import decoder as dec
from ravvent_tpu.models.basecaller import (
    encode_input,
    init_basecaller,
    train_forward,
    val_metrics,
)
from ravvent_tpu.models.rnn import (
    encoder_apply,
    init_encoder,
    init_lstm_cell,
    init_gru_cell,
    lstm_step,
    gru_step,
    lstm_zero_state,
    gru_zero_state,
    run_rnn_layer,
)


def test_lstm_step_manual():
    """LSTM gates (i,f,g,o order, keras semantics) vs hand computation."""
    key = jax.random.PRNGKey(0)
    p = init_lstm_cell(key, 3, 2)
    x = jnp.array([[0.5, -1.0, 2.0]])
    h = jnp.array([[0.1, -0.2]])
    c = jnp.array([[0.3, 0.4]])
    (h2, c2), out = lstm_step(p, (h, c), x)

    z = np.array(x @ p["kernel"] + h @ p["recurrent"] + p["bias"])
    i, f, g, o = z[:, :2], z[:, 2:4], z[:, 4:6], z[:, 6:8]
    sig = lambda v: 1 / (1 + np.exp(-v))
    c_ref = sig(f) * np.array(c) + sig(i) * np.tanh(g)
    h_ref = sig(o) * np.tanh(c_ref)
    np.testing.assert_allclose(np.array(c2), c_ref, rtol=1e-6)
    np.testing.assert_allclose(np.array(h2), h_ref, rtol=1e-6)
    np.testing.assert_allclose(np.array(out), h_ref, rtol=1e-6)


def test_lstm_forget_bias_is_one():
    p = init_lstm_cell(jax.random.PRNGKey(0), 3, 4)
    np.testing.assert_array_equal(np.array(p["bias"][4:8]), np.ones(4))
    np.testing.assert_array_equal(np.array(p["bias"][:4]), np.zeros(4))


def test_gru_step_manual():
    """GRU with reset_after=True (keras default) vs hand computation."""
    key = jax.random.PRNGKey(1)
    p = init_gru_cell(key, 2, 3)
    x = jnp.array([[1.0, -0.5]])
    h = jnp.array([[0.2, -0.1, 0.05]])
    (h2,), _ = gru_step(p, (h,), x)

    mx = np.array(x @ p["kernel"] + p["input_bias"])
    mi = np.array(h @ p["recurrent"] + p["recurrent_bias"])
    sig = lambda v: 1 / (1 + np.exp(-v))
    z = sig(mx[:, :3] + mi[:, :3])
    r = sig(mx[:, 3:6] + mi[:, 3:6])
    hh = np.tanh(mx[:, 6:] + r * mi[:, 6:])
    h_ref = z * np.array(h) + (1 - z) * hh
    np.testing.assert_allclose(np.array(h2), h_ref, rtol=1e-6)


def test_rnn_layer_matches_stepwise():
    """Hoisted input projection scan == naive per-step loop."""
    key = jax.random.PRNGKey(2)
    p = init_lstm_cell(key, 4, 8)
    xs = jax.random.normal(jax.random.PRNGKey(3), (2, 5, 4))
    outs, final = run_rnn_layer(p, "lstm", xs)

    carry = lstm_zero_state(2, 8)
    ref = []
    for t in range(5):
        carry, h = lstm_step(p, carry, xs[:, t])
        ref.append(h)
    ref = jnp.stack(ref, axis=1)
    np.testing.assert_allclose(np.array(outs), np.array(ref), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.array(final[0]), np.array(carry[0]), rtol=1e-5, atol=1e-6)


def test_bidirectional_reverse_alignment():
    """Backward outputs must be time-aligned (position t holds the backward
    state after consuming x[t..T-1])."""
    key = jax.random.PRNGKey(4)
    layers = init_encoder(key, 8, 1, 3, "lstm", bidirectional=True)
    xs = jax.random.normal(jax.random.PRNGKey(5), (1, 6, 3))
    out, _ = encoder_apply(layers, xs, "lstm", True)
    assert out.shape == (1, 6, 16)

    # manual backward pass
    p = layers[0]["bwd"]
    carry = lstm_zero_state(1, 8)
    back = {}
    for t in range(5, -1, -1):
        carry, h = lstm_step(p, carry, xs[:, t])
        back[t] = h
    np.testing.assert_allclose(np.array(out[:, 2, 8:]), np.array(back[2]), rtol=1e-5, atol=1e-6)


def test_luong_attention_manual():
    key = jax.random.PRNGKey(6)
    p = attn.init_attention(key, "luong", 4, 6, 4)
    memory = jax.random.normal(jax.random.PRNGKey(7), (2, 5, 6))
    mask = jnp.array([[True, True, True, False, False], [True] * 5])
    mem = attn.setup_memory(p, memory, mask)
    query = jax.random.normal(jax.random.PRNGKey(8), (2, 4))
    context, align = attn.attend(p, "luong", query, mem)

    vals = np.where(np.array(mask)[..., None], np.array(memory), 0.0)
    keys = vals @ np.array(p["memory_kernel"])
    scores = np.einsum("bu,bsu->bs", np.array(query), keys)
    scores = np.where(np.array(mask), scores, -np.inf)
    e = np.exp(scores - scores.max(-1, keepdims=True))
    a_ref = e / e.sum(-1, keepdims=True)
    np.testing.assert_allclose(np.array(align), a_ref, rtol=1e-5, atol=1e-6)
    assert float(align[0, 3]) == 0.0 and float(align[0, 4]) == 0.0
    ctx_ref = np.einsum("bs,bse->be", a_ref, vals)
    np.testing.assert_allclose(np.array(context), ctx_ref, rtol=1e-5, atol=1e-6)


def test_bahdanau_attention_shapes():
    key = jax.random.PRNGKey(9)
    p = attn.init_attention(key, "bahdanau", 4, 6, 4)
    memory = jax.random.normal(jax.random.PRNGKey(10), (2, 5, 6))
    mem = attn.setup_memory(p, memory, jnp.ones((2, 5), bool))
    context, align = attn.attend(p, "bahdanau", jax.random.normal(key, (2, 4)), mem)
    assert context.shape == (2, 6) and align.shape == (2, 5)
    np.testing.assert_allclose(np.array(align.sum(-1)), np.ones(2), rtol=1e-5)


@pytest.mark.parametrize("data_type", ["raw", "event", "joint"])
def test_train_forward_shapes_and_grad(data_type):
    cfg = ModelConfig(
        enc_units=8, dec_units=8, encoder_depth=2, decoder_depth=1, data_type=data_type
    )
    params = init_basecaller(jax.random.PRNGKey(0), cfg)
    B, T = 3, 10
    raw = jax.random.normal(jax.random.PRNGKey(1), (B, 20, 1))
    event = jax.random.normal(jax.random.PRNGKey(2), (B, 6, 5))
    targets = jnp.array([[2, 3, 4, 5, 6, 3, 1, 0, 0, 0]] * B)

    out = train_forward(params, raw, event, targets, cfg)
    assert out.logits.shape == (B, T - 1, 7)
    assert np.isfinite(float(out.loss))

    def loss(p):
        return train_forward(p, raw, event, targets, cfg).loss

    g = jax.grad(loss)(params)
    flat, _ = jax.tree_util.tree_flatten(g)
    assert all(np.isfinite(np.array(x)).all() for x in flat)
    # some gradient mass everywhere except (possibly) unused encoder
    used_enc = "encoder_raw" if data_type != "event" else "encoder_event"
    gnorm = sum(float(jnp.sum(x**2)) for x in jax.tree_util.tree_leaves(g[used_enc]))
    assert gnorm > 0


def test_scheduled_sampling_records_minus_one():
    cfg = ModelConfig(enc_units=8, dec_units=8, encoder_depth=1, decoder_depth=1, data_type="raw")
    params = init_basecaller(jax.random.PRNGKey(0), cfg)
    raw = jax.random.normal(jax.random.PRNGKey(1), (4, 20, 1))
    enc_out, mask = encode_input(params, raw, jnp.zeros((4, 6, 5)), cfg)
    mem = attn.setup_memory(params["decoder"]["attention"], enc_out, mask)
    dec_in = jnp.array([[2, 3, 4, 5]] * 4)
    logits, sample_ids = dec.teacher_forced_decode(
        params["decoder"], dec_in, mem, 7, sampling_probability=0.5,
        rng=jax.random.PRNGKey(42),
    )
    assert logits.shape == (4, 4, 7)
    vals = np.unique(np.array(sample_ids))
    assert -1 in vals  # some positions teacher-forced
    assert (vals >= -1).all() and (vals < 7).all()


def test_joint_concat_along_time():
    cfg = ModelConfig(enc_units=4, dec_units=4, encoder_depth=1, data_type="joint")
    params = init_basecaller(jax.random.PRNGKey(0), cfg)
    raw = jax.random.normal(jax.random.PRNGKey(1), (2, 10, 1))
    event = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 5))
    out, mask = encode_input(params, raw, event, cfg)
    assert out.shape == (2, 14, 8)
    assert mask.shape == (2, 14)


def test_val_metrics_width_masking():
    # targets padded to width 8, batch-max width 5
    targets = jnp.array([[2, 3, 4, 1, 0, 0, 0, 0], [2, 5, 6, 3, 1, 0, 0, 0]])
    real = targets[:, 1:]
    pred = jnp.array([[3, 4, 1, 0, 0, 0, 0], [5, 6, 3, 1, 0, 0, 0]])
    logits = jax.nn.one_hot(pred, 7) * 10.0
    loss, acc = val_metrics(real, pred, logits, targets)
    # all predictions correct within the batch-max width; pads inside the
    # width count as matches (reference quirk)
    assert float(acc) == 1.0

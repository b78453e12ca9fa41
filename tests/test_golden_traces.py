"""Golden numeric traces for the tfa-semantics decode path.

TF/tfa is not importable in this environment, so round-1 parity was "by
construction" (the repo validated against its own reimplementation). These
tests pin the semantics against HAND-DERIVED constants instead: tiny weights
chosen so every intermediate is computable by hand, with the expected values
written as explicit scalar formulas transcribed from the keras/tfa equations
(keras LSTMCell: i,f,g,o gate order, sigmoid recurrent activations;
tfa AttentionWrapper step: cell -> Luong score -> masked softmax -> context
-> attention_layer Dense([cell_out; context]) -> next-step cell input;
tfa BeamSearchDecoder: log-softmax accumulation, finished-beam masking to a
prob-1 end token, flattened top-k with parent gathering, length freezing).

One divergence from these constants is one real tfa-semantics bug.
"""

import math

import numpy as np
import pytest


import jax.numpy as jnp

from ravvent_tpu.decode.beam import beam_decode, beam_scores_to_step_probs
from ravvent_tpu.models import attention as attn
from ravvent_tpu.models.decoder import decoder_step, embed, zero_state

LN2 = math.log(2.0)


def _attn_wrapper_params():
    """dec_units=1, vocab=4, memory S=2 x dim 1 — every matmul is scalar.

    LSTM kernel rows (in_dim = vocab 4 + attention 1 = 5):
      row 2 (one-hot of token 2) feeds only gate g with ln2;
      row 4 (the attention vector input) feeds only gate g.
    recurrent = 0, bias = 0 => i = f = o = sigmoid(0) = 0.5 always.
    """
    kernel = np.zeros((5, 4), np.float32)
    kernel[2, 2] = LN2  # token 2 -> g
    kernel[4, 2] = 1.0  # attention input -> g
    return {
        "cells": [{
            "kernel": jnp.asarray(kernel),
            "recurrent": jnp.zeros((1, 4), jnp.float32),
            "bias": jnp.zeros((4,), jnp.float32),
        }],
        "attention": {"memory_kernel": jnp.asarray([[2.0]], jnp.float32)},
        "attention_layer": {"kernel": jnp.asarray([[1.0], [1.0]], jnp.float32)},
        "fc": {"kernel": jnp.asarray([[1.0, -1.0, 2.0, 0.0]], jnp.float32),
               "bias": jnp.zeros((4,), jnp.float32)},
    }


def test_attention_wrapper_step_golden():
    """Two AttentionWrapper steps against hand-derived constants."""
    params = _attn_wrapper_params()
    memory = jnp.asarray([[[0.5], [1.0]]], jnp.float32)  # [B=1, S=2, 1]
    mask = jnp.ones((1, 2), bool)
    mem = attn.setup_memory(params["attention"], memory, mask)

    state = zero_state(params, 1, 1, "lstm")

    # ---- step 1: token 2, zero state ----
    state, logits, align = decoder_step(params, state, embed(jnp.array([2]), 4), mem)

    # LSTM: z = kernel[2] = [0, 0, ln2, 0]; i=f=o=0.5, g=tanh(ln2)=0.6 exactly
    # c1 = 0.5*0 + 0.5*0.6 = 0.3;  h1 = 0.5*tanh(0.3) = 0.14580683...
    h1 = 0.5 * math.tanh(0.3)
    assert h1 == pytest.approx(0.14565631, abs=1e-7)
    # Luong: keys = memory @ W_mem = [1.0, 2.0]; scores = h1 * keys
    # align = softmax([h1, 2*h1]) => a0 = 1/(1 + e^{h1})
    a0 = 1.0 / (1.0 + math.exp(h1))
    a1 = 1.0 - a0
    np.testing.assert_allclose(np.asarray(align)[0], [a0, a1], atol=1e-6)
    # context = a0*0.5 + a1*1.0; attention_vec = [h1; ctx] @ [[1],[1]]
    ctx1 = a0 * 0.5 + a1 * 1.0
    att1 = h1 + ctx1
    np.testing.assert_allclose(np.asarray(state.attention)[0], [att1], atol=1e-6)
    # logits = att1 * [1, -1, 2, 0]
    np.testing.assert_allclose(
        np.asarray(logits)[0], [att1, -att1, 2 * att1, 0.0], atol=1e-6)
    # the derived constants, literal:
    assert att1 == pytest.approx(0.91383122, abs=1e-6)

    # ---- step 2: token 0; the attention vector MUST feed the cell input ----
    state, logits, align = decoder_step(params, state, embed(jnp.array([0]), 4), mem)
    # z = kernel[0] + att1 * kernel[4] = [0, 0, att1, 0] (recurrent = 0)
    # c2 = 0.5*c1 + 0.5*tanh(att1) = 0.15 + 0.5*tanh(0.9139753)
    c2 = 0.15 + 0.5 * math.tanh(att1)
    h2 = 0.5 * math.tanh(c2)
    b0 = 1.0 / (1.0 + math.exp(h2))
    ctx2 = b0 * 0.5 + (1 - b0) * 1.0
    att2 = h2 + ctx2
    np.testing.assert_allclose(np.asarray(state.attention)[0], [att2], atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(logits)[0], [att2, -att2, 2 * att2, 0.0], atol=1e-6)
    assert att2 == pytest.approx(1.01485830, abs=1e-6)


def _const_logit_beam_params(logit_row):
    """Decoder whose logits are the SAME chosen vector at every step:
    all-zero LSTM => h = 0 (i=f=o=0.5, g=0 keeps c at 0); zero Luong scores
    => uniform alignments; values [[0.5],[1.5]] => context = 1.0;
    attention_layer [[0],[1]] => attention vector = 1.0 constant;
    fc kernel = the wanted logits."""
    V = len(logit_row)
    return {
        "cells": [{
            "kernel": jnp.zeros((V + 1, 4), jnp.float32),
            "recurrent": jnp.zeros((1, 4), jnp.float32),
            "bias": jnp.zeros((4,), jnp.float32),
        }],
        "attention": {"memory_kernel": jnp.asarray([[1.0]], jnp.float32)},
        "attention_layer": {"kernel": jnp.asarray([[0.0], [1.0]], jnp.float32)},
        "fc": {"kernel": jnp.asarray([logit_row], jnp.float32),
               "bias": jnp.zeros((V,), jnp.float32)},
    }


def test_beam_search_bookkeeping_golden():
    """Three beam-search steps (width 2, vocab 7, end token 1) against a
    hand trace. Constant per-step logits make every candidate score an
    explicit formula of the log-softmax constants.

    Hand trace (lp_v = logits_v - logsumexp(logits)):
      t1: start beam only; top-2 tokens: 2 (lp2), 1=END (lp1)
          -> cum [lp2, lp1], beam 1 finishes with length 1
      t2: finished beam may only emit END at cost 0 (tfa _mask_probs);
          candidates: {beam0: lp2+lp_v}, {beam1: lp1}
          lp1 = 2.5 - Z > 2*lp2 = 2*(3 - Z)   (Z = logsumexp ~ 3.6857)
          -> NEW top beam is the finished one: cum [lp1, 2*lp2],
             parents [1, 0], tokens [END, 2], lengths [1, 2]
      t3: cum [lp1, 3*lp2], parents [0, 1], lengths [1, 3]
    gather_tree: beam 0 = [1, 1, 1] (END-filled), beam 1 = [2, 2, 2].
    """
    logits = np.array([0.0, 2.5, 3.0, 1.5, 0.5, -1.0, -2.0], np.float64)
    Z = np.log(np.exp(logits).sum())
    lp1, lp2 = logits[1] - Z, logits[2] - Z
    assert lp1 > 2 * lp2  # the trace's pivotal inequality

    params = _const_logit_beam_params([0.0, 2.5, 3.0, 1.5, 0.5, -1.0, -2.0])
    memory = jnp.asarray([[[0.5], [1.5]]], jnp.float32)
    mask = jnp.ones((1, 2), bool)
    mem = attn.setup_memory(params["attention"], memory, mask)

    res = beam_decode(params, mem, vocab_size=7, beam_width=2,
                      total_steps=3, max_steps=3)
    tokens = np.asarray(res.tokens)[0]  # [T, W]
    scores = np.asarray(res.scores)[0]  # [T, W]

    np.testing.assert_array_equal(tokens[:, 0], [1, 1, 1])
    np.testing.assert_array_equal(tokens[:, 1], [2, 2, 2])
    expected_scores = np.array([
        [lp2, lp1],
        [lp1, 2 * lp2],
        [lp1, 3 * lp2],
    ])
    np.testing.assert_allclose(scores, expected_scores, atol=1e-5)
    # literal constants of the derivation:
    np.testing.assert_allclose(
        [lp1, lp2], [-1.18641783, -0.68641783], atol=1e-7)

    # reference score->prob conversion (utils.py:123-128): per-step prob of
    # the TOP SLOT trace = exp(score_t - score_{t-1}), first step from 0
    probs = np.asarray(beam_scores_to_step_probs(jnp.asarray(scores[None, :, 0])))[0]
    np.testing.assert_allclose(
        probs, [np.exp(lp2), np.exp(lp1 - lp2), 1.0], atol=1e-5)


def test_beam_max_steps_freezes_tail():
    """tfa maximum_iterations semantics: with max_steps=2 the third scan
    slot must replay the frozen step-2 state (scores unchanged)."""
    params = _const_logit_beam_params([0.0, 2.5, 3.0, 1.5, 0.5, -1.0, -2.0])
    memory = jnp.asarray([[[0.5], [1.5]]], jnp.float32)
    mem = attn.setup_memory(params["attention"], memory, jnp.ones((1, 2), bool))
    res = beam_decode(params, mem, vocab_size=7, beam_width=2,
                      total_steps=3, max_steps=2)
    logits = np.array([0.0, 2.5, 3.0, 1.5, 0.5, -1.0, -2.0], np.float64)
    Z = np.log(np.exp(logits).sum())
    lp1, lp2 = logits[1] - Z, logits[2] - Z
    scores = np.asarray(res.scores)[0]
    np.testing.assert_allclose(scores[1], [lp1, 2 * lp2], atol=1e-5)

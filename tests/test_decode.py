"""Decoding tests: greedy semantics, beam search bookkeeping, gather_tree."""

import jax
import jax.numpy as jnp
import numpy as np

from ravvent_tpu.config import ModelConfig
from ravvent_tpu.decode.beam import (
    beam_decode,
    beam_scores_to_step_probs,
    _gather_tree,
)
from ravvent_tpu.decode.greedy import greedy_decode
from ravvent_tpu.models import attention as attn
from ravvent_tpu.models.basecaller import encode_input, init_basecaller
from ravvent_tpu.tokenizer import NUC_TOKENIZER


def _setup(batch=3, seed=0):
    cfg = ModelConfig(enc_units=8, dec_units=8, encoder_depth=1, decoder_depth=1, data_type="raw")
    params = init_basecaller(jax.random.PRNGKey(seed), cfg)
    raw = jax.random.normal(jax.random.PRNGKey(seed + 1), (batch, 24, 1))
    enc_out, mask = encode_input(params, raw, jnp.zeros((batch, 6, 5)), cfg)
    mem = attn.setup_memory(params["decoder"]["attention"], enc_out, mask)
    return cfg, params, mem


def test_greedy_shapes_and_zero_after_limit():
    cfg, params, mem = _setup()
    tokens, logits = greedy_decode(params["decoder"], mem, 7, total_steps=12, max_steps=5)
    assert tokens.shape == (3, 12) and logits.shape == (3, 12, 7)
    np.testing.assert_array_equal(np.array(tokens[:, 5:]), 0)
    np.testing.assert_array_equal(np.array(logits[:, 5:]), 0.0)


def test_greedy_is_argmax_chain():
    """Each emitted token must be argmax of its step logits (pre-zeroing)."""
    cfg, params, mem = _setup(seed=3)
    tokens, logits = greedy_decode(params["decoder"], mem, 7, total_steps=8)
    t = np.array(tokens)
    l = np.array(logits)
    live = l.any(axis=-1)
    np.testing.assert_array_equal(t[live], l[live].argmax(-1))


def test_beam_width1_matches_greedy_until_end():
    """A width-1 beam search and greedy must emit identical sequences up to
    the end token (after which beam pads with end, greedy emits raw argmax)."""
    cfg, params, mem = _setup(seed=5)
    g_tokens, _ = greedy_decode(params["decoder"], mem, 7, total_steps=10)
    res = beam_decode(params["decoder"], mem, 7, beam_width=1, total_steps=10)
    b_tokens = np.array(res.tokens[:, :, 0])
    g = np.array(g_tokens)
    end = NUC_TOKENIZER.end_id
    for b in range(g.shape[0]):
        for t in range(10):
            assert b_tokens[b, t] == g[b, t]
            if g[b, t] == end:
                break


def test_beam_scores_monotone_and_probs():
    cfg, params, mem = _setup(seed=7)
    res = beam_decode(params["decoder"], mem, 7, beam_width=5, total_steps=10)
    s = np.array(res.scores[:, :, 0])
    # cumulative log probs are non-increasing until beams finish
    probs = np.array(beam_scores_to_step_probs(res.scores[:, :, 0]))
    # first-step "prob" = exp(score_0) (diff vs 0 pad), all in (0, 1]
    assert (probs > 0).all() and (probs <= 1.0 + 1e-5).all()
    # top beam slot must dominate slot 1 at every step
    assert (np.array(res.scores[:, :, 0]) + 1e-6 >= np.array(res.scores[:, :, 1])).all()


def test_beam_respects_max_steps():
    cfg, params, mem = _setup(seed=9)
    res_full = beam_decode(params["decoder"], mem, 7, beam_width=3, total_steps=10, max_steps=4)
    end = NUC_TOKENIZER.end_id
    # beyond the dynamic limit everything is end_token padding
    np.testing.assert_array_equal(np.array(res_full.tokens[:, 4:, :]), end)


def test_gather_tree_hand_example():
    """Hand-worked backtrack: T=3, B=1, W=2.

    step0: beams emit tokens [5, 3], parents [0, 0]
    step1: tokens [4, 6], parents [1, 0]  (beam0 comes from old beam1)
    step2: tokens [1, 2], parents [0, 1]  (end token=1 finishes beam0)
    lengths after step2: [3, 3]
    Backtrack beam0: t2 token 1 (parent 0) <- t1 beam0 token 4 (parent 1)
    <- t0 beam1 token 3  => [3, 4, 1]
    """
    tokens = jnp.array([[[5, 3]], [[4, 6]], [[1, 2]]])
    parents = jnp.array([[[0, 0]], [[1, 0]], [[0, 1]]])
    lengths = jnp.array([[[1, 1]], [[2, 2]], [[3, 3]]])
    out = _gather_tree(tokens, parents, lengths, jnp.int32(3), end_token=1)
    np.testing.assert_array_equal(np.array(out[:, 0, 0]), [3, 4, 1])
    # beam1: t2 token 2 (parent 1) <- t1 beam1 token 6 (parent 0) <- t0 beam0 token 5
    np.testing.assert_array_equal(np.array(out[:, 0, 1]), [5, 6, 2])


def test_gather_tree_end_token_fill():
    """Tokens after the first end token become end_token."""
    tokens = jnp.array([[[1, 5]], [[4, 1]], [[3, 2]]])
    parents = jnp.array([[[0, 1]], [[0, 1]], [[0, 1]]])
    lengths = jnp.array([[[1, 1]], [[1, 2]], [[1, 3]]])
    out = _gather_tree(tokens, parents, lengths, jnp.int32(3), end_token=1)
    # beam0 chain emits end at t0 -> everything after is end
    np.testing.assert_array_equal(np.array(out[:, 0, 0]), [1, 1, 1])

"""Beam-search decoding with tfa-compatible score bookkeeping.

Rebuild of the reference beam path (reference: basecaller.py:296-315):
``tfa.seq2seq.BeamSearchDecoder`` (length penalty 0, coverage penalty 0,
``maximum_iterations = max_output_len - 1``) as fixed-length jitted scans.
Instead of tfa's ``tile_batch`` (beams interleaved into the batch axis,
reference: basecaller.py:300-301), beams live on an explicit axis and are
folded into the batch only for the fused decoder-step matmuls.

Semantics preserved:
- initial cumulative log-probs ``[0, -inf, ...]`` so step 1 expands only
  beam 0;
- finished beams contribute a single end-token continuation with unchanged
  cumulative score (tfa ``_mask_probs``);
- top-k over ``beam*vocab`` by cumulative log-prob (score == cum log-prob at
  length penalty 0), beams kept score-sorted, ties resolved by index order;
- per-step recorded ``scores`` are the top-k cumulative log-probs — the
  quantity the reference converts to per-step probabilities via
  ``exp(score_t - score_{t-1})`` (reference: utils.py:123-128);
- finalization backtracks parent pointers (TF ``gather_tree``): tokens after
  the first end token — and beyond the per-batch max length — become
  ``end_token``, and beams come out sorted by final score (slot 0 best).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ravvent_tpu.models import attention as attn
from ravvent_tpu.models import decoder as dec
from ravvent_tpu.tokenizer import NUC_TOKENIZER

NEG_INF = float(jnp.finfo(jnp.float32).min)


class BeamResult(NamedTuple):
    tokens: jnp.ndarray  # [B, T, W] backtracked, end-token padded
    scores: jnp.ndarray  # [B, T, W] per-step cumulative log-probs (slot-major)


def take_along_beam(a: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """``take_along_axis(a, idx, axis=1)`` for a tiny (beam-width) axis.

    XLA lowers a ``[B, W]`` gather on TPU to a serialized scalar-load loop
    (~150us for [3072, 5] — measured via tools/parse_trace.py); the
    equivalent W-way one-hot select is a couple of VPU passes.
    """
    W = a.shape[1]
    sel = idx[..., None] == jnp.arange(W, dtype=idx.dtype)  # [B, W, W]
    if a.dtype == jnp.bool_:
        return jnp.any(sel & a[:, None, :], axis=-1)
    return jnp.where(sel, a[:, None, :], jnp.zeros((), a.dtype)).sum(
        axis=-1, dtype=a.dtype
    )


def _fold(x):  # [B, W, ...] -> [B*W, ...]
    return x.reshape((-1,) + x.shape[2:])


def _unfold(x, B, W):  # [B*W, ...] -> [B, W, ...]
    return x.reshape((B, W) + x.shape[1:])


def beam_decode(
    dec_params,
    mem: attn.AttnMemory,
    vocab_size: int,
    beam_width: int,
    total_steps: int,
    max_steps: jnp.ndarray | int | None = None,
    attention_type: str = "luong",
    cell_type: str = "lstm",
    start_token: int = NUC_TOKENIZER.start_id,
    end_token: int = NUC_TOKENIZER.end_id,
) -> BeamResult:
    """Batched beam search over memory [B, S, E].

    ``total_steps`` is the static scan length; ``max_steps`` (dynamic) is the
    effective tfa ``maximum_iterations`` — the backtrack starts from step
    ``max_steps - 1`` and later steps are ignored.
    """
    B = mem.values.shape[0]
    W = beam_width
    V = vocab_size
    if max_steps is None:
        max_steps = total_steps
    max_steps = jnp.asarray(max_steps, jnp.int32)

    dec_units = dec_params["fc"]["kernel"].shape[0]
    state0 = dec.zero_state(dec_params, B * W, dec_units, cell_type, jnp.float32)
    start_emb = dec.embed(jnp.full((B * W,), start_token), V)

    cum0 = jnp.tile(
        jnp.concatenate([jnp.zeros((1,)), jnp.full((W - 1,), NEG_INF)])[None, :], (B, 1)
    )  # [B, W]
    finished0 = jnp.zeros((B, W), bool)
    lengths0 = jnp.zeros((B, W), jnp.int32)

    def step_fn(state, cur_emb):
        """One decode step with beams on an explicit axis for attention —
        the memory is read once per step, not once per beam."""
        x = jnp.concatenate([cur_emb, state.attention], axis=-1)
        new_cells, query = dec.cells_apply(dec_params, state.cells, x, cell_type)
        context, _ = attn.attend_beams(
            dec_params["attention"], attention_type, _unfold(query, B, W), mem
        )
        if mem.projected:
            attention_vec = query @ mem.watt_h + _fold(context)
            logits = dec.dense(dec_params["fc"], attention_vec)
        else:
            attention_vec, logits = dec.output_block(dec_params, query, _fold(context))
        return dec.DecoderState(cells=new_cells, attention=attention_vec), logits

    def body(carry, t):
        state, cur_emb, cum, finished, lengths = carry
        state, logits = step_fn(state, cur_emb)
        step_lp = jax.nn.log_softmax(logits, axis=-1)  # [B*W, V]
        step_lp = _unfold(step_lp, B, W)

        # finished beams: only end_token continues, with log-prob 0
        finished_row = jnp.full((V,), NEG_INF).at[end_token].set(0.0)
        step_lp = jnp.where(finished[..., None], finished_row[None, None, :], step_lp)

        total = cum[..., None] + step_lp  # [B, W, V]
        flat = total.reshape(B, W * V)
        new_cum, idx = jax.lax.top_k(flat, W)  # [B, W] each, sorted desc
        parent = idx // V
        token = idx % V

        prev_finished = take_along_beam(finished, parent)
        new_finished = jnp.logical_or(prev_finished, token == end_token)
        prev_lengths = take_along_beam(lengths, parent)
        new_lengths = prev_lengths + (~prev_finished).astype(jnp.int32)

        # gather decoder state along beams
        flat_parent = (parent + jnp.arange(B)[:, None] * W).reshape(-1)
        new_state = jax.tree_util.tree_map(lambda a: a[flat_parent], state)

        next_emb = dec.embed(token.reshape(-1), V)

        # Freeze everything once past the dynamic step limit so the stored
        # prefix [0, max_steps) is exactly what a max_steps-bounded run
        # produces.
        live = t < max_steps
        carry_out = (
            jax.tree_util.tree_map(lambda n, o: jnp.where(live, n, o), new_state, state),
            jnp.where(live, next_emb, cur_emb),
            jnp.where(live, new_cum, cum),
            jnp.where(live, new_finished, finished),
            jnp.where(live, new_lengths, lengths),
        )
        return carry_out, (token, parent, new_cum, new_lengths)

    init = (state0, start_emb, cum0, finished0, lengths0)
    _, (tokens, parents, scores, lengths) = jax.lax.scan(
        body, init, jnp.arange(total_steps)
    )
    # tokens/parents/scores/lengths: [T, B, W]

    eff_T = jnp.minimum(max_steps, total_steps)  # dynamic effective length
    final_tokens = _gather_tree(tokens, parents, lengths, eff_T, end_token)
    return BeamResult(
        tokens=final_tokens.transpose(1, 0, 2), scores=scores.transpose(1, 0, 2)
    )


def _gather_tree(
    tokens: jnp.ndarray,  # [T, B, W]
    parents: jnp.ndarray,  # [T, B, W]
    lengths: jnp.ndarray,  # [T, B, W] prediction lengths after each step
    eff_T: jnp.ndarray,  # scalar: effective number of executed steps
    end_token: int,
) -> jnp.ndarray:
    """TF ``gather_tree`` equivalent with a dynamic step limit.

    Backtracks each beam from step ``max_len-1`` (max_len = per-batch max
    prediction length at the last executed step, capped at ``eff_T``), then
    replaces everything after the first end token with ``end_token``.
    """
    T, B, W = tokens.shape
    last = jnp.maximum(eff_T - 1, 0)
    # per-batch max sequence length (tfa: reduce_max over beams of lengths)
    max_len = jnp.minimum(jnp.max(lengths[last], axis=1), eff_T)  # [B]

    beam_idx0 = jnp.broadcast_to(jnp.arange(W)[None, :], (B, W))
    end_tok = jnp.asarray(end_token, tokens.dtype)

    # Emit per-step outputs as scan ys over time-reversed inputs instead of
    # carrying an [T, B, W] buffer updated with .at[t].set — the carried
    # dynamic-update-slice costs ~115us/step on TPU (parse_trace fusion.110).
    def back_body(beam, xs):
        tok_all, par_all, t = xs
        active = t < max_len[:, None]  # [B, W]
        start_here = t == (max_len[:, None] - 1)
        # (re)start the chain at the top step of each sequence
        beam = jnp.where(start_here, beam_idx0, beam)
        tok_t = take_along_beam(tok_all, beam)
        par_t = take_along_beam(par_all, beam)
        out_t = jnp.where(active, tok_t, end_tok)
        beam = jnp.where(active, par_t, beam)
        return beam, out_t

    _, out_rev = jax.lax.scan(
        back_body,
        beam_idx0,
        (tokens[::-1], parents[::-1], jnp.arange(T - 1, -1, -1)),
    )
    out = out_rev[::-1]

    # After the first end_token, everything becomes end_token.
    def fwd_body(found, tok):
        new_tok = jnp.where(found, end_tok, tok)
        found = jnp.logical_or(found, tok == end_token)
        return found, new_tok

    _, cleaned = jax.lax.scan(fwd_body, jnp.zeros((B, W), bool), out)
    return cleaned


def beam_scores_to_step_probs(beam_scores: jnp.ndarray) -> jnp.ndarray:
    """Per-step probability from cumulative beam scores:
    ``exp(score_t - score_{t-1})`` (reference: utils.py:123-128).
    beam_scores: [B, T] (top beam slot)."""
    prev = jnp.pad(beam_scores[:, :-1], ((0, 0), (1, 0)))
    return jnp.exp(beam_scores - prev)

"""Greedy autoregressive decoding.

Rebuild of the reference greedy path (reference: basecaller.py:317-330):
``tfa.seq2seq.BasicDecoder`` + ``GreedyEmbeddingSampler`` under
``dynamic_decode`` with ``impute_finished=False`` and
``maximum_iterations = max_output_len - 1``, as a fixed-length ``lax.scan``.

Faithful semantics:
- per step, the emitted token is argmax(logits) and the next input is its
  embedding — *even for already-finished sequences* (impute_finished=False:
  individually-finished sequences keep emitting raw argmax tokens until the
  whole batch finishes);
- decoding stops when all sequences have emitted the end token or after
  ``max_steps`` steps; in this fixed-shape version, steps after the
  all-finished point (or beyond the dynamic ``max_steps``) emit zeros,
  matching the reference's zero-padding of truncated outputs
  (basecaller.py:273-276).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ravvent_tpu.models import attention as attn
from ravvent_tpu.models import decoder as dec
from ravvent_tpu.tokenizer import NUC_TOKENIZER


def greedy_decode(
    dec_params,
    mem: attn.AttnMemory,
    vocab_size: int,
    total_steps: int,
    max_steps: jnp.ndarray | int | None = None,
    attention_type: str = "luong",
    cell_type: str = "lstm",
    start_token: int = NUC_TOKENIZER.start_id,
    end_token: int = NUC_TOKENIZER.end_id,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (tokens [B, total_steps], logits [B, total_steps, V]).

    ``total_steps`` is the static scan length; ``max_steps`` (dynamic) caps
    the effective decode length like tfa's ``maximum_iterations`` — positions
    at or beyond it are zeroed.
    """
    B = mem.values.shape[0]
    dec_units = dec_params["fc"]["kernel"].shape[0]
    state0 = dec.zero_state(dec_params, B, dec_units, cell_type, jnp.float32)
    start_emb = dec.embed(jnp.full((B,), start_token), vocab_size)
    if max_steps is None:
        max_steps = total_steps

    def body(carry, t):
        state, cur_emb, finished, all_done = carry
        state, logits, _ = dec.decoder_step(
            dec_params, state, cur_emb, mem, attention_type, cell_type
        )
        sample = jnp.argmax(logits, axis=-1)
        # A step "executes" while not all finished and t < max_steps.
        executes = jnp.logical_and(jnp.logical_not(all_done), t < max_steps)
        emit_tok = jnp.where(executes, sample, 0)
        emit_logits = jnp.where(executes, logits, 0.0)
        finished = jnp.logical_or(finished, sample == end_token)
        all_done = jnp.logical_or(jnp.all(finished), jnp.logical_not(executes))
        next_emb = dec.embed(sample, vocab_size)
        return (state, next_emb, finished, all_done), (emit_tok, emit_logits)

    init = (state0, start_emb, jnp.zeros((B,), bool), jnp.array(False))
    _, (tokens, logits) = jax.lax.scan(body, init, jnp.arange(total_steps))
    return tokens.swapaxes(0, 1), logits.swapaxes(0, 1)

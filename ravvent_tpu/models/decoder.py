"""Attention-wrapped stacked RNN decoder.

Rebuild of the reference decoder (reference: basecaller.py:63-152):
``tfa.seq2seq.AttentionWrapper(StackedRNNCells(...), attention,
attention_layer_size=dec_units)`` driven by a ``BasicDecoder``, re-expressed
as a pure per-step function + ``lax.scan`` loops.

tfa AttentionWrapper step semantics (preserved exactly):
1. cell input = concat([step input (one-hot token), previous attention]);
2. the stacked cells run (output of cell i feeds cell i+1);
3. the top cell output is the attention query;
4. attention vector = Dense_{no bias}(concat([cell output, context]))
   (``attention_layer_size=dec_units``);
5. the wrapper output is the attention vector; logits = Dense(vocab) of it
   (BasicDecoder ``output_layer``, reference: basecaller.py:94,117).

Embedding is one-hot (reference: basecaller.py:83). The initial decoder state
is all zeros — the encoder state is *not* passed (reference quirk,
basecaller.py:136-139).

Training-time sampling (reference: basecaller.py:96-107):
- ``TrainingSampler`` (teacher_forcing=True): pure teacher forcing, recorded
  sample_ids are argmax(logits).
- ``ScheduledEmbeddingTrainingSampler(p)``: per step, each batch element flips
  a Bernoulli(p) coin; selected elements feed the *categorical-sampled* token
  embedding to the next step instead of ground truth, and their recorded
  sample_id is the sampled token while unselected ones record -1.
"""

from __future__ import annotations

from typing import Any, Dict, List, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ravvent_tpu.models import attention as attn
from ravvent_tpu.models.rnn import CELLS, cell_step, cell_zero_state, init_dense, dense

Params = Dict[str, Any]


class DecoderState(NamedTuple):
    cells: Tuple  # tuple over depth of per-cell carries
    attention: jnp.ndarray  # [B, dec_units]


def init_decoder(
    key,
    vocab_size: int,
    depth: int,
    dec_units: int,
    memory_dim: int,
    attention_type: str = "luong",
    cell_type: str = "lstm",
) -> Params:
    init_cell = CELLS[cell_type][0]
    cells = []
    in_dim = vocab_size + dec_units  # one-hot token + attention vector
    for d in range(depth):
        key, kc = jax.random.split(key)
        cells.append(init_cell(kc, in_dim, dec_units))
        in_dim = dec_units
    key, ka, kl, kf = jax.random.split(key, 4)
    return {
        "cells": cells,
        "attention": attn.init_attention(ka, attention_type, dec_units, memory_dim, dec_units),
        # attention_layer: Dense(dec_units, use_bias=False) over [cell_out; context]
        "attention_layer": init_dense(kl, dec_units + memory_dim, dec_units, use_bias=False),
        "fc": init_dense(kf, dec_units, vocab_size, use_bias=True),
    }


def zero_state(
    params: Params, batch: int, dec_units: int, cell_type: str = "lstm", dtype=jnp.float32
) -> DecoderState:
    cells = tuple(
        cell_zero_state(cell_type, batch, dec_units, dtype) for _ in params["cells"]
    )
    return DecoderState(cells=cells, attention=jnp.zeros((batch, dec_units), dtype))


def embed(token_ids: jnp.ndarray, vocab_size: int) -> jnp.ndarray:
    return jax.nn.one_hot(token_ids, vocab_size, dtype=jnp.float32)


def cells_apply(
    params: Params, cells_state: Tuple, x: jnp.ndarray, cell_type: str = "lstm"
) -> Tuple[Tuple, jnp.ndarray]:
    """Run the stacked cells; returns (new_cells_state, top output)."""
    new_cells = []
    for cell_p, carry in zip(params["cells"], cells_state):
        carry, x = cell_step(cell_type, cell_p, carry, x)
        new_cells.append(carry)
    return tuple(new_cells), x


def output_block(
    params: Params, query: jnp.ndarray, context: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """AttentionWrapper tail: attention vector + output logits."""
    attention_vec = dense(
        params["attention_layer"], jnp.concatenate([query, context], axis=-1)
    )
    logits = dense(params["fc"], attention_vec)
    return attention_vec, logits


def decoder_step(
    params: Params,
    state: DecoderState,
    token_emb: jnp.ndarray,  # [B, vocab]
    mem: attn.AttnMemory,
    attention_type: str = "luong",
    cell_type: str = "lstm",
) -> Tuple[DecoderState, jnp.ndarray, jnp.ndarray]:
    """One fused decode step. Returns (new_state, logits [B, vocab],
    alignments [B, S])."""
    x = jnp.concatenate([token_emb, state.attention], axis=-1)
    new_cells, query = cells_apply(params, state.cells, x, cell_type)
    context, align = attn.attend(params["attention"], attention_type, query, mem)
    if mem.projected:
        # pre-projected memory (see AttnMemory.watt_h): context is already
        # in attention-vector space
        attention_vec = query @ mem.watt_h + context
        logits = dense(params["fc"], attention_vec)
    else:
        attention_vec, logits = output_block(params, query, context)
    return DecoderState(cells=new_cells, attention=attention_vec), logits, align


def teacher_forced_decode(
    params: Params,
    dec_inputs: jnp.ndarray,  # [B, T] token ids (target[:, :-1])
    mem: attn.AttnMemory,
    vocab_size: int,
    attention_type: str = "luong",
    cell_type: str = "lstm",
    sampling_probability: float = 0.0,
    rng: jax.Array | None = None,
):
    """Decode with (scheduled) teacher forcing.

    Returns (logits [B, T, V], sample_ids [B, T]). With
    ``sampling_probability == 0`` this is the TrainingSampler path
    (sample_ids = argmax); otherwise ScheduledEmbeddingTrainingSampler
    (sample_ids = sampled id where selected else -1).
    """
    B, T = dec_inputs.shape
    dec_units = params["fc"]["kernel"].shape[0]
    state0 = zero_state(params, B, dec_units, cell_type, mem.values.dtype)
    inputs_emb = embed(dec_inputs, vocab_size)  # [B, T, V]

    scheduled = sampling_probability > 0.0
    if scheduled and rng is None:
        raise ValueError("scheduled sampling requires an rng key")
    step_keys = (
        jax.random.split(rng, T) if scheduled else jnp.zeros((T, 2), dtype=jnp.uint32)
    )

    # Ground-truth next-step embeddings, shifted so scan slice t holds the
    # teacher input for step t+1 (last step's next input is unused).
    gt_next = jnp.concatenate([inputs_emb[:, 1:], inputs_emb[:, -1:]], axis=1)
    gt_next = gt_next.swapaxes(0, 1)  # [T, B, V]

    def body(carry, xs):
        state, cur_emb = carry
        gt_next_t, key = xs
        state, logits, _ = decoder_step(params, state, cur_emb, mem, attention_type, cell_type)
        if scheduled:
            ksel, ksamp = jax.random.split(key)
            select = jax.random.bernoulli(ksel, sampling_probability, (B,))
            sampled = jax.random.categorical(ksamp, logits, axis=-1)
            sample_ids = jnp.where(select, sampled, -1)
            next_emb = jnp.where(select[:, None], embed(sampled, vocab_size), gt_next_t)
        else:
            sample_ids = jnp.argmax(logits, axis=-1)
            next_emb = gt_next_t
        return (state, next_emb), (logits, sample_ids)

    (_, _), (logits, sample_ids) = jax.lax.scan(
        body, (state0, inputs_emb[:, 0, :]), (gt_next, step_keys)
    )
    return logits.swapaxes(0, 1), sample_ids.swapaxes(0, 1)

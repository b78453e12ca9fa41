"""Pallas TPU kernel: fused attention-decoder step.

One decode step of the attention-wrapped LSTM decoder
(ravvent_tpu/models/decoder.py — tfa AttentionWrapper semantics,
reference: basecaller.py:119-122) normally lowers to ~10 XLA ops per scan
iteration (cell matmuls, gate nonlinearities, score matmul, masked softmax,
context matmul, attention projection, output projection). On small per-step
shapes the decode loop is op-dispatch-latency-bound, so this kernel fuses the
whole step into a single Pallas program:

  [token_emb | att_prev] -> LSTM gates -> h' -> Luong scores over memory
  -> masked softmax -> context -> attention vector -> logits

Grid: one program per batch tile (B_TILE rows). Each program keeps every
weight matrix and its tile of keys/values in VMEM; the memory axis S is
processed in full (S <= 256 after padding: 230 joint positions).

Depth-1 LSTM decoder only (the flagship config); other configs fall back to
the unfused path automatically. Numerics: fp32 accumulation via MXU
``preferred_element_type``; parity with the unfused step is tested to ~1e-5.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(np.finfo(np.float32).min)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _fused_step_kernel(
    x_ref,        # [BT, IN]  concat(token_emb, att_prev), IN = V + U (padded)
    h_ref,        # [BT, U]
    c_ref,        # [BT, U]
    wx_ref,       # [IN, 4U]
    wh_ref,       # [U, 4U]
    b_ref,        # [1, 4U]
    keys_ref,     # [BT, S, U]
    values_ref,   # [BT, S, E]
    mask_ref,     # [BT, S] float (1/0)
    watt_ref,     # [U + E, U]
    wfc_ref,      # [U, VP] (vocab padded)
    bfc_ref,      # [1, VP]
    h_out_ref,    # [BT, U]
    c_out_ref,    # [BT, U]
    att_out_ref,  # [BT, U]
    logits_ref,   # [BT, VP]
):
    U = h_ref.shape[1]
    # --- LSTM cell (gates i,f,g,o) ---
    z = (
        jnp.dot(x_ref[:], wx_ref[:], preferred_element_type=jnp.float32)
        + jnp.dot(h_ref[:], wh_ref[:], preferred_element_type=jnp.float32)
        + b_ref[0, :]
    )
    i = jax.nn.sigmoid(z[:, :U])
    f = jax.nn.sigmoid(z[:, U : 2 * U])
    g = jnp.tanh(z[:, 2 * U : 3 * U])
    o = jax.nn.sigmoid(z[:, 3 * U :])
    c_new = f * c_ref[:] + i * g
    h_new = o * jnp.tanh(c_new)
    h_out_ref[:] = h_new
    c_out_ref[:] = c_new

    # --- Luong attention over this tile's memory ---
    # scores[b, s] = h_new[b] . keys[b, s]
    scores = jax.lax.dot_general(
        h_new, keys_ref[:],
        dimension_numbers=(((1,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [BT, S]
    scores = jnp.where(mask_ref[:] > 0.5, scores, NEG_INF)
    m = jnp.max(scores, axis=1, keepdims=True)
    e = jnp.exp(scores - m)
    denom = jnp.sum(e, axis=1, keepdims=True)
    align = e / denom
    context = jax.lax.dot_general(
        align, values_ref[:],
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [BT, E]

    # --- attention vector + logits ---
    hc = jnp.concatenate([h_new, context], axis=1)
    att = jnp.dot(hc, watt_ref[:], preferred_element_type=jnp.float32)
    att_out_ref[:] = att
    logits_ref[:] = jnp.dot(att, wfc_ref[:], preferred_element_type=jnp.float32) + bfc_ref[0, :]


class FusedDecodeWeights(NamedTuple):
    """Pre-packed weights (padded to TPU-friendly shapes). Static metadata
    (vocab size, unpadded input dim) is kept OUT of this pytree so it never
    becomes a tracer under jit — pass it via the ``vocab`` argument of
    :func:`fused_decode_step` (in_dim = vocab + U).

    wx: [IN_P, 4U]; wh: [U, 4U]; b: [1, 4U]; watt: [U+E, U]; wfc: [U, VP];
    bfc: [1, VP].
    """

    wx: jnp.ndarray
    wh: jnp.ndarray
    b: jnp.ndarray
    watt: jnp.ndarray
    wfc: jnp.ndarray
    bfc: jnp.ndarray


def pack_decoder_weights(dec_params, vocab_size: int) -> FusedDecodeWeights:
    """Pack depth-1 LSTM decoder params for the fused kernel (pads the tiny
    one-hot input block of the cell kernel to the fp32 sublane multiple)."""
    assert len(dec_params["cells"]) == 1, "fused kernel supports decoder_depth=1"
    cell = dec_params["cells"][0]
    U = cell["recurrent"].shape[0]
    in_dim = cell["kernel"].shape[0]  # vocab + U
    in_p = _round_up(in_dim, 8)
    wx = jnp.zeros((in_p, 4 * U), jnp.float32).at[:in_dim].set(cell["kernel"])
    vp = _round_up(vocab_size, 128)
    fc_k = dec_params["fc"]["kernel"]
    wfc = jnp.zeros((U, vp), jnp.float32).at[:, :vocab_size].set(fc_k)
    bfc = jnp.full((1, vp), NEG_INF, jnp.float32).at[0, :vocab_size].set(
        dec_params["fc"]["bias"]
    )
    return FusedDecodeWeights(
        wx=wx,
        wh=cell["recurrent"],
        b=cell["bias"][None, :],
        watt=dec_params["attention_layer"]["kernel"],
        wfc=wfc,
        bfc=bfc,
    )


@functools.partial(jax.jit, static_argnames=("vocab", "b_tile", "interpret"))
def fused_decode_step(
    weights: FusedDecodeWeights,
    vocab: int,
    token_emb: jnp.ndarray,  # [B, vocab]
    att_prev: jnp.ndarray,  # [B, U]
    h: jnp.ndarray,  # [B, U]
    c: jnp.ndarray,  # [B, U]
    keys: jnp.ndarray,  # [B, S, U]
    values: jnp.ndarray,  # [B, S, E]
    maskf: jnp.ndarray,  # [B, S] float32 1/0
    b_tile: int = 256,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (h', c', attention, logits[:, :vocab])."""
    B, S = maskf.shape
    U = h.shape[1]
    E = values.shape[2]
    in_p = weights.wx.shape[0]
    vp = weights.wfc.shape[1]

    in_dim = vocab + U
    x = jnp.zeros((B, in_p), jnp.float32)
    x = x.at[:, :vocab].set(token_emb)
    x = x.at[:, vocab:in_dim].set(att_prev)

    grid = (B // b_tile,)
    bt = lambda *shape: pl.BlockSpec(shape, lambda ib: (ib,) + (0,) * (len(shape) - 1),
                                     memory_space=pltpu.VMEM)
    full = lambda *shape: pl.BlockSpec(shape, lambda ib: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)

    h2, c2, att, logits = pl.pallas_call(
        _fused_step_kernel,
        grid=grid,
        in_specs=[
            bt(b_tile, in_p),
            bt(b_tile, U),
            bt(b_tile, U),
            full(in_p, 4 * U),
            full(U, 4 * U),
            full(1, 4 * U),
            bt(b_tile, S, U),
            bt(b_tile, S, E),
            bt(b_tile, S),
            full(U + E, U),
            full(U, vp),
            full(1, vp),
        ],
        out_specs=[bt(b_tile, U), bt(b_tile, U), bt(b_tile, U), bt(b_tile, vp)],
        out_shape=[
            jax.ShapeDtypeStruct((B, U), jnp.float32),
            jax.ShapeDtypeStruct((B, U), jnp.float32),
            jax.ShapeDtypeStruct((B, U), jnp.float32),
            jax.ShapeDtypeStruct((B, vp), jnp.float32),
        ],
        interpret=interpret,
    )(x, h, c, weights.wx, weights.wh, weights.b, keys, values, maskf,
      weights.watt, weights.wfc, weights.bfc)
    return h2, c2, att, logits[:, :vocab]


def fused_greedy_decode(
    dec_params,
    mem,
    vocab_size: int,
    total_steps: int,
    max_steps=None,
    start_token: int = 2,
    end_token: int = 1,
    b_tile: int = 256,
    interpret: bool = False,
):
    """Greedy decode driven by the fused step kernel — same semantics as
    ravvent_tpu.decode.greedy.greedy_decode (impute_finished=False, zeroing
    after the all-finished point / step limit). Requirements: depth-1 LSTM
    Luong decoder, B divisible by b_tile, memory S padded to a sublane
    multiple of 8 with mask=False."""
    B, S = mem.mask.shape
    assert B % b_tile == 0 and S % 8 == 0
    w = pack_decoder_weights(dec_params, vocab_size)
    U = w.wh.shape[0]
    if max_steps is None:
        max_steps = total_steps
    maskf = mem.mask.astype(jnp.float32)
    keys = mem.keys.astype(jnp.float32)
    values = mem.values.astype(jnp.float32)

    h0 = jnp.zeros((B, U), jnp.float32)
    c0 = jnp.zeros((B, U), jnp.float32)
    att0 = jnp.zeros((B, U), jnp.float32)
    start_emb = jax.nn.one_hot(jnp.full((B,), start_token), vocab_size, dtype=jnp.float32)

    def body(carry, t):
        h, c, att, cur_emb, finished, all_done = carry
        h, c, att, logits = fused_decode_step(
            w, vocab_size, cur_emb, att, h, c, keys, values, maskf,
            b_tile=b_tile, interpret=interpret,
        )
        sample = jnp.argmax(logits, axis=-1)
        executes = jnp.logical_and(jnp.logical_not(all_done), t < max_steps)
        emit_tok = jnp.where(executes, sample, 0)
        emit_logits = jnp.where(executes, logits, 0.0)
        finished = jnp.logical_or(finished, sample == end_token)
        all_done = jnp.logical_or(jnp.all(finished), jnp.logical_not(executes))
        next_emb = jax.nn.one_hot(sample, vocab_size, dtype=jnp.float32)
        return (h, c, att, next_emb, finished, all_done), (emit_tok, emit_logits)

    init = (h0, c0, att0, start_emb, jnp.zeros((B,), bool), jnp.array(False))
    _, (tokens, logits) = jax.lax.scan(body, init, jnp.arange(total_steps))
    return tokens.swapaxes(0, 1), logits.swapaxes(0, 1)

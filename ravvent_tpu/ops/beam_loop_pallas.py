"""Pallas TPU kernel: the ENTIRE beam-search decode loop in one program.

The XLA beam path (ravvent_tpu/decode/beam.py) re-reads the attention memory
from HBM on every one of the ~47 decode steps — the dominant traffic of the
whole basecaller. This kernel keeps each batch tile's keys/values resident in
VMEM across the full loop (memory leaves HBM exactly once per read) together
with all weights and beam state, and runs cell + attention + projections +
beam bookkeeping per step on-core:

  per step: one-hot embed -> LSTM gates -> Luong scores over resident memory
  -> masked softmax -> (pre-projected) context -> attention vector -> logits
  -> cumulative log-probs with finished-beam end-token continuation ->
  top-W via iterated argmax -> beam-permutation of state by one-hot matmul.

Token/parent/score trajectories stream out (lane-padded to 128);
TF-gather_tree finalization reuses the XLA implementation (tiny arrays).

Scope: depth-1 LSTM + Luong + pre-projected memory (the flagship inference
config). Semantics match decode/beam.py exactly (iterated argmax == top_k
with index-order tie-breaking); parity enforced by tests.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ravvent_tpu.decode.beam import BeamResult, _gather_tree, take_along_beam
from ravvent_tpu.models import attention as attn
from ravvent_tpu.ops.decode_step_pallas import pack_decoder_weights

NEG_INF = float(np.finfo(np.float32).min)
LANES = 128


def _beam_loop_kernel(
    # scalar prefetch
    max_steps_ref,  # [1] int32 (SMEM)
    # inputs
    keys_ref,     # [BT, S, U]
    values_ref,   # [BT, S, U] (pre-projected)
    mask_ref,     # [BT, S] float 1/0
    wx_ref,       # [IN_P, 4U]
    wh_ref,       # [U, 4U]
    b_ref,        # [1, 4U]
    watth_ref,    # [U, U]
    wfc_ref,      # [U, VP]
    bfc_ref,      # [1, VP]
    # outputs (lane-padded)
    tokens_ref,   # [BT, T, LANES] int32
    parents_ref,  # [BT, T, LANES] int32
    scores_ref,   # [BT, T, LANES] float32
    # scratch
    h_ref, c_ref, att_ref,  # [BT*W, U] f32
    emb_ref,                # [BT*W, IN_P] f32 (current step's cell input base)
    cum_ref,                # [BT, LANES] f32 (first W lanes live)
    fin_ref,                # [BT, LANES] f32
    *,
    T: int,
    W: int,
    vocab: int,
    start_token: int,
    end_token: int,
):
    BT, S, U = keys_ref.shape
    VP = wfc_ref.shape[1]
    IN_P = wx_ref.shape[0]
    BW = BT * W

    # --- init ---
    h_ref[:] = jnp.zeros((BW, U), jnp.float32)
    c_ref[:] = jnp.zeros((BW, U), jnp.float32)
    att_ref[:] = jnp.zeros((BW, U), jnp.float32)
    icols = jax.lax.broadcasted_iota(jnp.int32, (BW, IN_P), 1)
    emb_ref[:] = jnp.where(icols == start_token, 1.0, 0.0)
    lanes_bt = jax.lax.broadcasted_iota(jnp.int32, (BT, LANES), 1)
    cum_ref[:] = jnp.where(lanes_bt == 0, 0.0, NEG_INF)
    fin_ref[:] = jnp.zeros((BT, LANES), jnp.float32)

    max_steps = max_steps_ref[0]
    mask_row = mask_ref[:]  # [BT, S]

    def step(t, _):
        # cell input = [one-hot token | attention | pad] (concat — value
        # scatter does not lower in Mosaic)
        emb = emb_ref[:]
        pad_cols = IN_P - vocab - U
        x = jnp.concatenate(
            [emb[:, :vocab], att_ref[:], jnp.zeros((BW, pad_cols), jnp.float32)],
            axis=1,
        )

        # --- LSTM cell ---
        z = (
            jnp.dot(x, wx_ref[:], preferred_element_type=jnp.float32)
            + jnp.dot(h_ref[:], wh_ref[:], preferred_element_type=jnp.float32)
            + b_ref[0, :]
        )
        ig = jax.nn.sigmoid(z[:, :U])
        fg = jax.nn.sigmoid(z[:, U : 2 * U])
        gg = jnp.tanh(z[:, 2 * U : 3 * U])
        og = jax.nn.sigmoid(z[:, 3 * U :])
        c_new = fg * c_ref[:] + ig * gg
        h_new = og * jnp.tanh(c_new)

        # --- Luong attention over resident memory (beams batched) ---
        hw = h_new.reshape(BT, W, U)
        scores = jax.lax.dot_general(
            hw.astype(keys_ref.dtype), keys_ref[:],
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [BT, W, S]
        scores = jnp.where(mask_row[:, None, :] > 0.5, scores, NEG_INF)
        m = jnp.max(scores, axis=2, keepdims=True)
        e = jnp.exp(scores - m)
        align = e / jnp.sum(e, axis=2, keepdims=True)
        context = jax.lax.dot_general(
            align.astype(values_ref.dtype), values_ref[:],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [BT, W, U] (pre-projected)
        att_new = (
            jnp.dot(h_new, watth_ref[:], preferred_element_type=jnp.float32)
            + context.reshape(BW, U)
        )
        logits = (
            jnp.dot(att_new, wfc_ref[:], preferred_element_type=jnp.float32)
            + bfc_ref[0, :]
        )  # [BW, VP]; padded vocab columns carry -inf bias

        # --- beam bookkeeping ---
        lmax = jnp.max(logits, axis=1, keepdims=True)
        lse = jnp.log(jnp.sum(jnp.exp(logits - lmax), axis=1, keepdims=True)) + lmax
        step_lp = (logits - lse).reshape(BT, W, VP)
        fin = fin_ref[:, :W]  # [BT, W]
        vcols = jax.lax.broadcasted_iota(jnp.int32, (BT, W, VP), 2)
        fin_row = jnp.where(vcols == end_token, 0.0, NEG_INF)
        step_lp = jnp.where(fin[..., None] > 0.5, fin_row, step_lp)
        total = cum_ref[:, :W][..., None] + step_lp  # [BT, W, VP]
        flat = total.reshape(BT, W * VP)

        # top-W by iterated argmax (ties resolved by first index, like top_k)
        def pick(k, carry):
            flat_cur, cums, idxs = carry
            best = jnp.argmax(flat_cur, axis=1).astype(jnp.int32)  # [BT]
            val = jnp.max(flat_cur, axis=1)
            kcol = jax.lax.broadcasted_iota(jnp.int32, (BT, W), 1)
            cums = jnp.where(kcol == k, val[:, None], cums)
            idxs = jnp.where(kcol == k, best[:, None], idxs)
            bcols = jax.lax.broadcasted_iota(jnp.int32, (BT, W * VP), 1)
            flat_cur = jnp.where(bcols == best[:, None], NEG_INF, flat_cur)
            return (flat_cur, cums, idxs)

        _, new_cum, idx = jax.lax.fori_loop(
            0, W, pick,
            (flat, jnp.zeros((BT, W), jnp.float32), jnp.zeros((BT, W), jnp.int32)),
        )
        parent = idx // VP
        token = idx % VP

        # permute state by parent with one-hot matmuls (W is tiny)
        wcols = jax.lax.broadcasted_iota(jnp.int32, (BT, W, W), 2)
        perm = jnp.where(wcols == parent[..., None], 1.0, 0.0)  # [BT, Wnew, Wold]

        def permute(xs):  # [BW, U] -> [BW, U]
            xw = xs.reshape(BT, W, U)
            return jax.lax.dot_general(
                perm, xw, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).reshape(BW, U)

        prev_fin = jnp.sum(perm * fin[:, None, :], axis=2)  # gathered finished
        new_fin = jnp.maximum(prev_fin, jnp.where(token == end_token, 1.0, 0.0))

        # next-step embeddings from the chosen tokens (built in [BT, W, .]
        # space — Mosaic cannot reshape across the lane dim)
        cols3 = jax.lax.broadcasted_iota(jnp.int32, (BT, W, IN_P), 2)
        emb_next = jnp.where(cols3 == token[:, :, None], 1.0, 0.0).reshape(BW, IN_P)

        live = t < max_steps

        @pl.when(live)
        def _():
            h_ref[:] = permute(h_new)
            c_ref[:] = permute(c_new)
            att_ref[:] = permute(att_new)
            emb_ref[:] = emb_next
            cum_ref[:, :W] = new_cum
            fin_ref[:, :W] = new_fin

        pad = jnp.zeros((BT, 1, LANES - W))
        tokens_ref[:, pl.ds(t, 1), :] = jnp.concatenate(
            [token[:, None, :].astype(jnp.int32), pad.astype(jnp.int32)], axis=2
        )
        parents_ref[:, pl.ds(t, 1), :] = jnp.concatenate(
            [parent[:, None, :].astype(jnp.int32), pad.astype(jnp.int32)], axis=2
        )
        scores_ref[:, pl.ds(t, 1), :] = jnp.concatenate(
            [new_cum[:, None, :], pad], axis=2
        )
        return 0

    jax.lax.fori_loop(0, T, step, 0)


@functools.partial(
    jax.jit,
    static_argnames=("vocab", "total_steps", "beam_width", "b_tile",
                     "start_token", "end_token", "interpret"),
)
def _beam_loop_call(
    weights, watt_h, keys, values, maskf, max_steps,
    vocab: int, total_steps: int, beam_width: int, b_tile: int,
    start_token: int, end_token: int, interpret: bool,
):
    B, S, U = keys.shape
    W = beam_width
    VP = weights.wfc.shape[1]
    IN_P = weights.wx.shape[0]
    grid = (B // b_tile,)

    kernel = functools.partial(
        _beam_loop_kernel, T=total_steps, W=W, vocab=vocab,
        start_token=start_token, end_token=end_token,
    )
    # NB: with PrefetchScalarGridSpec the index_map also receives the
    # scalar-prefetch refs after the grid indices.
    bt = lambda *shape: pl.BlockSpec(shape, lambda ib, *_: (ib,) + (0,) * (len(shape) - 1),
                                     memory_space=pltpu.VMEM)
    full = lambda *shape: pl.BlockSpec(shape, lambda ib, *_: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            bt(b_tile, S, U),
            bt(b_tile, S, U),
            bt(b_tile, S),
            full(IN_P, 4 * U),
            full(U, 4 * U),
            full(1, 4 * U),
            full(U, U),
            full(U, VP),
            full(1, VP),
        ],
        out_specs=[
            bt(b_tile, total_steps, LANES),
            bt(b_tile, total_steps, LANES),
            bt(b_tile, total_steps, LANES),
        ],
        scratch_shapes=[
            pltpu.VMEM((b_tile * W, U), jnp.float32),
            pltpu.VMEM((b_tile * W, U), jnp.float32),
            pltpu.VMEM((b_tile * W, U), jnp.float32),
            pltpu.VMEM((b_tile * W, IN_P), jnp.float32),
            pltpu.VMEM((b_tile, LANES), jnp.float32),
            pltpu.VMEM((b_tile, LANES), jnp.float32),
        ],
    )
    tokens, parents, scores = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, total_steps, LANES), jnp.int32),
            jax.ShapeDtypeStruct((B, total_steps, LANES), jnp.int32),
            jax.ShapeDtypeStruct((B, total_steps, LANES), jnp.float32),
        ],
        interpret=interpret,
    )(jnp.asarray(max_steps, jnp.int32).reshape(1), keys, values, maskf,
      weights.wx, weights.wh, weights.b, watt_h, weights.wfc, weights.bfc)
    W_ = beam_width
    return tokens[..., :W_], parents[..., :W_], scores[..., :W_]


def beam_loop_decode(
    dec_params,
    mem: attn.AttnMemory,
    vocab_size: int,
    beam_width: int,
    total_steps: int,
    max_steps=None,
    b_tile: int = 16,
    start_token: int = 2,
    end_token: int = 1,
    interpret: bool = False,
) -> BeamResult:
    """Whole-loop fused beam search. Requires pre-projected memory
    (``setup_memory(..., attention_layer=...)``), depth-1 LSTM, Luong."""
    assert mem.projected, "beam_loop_decode requires pre-projected memory"
    assert not mem.quantized, "int8 memory: use beam_step_decode"
    B, S = mem.mask.shape
    assert B % b_tile == 0 and S % 8 == 0
    if max_steps is None:
        max_steps = total_steps

    w = pack_decoder_weights(dec_params, vocab_size)
    watt_h = jnp.asarray(mem.watt_h, jnp.float32)

    tokens, parents, scores = _beam_loop_call(
        w, watt_h, mem.keys, mem.values, mem.mask.astype(jnp.float32), max_steps,
        vocab_size, total_steps, beam_width, b_tile,
        start_token, end_token, interpret,
    )
    tokens_t = tokens.transpose(1, 0, 2)
    parents_t = parents.transpose(1, 0, 2)
    eff_T = jnp.minimum(jnp.asarray(max_steps, jnp.int32), total_steps)
    lengths = _reconstruct_lengths(tokens_t, parents_t, end_token)
    final = _gather_tree(tokens_t, parents_t, lengths, eff_T, end_token)
    return BeamResult(tokens=final.transpose(1, 0, 2), scores=scores)


# ---------------------------------------------------------------------------
# Per-step fused beam kernel (memory streamed, full batch parallel per step)
#
# The whole-loop kernel above keeps memory VMEM-resident but must serialize
# batch tiles (VMEM caps the tile at ~16-64 rows), so at large batch its
# sequential-step count explodes. This variant fuses ONE beam step — cell +
# attention + logits + top-W + beam permutation — over the full batch and
# lets lax.scan drive the 47 steps: per step the memory streams from HBM
# once (the true bandwidth floor) while every tile runs through the pipelined
# grid. Faster than both the XLA path (no per-op dispatch/intermediate
# traffic) and the whole-loop kernel whenever B >> tile size.
# ---------------------------------------------------------------------------


def _beam_step_kernel(
    emb_ref,   # [bt*W, IN_P] one-hot token in first `vocab` cols
    h_ref, c_ref, att_ref,  # [bt*W, U]
    cum_ref, fin_ref,       # [bt, LANES] (first W lanes live)
    keys_ref, values_ref,   # [bt, S, U] (values pre-projected; int8 if QUANT)
    kscale_ref, vscale_ref,  # [bt, S] f32 dequant scales (ones if not QUANT)
    mask_ref,               # [bt, S] float 1/0
    wx_ref, wh_ref, b_ref, watth_ref, wfc_ref, bfc_ref,
    h_out, c_out, att_out, emb_out,  # [bt*W, ...]
    cum_out, fin_out,                # [bt, LANES]
    tok_out, par_out,                # [bt, LANES] int32
    *,
    W: int,
    vocab: int,
    end_token: int,
    quant: bool,
    quant_mxu: bool = False,
):
    BT, S, U = keys_ref.shape
    VP = wfc_ref.shape[1]
    IN_P = wx_ref.shape[0]
    BW = BT * W

    pad_cols = IN_P - vocab - U
    x = jnp.concatenate(
        [emb_ref[:, :vocab], att_ref[:], jnp.zeros((BW, pad_cols), jnp.float32)],
        axis=1,
    )
    z = (
        jnp.dot(x, wx_ref[:], preferred_element_type=jnp.float32)
        + jnp.dot(h_ref[:], wh_ref[:], preferred_element_type=jnp.float32)
        + b_ref[0, :]
    )
    ig = jax.nn.sigmoid(z[:, :U])
    fg = jax.nn.sigmoid(z[:, U : 2 * U])
    gg = jnp.tanh(z[:, 2 * U : 3 * U])
    og = jax.nn.sigmoid(z[:, 3 * U :])
    c_new = fg * c_ref[:] + ig * gg
    h_new = og * jnp.tanh(c_new)

    hw = h_new.reshape(BT, W, U)
    # int8-quantized memory: the per-(row, position) scale factors commute
    # with the contractions over U, so folding kscale into the scores and
    # vscale into the alignment is exact dequantization at W- instead of
    # U-sized elementwise cost.
    if quant and quant_mxu:
        # Native s8 x s8 -> s32 MXU dots: the memory stays int8 end-to-end
        # (half the per-step HBM streaming, no U-sized in-kernel convert —
        # the dequant path's convert eats what its bytes save). The query
        # side quantizes exactly: h = o*tanh(c) is bounded to (-1, 1), so a
        # FIXED 127 scale loses < 0.4% — below the key-quantization noise
        # already accepted by the i8 memory mode.
        hq = jnp.round(hw * 127.0).astype(jnp.int8)
        scores = jax.lax.dot_general(
            hq, keys_ref[:],
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * (1.0 / 127.0)
        scores = scores * kscale_ref[:][:, None, :]
    else:
        kdt = jnp.bfloat16 if quant else keys_ref.dtype
        scores = jax.lax.dot_general(
            hw.astype(kdt), keys_ref[:].astype(kdt),
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        if quant:
            scores = scores * kscale_ref[:][:, None, :]
    scores = jnp.where(mask_ref[:][:, None, :] > 0.5, scores, NEG_INF)
    m = jnp.max(scores, axis=2, keepdims=True)
    e = jnp.exp(scores - m)
    align = e / jnp.sum(e, axis=2, keepdims=True)
    if quant and quant_mxu:
        # Fold the per-position value scales into the alignment (exact),
        # then quantize the folded row with a dynamic per-(row, beam)
        # max-abs scale so the value dot also runs s8 x s8 on the MXU.
        af = align * vscale_ref[:][:, None, :]
        amax = jnp.maximum(jnp.max(af, axis=2, keepdims=True), 1e-30)
        aq = jnp.round(af * (127.0 / amax)).astype(jnp.int8)
        context = jax.lax.dot_general(
            aq, values_ref[:],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * (amax / 127.0)
    else:
        if quant:
            align = align * vscale_ref[:][:, None, :]
        vdt = jnp.bfloat16 if quant else values_ref.dtype
        context = jax.lax.dot_general(
            align.astype(vdt), values_ref[:].astype(vdt),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
    att_new = (
        jnp.dot(h_new, watth_ref[:], preferred_element_type=jnp.float32)
        + context.reshape(BW, U)
    )
    logits = (
        jnp.dot(att_new, wfc_ref[:], preferred_element_type=jnp.float32)
        + bfc_ref[0, :]
    )

    lmax = jnp.max(logits, axis=1, keepdims=True)
    lse = jnp.log(jnp.sum(jnp.exp(logits - lmax), axis=1, keepdims=True)) + lmax
    step_lp = (logits - lse).reshape(BT, W, VP)
    fin = fin_ref[:, :W]
    vcols = jax.lax.broadcasted_iota(jnp.int32, (BT, W, VP), 2)
    fin_row = jnp.where(vcols == end_token, 0.0, NEG_INF)
    step_lp = jnp.where(fin[..., None] > 0.5, fin_row, step_lp)
    total = cum_ref[:, :W][..., None] + step_lp
    flat = total.reshape(BT, W * VP)

    def pick(k, carry):
        flat_cur, cums, idxs = carry
        best = jnp.argmax(flat_cur, axis=1).astype(jnp.int32)
        val = jnp.max(flat_cur, axis=1)
        kcol = jax.lax.broadcasted_iota(jnp.int32, (BT, W), 1)
        cums = jnp.where(kcol == k, val[:, None], cums)
        idxs = jnp.where(kcol == k, best[:, None], idxs)
        bcols = jax.lax.broadcasted_iota(jnp.int32, (BT, W * VP), 1)
        flat_cur = jnp.where(bcols == best[:, None], NEG_INF, flat_cur)
        return (flat_cur, cums, idxs)

    _, new_cum, idx = jax.lax.fori_loop(
        0, W, pick,
        (flat, jnp.zeros((BT, W), jnp.float32), jnp.zeros((BT, W), jnp.int32)),
    )
    parent = idx // VP
    token = idx % VP

    wcols = jax.lax.broadcasted_iota(jnp.int32, (BT, W, W), 2)
    perm = jnp.where(wcols == parent[..., None], 1.0, 0.0)

    def permute(xs):
        xw = xs.reshape(BT, W, U)
        return jax.lax.dot_general(
            perm, xw, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).reshape(BW, U)

    prev_fin = jnp.sum(perm * fin[:, None, :], axis=2)
    new_fin = jnp.maximum(prev_fin, jnp.where(token == end_token, 1.0, 0.0))

    cols3 = jax.lax.broadcasted_iota(jnp.int32, (BT, W, IN_P), 2)
    emb_out[:] = jnp.where(cols3 == token[:, :, None], 1.0, 0.0).reshape(BW, IN_P)
    h_out[:] = permute(h_new)
    c_out[:] = permute(c_new)
    att_out[:] = permute(att_new)

    pad_i = jnp.zeros((BT, LANES - W), jnp.int32)
    pad_f = jnp.zeros((BT, LANES - W), jnp.float32)
    cum_out[:] = jnp.concatenate([new_cum, pad_f], axis=1)
    fin_out[:] = jnp.concatenate([new_fin, pad_f], axis=1)
    tok_out[:] = jnp.concatenate([token, pad_i], axis=1)
    par_out[:] = jnp.concatenate([parent, pad_i], axis=1)


@functools.partial(
    jax.jit,
    static_argnames=("vocab", "total_steps", "beam_width", "b_tile",
                     "start_token", "end_token", "interpret", "quant",
                     "quant_mxu"),
)
def _beam_step_scan(
    weights, watt_h, keys, values, kscale, vscale, maskf, max_steps,
    vocab: int, total_steps: int, beam_width: int, b_tile: int,
    start_token: int, end_token: int, interpret: bool, quant: bool,
    quant_mxu: bool = False,
):
    B, S, U = keys.shape
    W = beam_width
    VP = weights.wfc.shape[1]
    IN_P = weights.wx.shape[0]
    BW = B * W
    grid = (B // b_tile,)

    kernel = functools.partial(
        _beam_step_kernel, W=W, vocab=vocab, end_token=end_token, quant=quant,
        quant_mxu=quant_mxu,
    )
    bt = lambda *shape: pl.BlockSpec(shape, lambda ib: (ib,) + (0,) * (len(shape) - 1),
                                     memory_space=pltpu.VMEM)
    full = lambda *shape: pl.BlockSpec(shape, lambda ib: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)

    step_call = functools.partial(
        pl.pallas_call,
        kernel,
        grid=grid,
        in_specs=[
            bt(b_tile * W, IN_P),
            bt(b_tile * W, U), bt(b_tile * W, U), bt(b_tile * W, U),
            bt(b_tile, LANES), bt(b_tile, LANES),
            bt(b_tile, S, U), bt(b_tile, S, U),
            bt(b_tile, S), bt(b_tile, S), bt(b_tile, S),
            full(IN_P, 4 * U), full(U, 4 * U), full(1, 4 * U),
            full(U, U), full(U, VP), full(1, VP),
        ],
        out_specs=[
            bt(b_tile * W, U), bt(b_tile * W, U), bt(b_tile * W, U),
            bt(b_tile * W, IN_P),
            bt(b_tile, LANES), bt(b_tile, LANES),
            bt(b_tile, LANES), bt(b_tile, LANES),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BW, U), jnp.float32),
            jax.ShapeDtypeStruct((BW, U), jnp.float32),
            jax.ShapeDtypeStruct((BW, U), jnp.float32),
            jax.ShapeDtypeStruct((BW, IN_P), jnp.float32),
            jax.ShapeDtypeStruct((B, LANES), jnp.float32),
            jax.ShapeDtypeStruct((B, LANES), jnp.float32),
            jax.ShapeDtypeStruct((B, LANES), jnp.int32),
            jax.ShapeDtypeStruct((B, LANES), jnp.int32),
        ],
        interpret=interpret,
    )()

    lanes = jnp.arange(LANES)[None, :]
    h0 = jnp.zeros((BW, U), jnp.float32)
    c0 = jnp.zeros((BW, U), jnp.float32)
    att0 = jnp.zeros((BW, U), jnp.float32)
    emb0 = (jnp.arange(IN_P)[None, :] == start_token).astype(jnp.float32)
    emb0 = jnp.broadcast_to(emb0, (BW, IN_P))
    cum0 = jnp.where(lanes == 0, 0.0, NEG_INF)
    cum0 = jnp.broadcast_to(cum0, (B, LANES))
    fin0 = jnp.zeros((B, LANES), jnp.float32)

    # Early-exit loop: max_steps (the reference's ground-truth-derived decode
    # bound, typically ~35 of the 47 static steps) is a dynamic limit — a
    # while_loop skips the dead tail entirely instead of computing and
    # discarding it. Dead-region outputs stay zero; _gather_tree and the
    # score->prob conversion only consume steps < max_steps.
    eff = jnp.minimum(jnp.asarray(max_steps, jnp.int32), total_steps)
    toks0 = jnp.zeros((total_steps, B, beam_width), jnp.int32)
    pars0 = jnp.zeros((total_steps, B, beam_width), jnp.int32)
    scs0 = jnp.zeros((total_steps, B, beam_width), jnp.float32)

    def cond(st):
        return st[0] < eff

    def body(st):
        t, h, c, att, emb, cum, fin, toks, pars, scs = st
        nh, nc, natt, nemb, ncum, nfin, tok, par = step_call(
            emb, h, c, att, cum, fin, keys, values, kscale, vscale, maskf,
            weights.wx, weights.wh, weights.b, watt_h, weights.wfc, weights.bfc,
        )
        upd = lambda a, x: jax.lax.dynamic_update_slice(
            a, x[None, :, :beam_width], (t, 0, 0)
        )
        return (
            t + 1, nh, nc, natt, nemb, ncum, nfin,
            upd(toks, tok), upd(pars, par), upd(scs, ncum),
        )

    st = jax.lax.while_loop(
        cond, body,
        (jnp.asarray(0, jnp.int32), h0, c0, att0, emb0, cum0, fin0,
         toks0, pars0, scs0),
    )
    tokens, parents, scores = st[7], st[8], st[9]
    # [T, B, W] each
    return tokens, parents, scores


def beam_step_decode(
    dec_params,
    mem: attn.AttnMemory,
    vocab_size: int,
    beam_width: int,
    total_steps: int,
    max_steps=None,
    b_tile: int | None = None,
    start_token: int = 2,
    end_token: int = 1,
    interpret: bool = False,
    quant_mxu: bool = False,
) -> BeamResult:
    """Per-step fused beam search (scan outside, fused kernel per step).
    Same semantics/requirements as :func:`beam_loop_decode`; preferred at
    large batch where memory residency would over-serialize.

    ``b_tile=None`` picks the largest batch tile whose double-buffered
    keys/values blocks fit the scoped-VMEM stack (device sweep, flagship
    slab [3072, 232, 128] x 32 steps: bf16 bt64 16.37ms < bf16 bt32 17.51ms
    < i8 bt64 17.79ms — the kernel is HBM-streaming bound at bf16 and the
    mixed-precision i8 dot converts in-kernel, eating the bytes saved;
    bt128 exceeds VMEM for both)."""
    assert mem.projected, "beam_step_decode requires pre-projected memory"
    B, S = mem.mask.shape
    if b_tile is None:
        U = mem.keys.shape[-1]
        isz = mem.keys.dtype.itemsize
        b_tile = 8
        for bt in (64, 32, 16):
            if B % bt == 0 and 2 * 2 * bt * S * U * isz <= 16 * 1024 * 1024:
                b_tile = bt
                break
    assert B % b_tile == 0 and S % 8 == 0
    if max_steps is None:
        max_steps = total_steps

    w = pack_decoder_weights(dec_params, vocab_size)
    watt_h = jnp.asarray(mem.watt_h, jnp.float32)
    quant = mem.quantized
    if quant:
        kscale, vscale = mem.kscale, mem.vscale
    else:
        # unused by the kernel (quant=False skips the multiplies) but the
        # block pipeline still wants well-shaped refs; ~1% extra traffic
        kscale = jnp.ones(mem.mask.shape, jnp.float32)
        vscale = kscale

    tokens, parents, scores = _beam_step_scan(
        w, watt_h, mem.keys, mem.values, kscale, vscale,
        mem.mask.astype(jnp.float32),
        jnp.asarray(max_steps, jnp.int32),
        vocab_size, total_steps, beam_width, b_tile,
        start_token, end_token, interpret, quant,
        quant_mxu and quant,
    )
    eff_T = jnp.minimum(jnp.asarray(max_steps, jnp.int32), total_steps)
    lengths = _reconstruct_lengths(tokens, parents, end_token)
    final = _gather_tree(tokens, parents, lengths, eff_T, end_token)
    return BeamResult(
        tokens=final.transpose(1, 0, 2), scores=scores.transpose(1, 0, 2)
    )


def _reconstruct_lengths(tokens, parents, end_token):
    """Per-step beam prediction lengths [T, B, W], the same recurrence
    decode/beam.py carries: gathered parent's length + 1 while the parent was
    unfinished (the kernel streams tokens/parents; lengths are derived)."""
    T, B, W = tokens.shape

    def body(carry, ts):
        lengths, finished = carry
        tok, par = ts
        pl_ = take_along_beam(lengths, par)
        pf = take_along_beam(finished, par)
        nl = pl_ + (~pf).astype(jnp.int32)
        nf = jnp.logical_or(pf, tok == end_token)
        return (nl, nf), nl

    (_, _), out = jax.lax.scan(
        body,
        (jnp.zeros((B, W), jnp.int32), jnp.zeros((B, W), bool)),
        (tokens, parents),
    )
    return out

"""Luong and Bahdanau attention with tfa-compatible semantics.

Rebuild of the tfa attention mechanisms as used by the reference decoder
(reference: basecaller.py:109-134 building ``tfa.seq2seq.LuongAttention`` /
``BahdanauAttention`` with ``memory=None`` + later ``setup_memory``):

- memory values are zeroed at masked positions before the key projection
  (tfa ``_prepare_memory``);
- Luong: ``keys = values @ W_mem`` (no bias); ``score = q . keys``;
- Bahdanau: ``score = sum(v * tanh(W_q q + keys))`` (non-normalized form);
- probabilities: softmax over scores with masked positions at -inf;
- context: probability-weighted sum of the (zeroed) values.

``setup_memory`` is a pure precomputation returning an :class:`AttnMemory`
carried through the decode loop — the TPU-friendly analogue of tfa's
stateful ``attention_mechanism.setup_memory`` (reference: basecaller.py:237).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ravvent_tpu.models.rnn import glorot_uniform

Params = Dict[str, Any]

NEG_INF = float(jnp.finfo(jnp.float32).min)


class AttnMemory(NamedTuple):
    keys: jnp.ndarray  # [B, S, units]
    values: jnp.ndarray  # [B, S, memory_dim] — or pre-projected [B, S, units]
    mask: jnp.ndarray  # [B, S] bool
    # When projected=True, ``values`` already carries values @ W_att[U:] (the
    # context half of the AttentionWrapper attention_layer), and ``watt_h``
    # holds W_att[:U] (the cell-output half). The attention vector is then
    #   att = query @ watt_h + align @ values
    # — associativity-equivalent to Dense([query; context]) but reading
    # units (128) instead of memory_dim (256) floats per position per step.
    watt_h: Optional[jnp.ndarray] = None
    # int8-quantized memory (dtype="i8"): keys/values hold int8 codes and
    # kscale/vscale the per-(row, position) dequantization scales, i.e.
    # keys_f32[b, s, :] == keys[b, s, :] * kscale[b, s]. Halves the decode
    # loop's HBM traffic again vs bf16; consumers fold the scale into the
    # score / alignment vectors (exactly equivalent to dequantizing K/V).
    kscale: Optional[jnp.ndarray] = None  # [B, S] f32
    vscale: Optional[jnp.ndarray] = None  # [B, S] f32

    @property
    def projected(self) -> bool:
        return self.watt_h is not None

    @property
    def quantized(self) -> bool:
        return self.kscale is not None


def init_attention(
    key, attention_type: str, units: int, memory_dim: int, query_dim: int
) -> Params:
    if attention_type == "luong":
        # tfa LuongAttention: memory_layer Dense(units, use_bias=False);
        # query dim must equal units (cell output).
        return {"memory_kernel": glorot_uniform(key, (memory_dim, units))}
    if attention_type == "bahdanau":
        k1, k2, k3 = jax.random.split(key, 3)
        limit = jnp.sqrt(6.0 / (units + units))
        return {
            "memory_kernel": glorot_uniform(k1, (memory_dim, units)),
            "query_kernel": glorot_uniform(k2, (query_dim, units)),
            "attention_v": jax.random.uniform(k3, (units,), minval=-limit, maxval=limit),
        }
    raise ValueError(f"unknown attention_type {attention_type}")


def setup_memory(
    params: Params, memory: jnp.ndarray, mask: jnp.ndarray, dtype=None,
    attention_layer: Optional[Params] = None,
) -> AttnMemory:
    """Precompute keys from (masked) memory. ``memory``: [B, S, memory_dim],
    ``mask``: [B, S] bool.

    ``dtype=jnp.bfloat16`` stores keys/values in bf16 — the decode loop
    re-reads the whole memory every step, so this halves the dominant HBM
    traffic; score/context matmuls still accumulate in fp32.

    Passing the AttentionWrapper ``attention_layer`` params additionally
    pre-projects the values through the context half of that layer (see
    AttnMemory.projected) — mathematically the same attention vector with a
    third less per-step memory traffic.

    ``dtype="i8"`` (string) quantizes keys/values to int8 with per-(row,
    position) max-abs scales (see AttnMemory.kscale) — half the bf16 bytes;
    requires a consumer that understands quantized memory (the fused
    per-step beam kernel)."""
    values = jnp.where(mask[..., None], memory, 0.0)
    keys = values @ params["memory_kernel"]
    watt_h = None
    if attention_layer is not None:
        U = keys.shape[-1]
        kernel = attention_layer["kernel"]  # [U + E, U]
        watt_h = kernel[:U]
        values = values @ kernel[U:]
    if isinstance(dtype, str) and dtype == "i8":
        def quant(x):
            scale = jnp.maximum(jnp.abs(x).max(axis=-1), 1e-12) / 127.0
            q = jnp.clip(
                jnp.round(x / scale[..., None]), -127, 127
            ).astype(jnp.int8)
            return q, scale.astype(jnp.float32)
        keys_q, kscale = quant(keys)
        values_q, vscale = quant(values)
        return AttnMemory(keys=keys_q, values=values_q, mask=mask,
                          watt_h=watt_h, kscale=kscale, vscale=vscale)
    if dtype is not None:
        keys = keys.astype(dtype)
        values = values.astype(dtype)
    return AttnMemory(keys=keys, values=values, mask=mask, watt_h=watt_h)


def attention_scores(
    params: Params, attention_type: str, query: jnp.ndarray, mem: AttnMemory
) -> jnp.ndarray:
    """Raw scores [B, S] for query [B, q_dim]."""
    assert not mem.quantized, (
        "int8-quantized memory is only consumed by the fused per-step beam "
        "kernel (beam_step_decode)")
    if attention_type == "luong":
        return jnp.einsum(
            "bu,bsu->bs", query.astype(mem.keys.dtype), mem.keys,
            preferred_element_type=jnp.float32,
        )
    # bahdanau (non-normalized): sum(v * tanh(W_q q + keys))
    q = query @ params["query_kernel"]
    return jnp.einsum(
        "u,bsu->bs", params["attention_v"],
        jnp.tanh(q[:, None, :] + mem.keys.astype(jnp.float32)),
    )


def attend(
    params: Params, attention_type: str, query: jnp.ndarray, mem: AttnMemory
):
    """Returns (context [B, memory_dim], alignments [B, S])."""
    scores = attention_scores(params, attention_type, query, mem)
    scores = jnp.where(mem.mask, scores, NEG_INF)
    align = jax.nn.softmax(scores, axis=-1)
    context = jnp.einsum(
        "bs,bse->be", align.astype(mem.values.dtype), mem.values,
        preferred_element_type=jnp.float32,
    )
    return context, align


def attend_beams(
    params: Params, attention_type: str, query: jnp.ndarray, mem: AttnMemory
):
    """Beam-batched attention: query [B, W, q_dim] against untiled memory.

    Keeps the memory [B, S, E] read once per step instead of tiling it across
    beams (the tfa ``tile_batch`` approach would multiply HBM traffic by the
    beam width). Returns (context [B, W, memory_dim], alignments [B, W, S]).
    """
    if attention_type == "luong":
        scores = jnp.einsum(
            "bwu,bsu->bws", query.astype(mem.keys.dtype), mem.keys,
            preferred_element_type=jnp.float32,
        )
    else:
        q = query @ params["query_kernel"]  # [B, W, units]
        scores = jnp.einsum(
            "u,bwsu->bws",
            params["attention_v"],
            jnp.tanh(q[:, :, None, :] + mem.keys.astype(jnp.float32)[:, None, :, :]),
        )
    scores = jnp.where(mem.mask[:, None, :], scores, NEG_INF)
    align = jax.nn.softmax(scores, axis=-1)
    context = jnp.einsum(
        "bws,bse->bwe", align.astype(mem.values.dtype), mem.values,
        preferred_element_type=jnp.float32,
    )
    return context, align

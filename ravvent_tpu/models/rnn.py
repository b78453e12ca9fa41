"""Recurrent cells and scan-based (bi)directional stacked encoders.

TPU-first rebuild of the reference encoder stack
(reference: basecaller.py:7-59): keras (Bi)LSTM/GRU layers become pure
functions over parameter pytrees driven by ``jax.lax.scan``. The input
projection ``x @ W`` for all timesteps is hoisted out of the scan into one
large time-parallel matmul (MXU-friendly); only the recurrent matmul stays
sequential.

Cell semantics match keras defaults so behavior is comparable:
- LSTMCell: gate order (i, f, g, o), sigmoid recurrent activation, tanh
  activation, unit forget bias, glorot-uniform kernel, orthogonal recurrent.
- GRUCell: ``reset_after=True`` (TF2 default), gate order (z, r, h), separate
  input/recurrent biases.
- Layer stacking: final states of layer i seed the initial state of layer
  i+1 (reference: basecaller.py:52-57); for bidirectional layers, forward
  states seed the next forward direction and backward seed backward (keras
  ``Bidirectional`` initial_state split).
- The reference never passes a mask into the encoder (its ``mask`` kwarg is
  only forwarded when non-None, and callers pass None —
  basecaller.py:48-59, 395-416), so padded timesteps are processed as
  ordinary zero inputs. Preserved: no masking here.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


def _stream_mm(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Matmul honoring a bf16 stream: when ``a`` is bf16, run the MXU matmul
    in bf16 with fp32 accumulation; otherwise plain fp32."""
    if a.dtype == jnp.bfloat16:
        return jnp.matmul(a, b.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
    return a @ b


def glorot_uniform(key, shape, dtype=jnp.float32):
    fan_in, fan_out = shape[0], shape[1]
    limit = jnp.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -limit, limit)


def orthogonal(key, shape, dtype=jnp.float32):
    return jax.nn.initializers.orthogonal()(key, shape, dtype)


def init_dense(key, in_dim: int, out_dim: int, use_bias: bool = True) -> Params:
    p = {"kernel": glorot_uniform(key, (in_dim, out_dim))}
    if use_bias:
        p["bias"] = jnp.zeros((out_dim,))
    return p


def dense(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    y = x @ p["kernel"]
    if "bias" in p:
        y = y + p["bias"]
    return y


# ---------------------------------------------------------------------------
# Cells
# ---------------------------------------------------------------------------


def init_lstm_cell(key, in_dim: int, units: int) -> Params:
    k1, k2 = jax.random.split(key)
    bias = jnp.zeros((4 * units,))
    # unit_forget_bias (keras default): forget-gate bias = 1
    bias = bias.at[units : 2 * units].set(1.0)
    return {
        "kernel": glorot_uniform(k1, (in_dim, 4 * units)),
        "recurrent": orthogonal(k2, (units, 4 * units)),
        "bias": bias,
    }


def lstm_zero_state(batch: int, units: int, dtype=jnp.float32):
    return (jnp.zeros((batch, units), dtype), jnp.zeros((batch, units), dtype))


def lstm_step(p: Params, carry, x: jnp.ndarray, x_proj: Optional[jnp.ndarray] = None):
    """One LSTM step. ``x_proj`` = precomputed ``x @ kernel + bias`` (the
    time-parallel path); otherwise computed here."""
    h, c = carry
    z = (x @ p["kernel"] + p["bias"]) if x_proj is None else x_proj
    z = z + h @ p["recurrent"]
    u = p["recurrent"].shape[0]
    i, f, g, o = z[:, :u], z[:, u : 2 * u], z[:, 2 * u : 3 * u], z[:, 3 * u :]
    c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h = jax.nn.sigmoid(o) * jnp.tanh(c)
    return (h, c), h


def init_gru_cell(key, in_dim: int, units: int) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "kernel": glorot_uniform(k1, (in_dim, 3 * units)),
        "recurrent": orthogonal(k2, (units, 3 * units)),
        "input_bias": jnp.zeros((3 * units,)),
        "recurrent_bias": jnp.zeros((3 * units,)),
    }


def gru_zero_state(batch: int, units: int, dtype=jnp.float32):
    return (jnp.zeros((batch, units), dtype),)


def gru_step(p: Params, carry, x: jnp.ndarray, x_proj: Optional[jnp.ndarray] = None):
    """GRU with keras ``reset_after=True`` semantics."""
    (h,) = carry
    mx = (x @ p["kernel"] + p["input_bias"]) if x_proj is None else x_proj
    mi = h @ p["recurrent"] + p["recurrent_bias"]
    u = p["recurrent"].shape[0]
    xz, xr, xh = mx[:, :u], mx[:, u : 2 * u], mx[:, 2 * u :]
    rz, rr, rh = mi[:, :u], mi[:, u : 2 * u], mi[:, 2 * u :]
    z = jax.nn.sigmoid(xz + rz)
    r = jax.nn.sigmoid(xr + rr)
    hh = jnp.tanh(xh + r * rh)
    h = z * h + (1.0 - z) * hh
    return (h,), h


CELLS = {
    "lstm": (init_lstm_cell, lstm_step, lstm_zero_state, 4),
    "gru": (init_gru_cell, gru_step, gru_zero_state, 3),
}


def cell_zero_state(cell_type: str, batch: int, units: int, dtype=jnp.float32):
    return CELLS[cell_type][2](batch, units, dtype)


def cell_step(cell_type: str, p: Params, carry, x, x_proj=None):
    return CELLS[cell_type][1](p, carry, x, x_proj)


# ---------------------------------------------------------------------------
# Unidirectional layer scan
# ---------------------------------------------------------------------------


def run_rnn_layer(
    p: Params,
    cell_type: str,
    xs: jnp.ndarray,  # [B, T, F]
    initial_state=None,
    reverse: bool = False,
):
    """Run one recurrent layer over time with a hoisted input projection.

    Returns (outputs [B, T, U], final_state).
    """
    _, step, zero_state, ngates = CELLS[cell_type]
    B, T, _ = xs.shape
    units = p["recurrent"].shape[0]
    # State/accumulation stays fp32 even on a bf16 input stream; only the
    # matmul operands are bf16 (_stream_mm).
    if initial_state is None:
        initial_state = zero_state(B, units)

    # Time-parallel input projection: one [B*T, F] @ [F, ngates*U] matmul.
    bias = p["bias"] if cell_type == "lstm" else p["input_bias"]
    proj = _stream_mm(xs.reshape(B * T, -1), p["kernel"]) + bias
    proj = proj.reshape(B, T, ngates * units).swapaxes(0, 1)  # [T, B, G*U]

    def body(carry, xp):
        carry, h = step(p, carry, None, x_proj=xp)
        return carry, h.astype(xs.dtype)

    final, outs = jax.lax.scan(body, initial_state, proj, reverse=reverse)
    return outs.swapaxes(0, 1), final


def run_bidi_layer(
    layer: Params,
    cell_type: str,
    xs: jnp.ndarray,  # [B, T, F]
    initial_state=None,  # pytree with leading direction axis [2, B, U] per leaf
):
    """Forward + backward directions of one bidirectional layer in a single
    ``lax.scan``: the two directions are stacked on a leading axis so each
    step runs one batched matmul ``[2, B, U] @ [2, U, G*U]`` instead of two
    scans with two small matmuls — half the sequential-loop iterations and
    better MXU utilization.

    Returns (outputs [B, T, 2U] time-aligned, final_state stacked [2, B, U]).
    """
    pf, pb = layer["fwd"], layer["bwd"]
    B, T, _ = xs.shape
    units = pf["recurrent"].shape[0]
    ngates = CELLS[cell_type][3]

    bias_key = "bias" if cell_type == "lstm" else "input_bias"
    proj_f = _stream_mm(xs.reshape(B * T, -1), pf["kernel"]) + pf[bias_key]
    proj_b = _stream_mm(xs[:, ::-1].reshape(B * T, -1), pb["kernel"]) + pb[bias_key]
    proj = jnp.stack(
        [
            proj_f.reshape(B, T, ngates * units).swapaxes(0, 1),
            proj_b.reshape(B, T, ngates * units).swapaxes(0, 1),
        ],
        axis=1,
    )  # [T, 2, B, G*U]

    R = jnp.stack([pf["recurrent"], pb["recurrent"]])  # [2, U, G*U]
    # bf16 stream: bf16 matmul operands, fp32 state/accumulation
    stream = xs.dtype
    if stream == jnp.bfloat16:
        R = R.astype(jnp.bfloat16)

    def _rec(h):
        a = h.astype(stream) if stream == jnp.bfloat16 else h
        return jnp.einsum("dbu,dug->dbg", a, R,
                          preferred_element_type=jnp.float32)

    if cell_type == "lstm":
        if initial_state is None:
            h0 = jnp.zeros((2, B, units))
            c0 = jnp.zeros((2, B, units))
        else:
            h0, c0 = initial_state

        def body(carry, zt):
            h, c = carry
            z = zt + _rec(h)
            i, f, g, o = (
                z[..., :units], z[..., units : 2 * units],
                z[..., 2 * units : 3 * units], z[..., 3 * units :],
            )
            c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
            h = jax.nn.sigmoid(o) * jnp.tanh(c)
            return (h, c), h.astype(stream)

        final, outs = jax.lax.scan(body, (h0, c0), proj)
    else:
        rbias = jnp.stack([pf["recurrent_bias"], pb["recurrent_bias"]])  # [2, G*U]
        if initial_state is None:
            h0 = jnp.zeros((2, B, units))
        else:
            (h0,) = initial_state

        def body(carry, zt):
            (h,) = carry
            mi = _rec(h) + rbias[:, None, :]
            xz, xr, xh = (
                zt[..., :units], zt[..., units : 2 * units], zt[..., 2 * units :],
            )
            rz, rr, rh = (
                mi[..., :units], mi[..., units : 2 * units], mi[..., 2 * units :],
            )
            z = jax.nn.sigmoid(xz + rz)
            r = jax.nn.sigmoid(xr + rr)
            hh = jnp.tanh(xh + r * rh)
            h = z * h + (1.0 - z) * hh
            return (h,), h.astype(stream)

        final, outs = jax.lax.scan(body, (h0,), proj)

    # outs: [T, 2, B, U]; backward outputs come out in reversed time order,
    # so flip them along T to time-align with the forward direction.
    out_f = outs[:, 0].swapaxes(0, 1)  # [B, T, U]
    out_b = outs[::-1, 1].swapaxes(0, 1)
    return jnp.concatenate([out_f, out_b], axis=-1), final


# ---------------------------------------------------------------------------
# Stacked (bi)directional encoder
# ---------------------------------------------------------------------------


def init_encoder(
    key,
    units: int,
    depth: int,
    in_features: int,
    cell_type: str = "lstm",
    bidirectional: bool = True,
) -> List[Params]:
    init_cell = CELLS[cell_type][0]
    layers = []
    in_dim = in_features
    for d in range(depth):
        key, kf, kb = jax.random.split(key, 3)
        layer = {"fwd": init_cell(kf, in_dim, units)}
        if bidirectional:
            layer["bwd"] = init_cell(kb, in_dim, units)
        layers.append(layer)
        in_dim = units * (2 if bidirectional else 1)
    return layers


# Pallas fused-layer routing: None = auto (TPU backend + shapes supported),
# True/False = force. Tests flip this to exercise both paths.
USE_PALLAS_ENCODER: Optional[bool] = None


def _pallas_enabled(B: int, T: int, F: int, U: int, itemsize: int) -> bool:
    if USE_PALLAS_ENCODER is not None:
        return USE_PALLAS_ENCODER
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    from ravvent_tpu.ops.rnn_pallas import pallas_supported

    return pallas_supported(B, T, F, U, itemsize)


def encoder_apply(
    layers: List[Params],
    xs: jnp.ndarray,  # [B, T, F]
    cell_type: str = "lstm",
    bidirectional: bool = True,
    trainable: bool = False,
) -> Tuple[jnp.ndarray, Any]:
    """Stacked encoder; layer i's final states seed layer i+1
    (reference: basecaller.py:52-57 / keras Bidirectional initial_state
    split: forward states seed forward, backward seed backward). Returns
    (outputs [B, T, U*dirs], final states of the last layer).

    ``trainable=True`` forces the scan path (the fused Pallas layer has no
    VJP rule — inference only)."""
    out = xs
    state = None
    if bidirectional:
        for layer in layers:
            B, T, F = out.shape
            U = layer["fwd"]["recurrent"].shape[0]
            if (
                cell_type == "lstm"
                and not trainable
                and _pallas_enabled(B, T, F, U, out.dtype.itemsize)
            ):
                from ravvent_tpu.ops.rnn_pallas import run_bidi_lstm_pallas

                out, state = run_bidi_lstm_pallas(layer, out, initial_state=state)
            else:
                out, state = run_bidi_layer(layer, cell_type, out, initial_state=state)
        return out, state
    for layer in layers:
        out, state = run_rnn_layer(layer["fwd"], cell_type, out, initial_state=state)
    return out, (state,)

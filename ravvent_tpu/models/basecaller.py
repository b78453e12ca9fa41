"""The Basecaller model: raw + event encoders, attention decoder, losses.

Rebuild of the reference model (reference: basecaller.py:156-416) as pure
functions over a parameter pytree, jit/pjit-ready:

- two encoders are always initialized (raw: 1 feature, event: 5 features —
  reference: basecaller.py:175-176) regardless of ``data_type``, matching the
  reference's parameter set;
- joint mode concatenates encoder outputs along *time* (200 raw + 30 event =
  230 memory positions) and masks likewise (reference quirk,
  basecaller.py:395-406);
- the decoder initial state is zeros, not the encoder state
  (reference: basecaller.py:136-139);
- train metrics: masked CE (pad excluded, mean over non-pad) and masked
  accuracy omitting pad/start/end (reference: basecaller.py:245-247);
- val metrics: greedy decode; loss on padded logits, accuracy omitting only
  start/end (NOT pad — reference quirk, basecaller.py:267-279). Since the
  reference's effective width is the batch-max target length, we reproduce
  that via a dynamic column mask on top of our static padding.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ravvent_tpu.config import ModelConfig
from ravvent_tpu.models import attention as attn
from ravvent_tpu.models import decoder as dec
from ravvent_tpu.models.rnn import encoder_apply, init_encoder
from ravvent_tpu.tokenizer import NUC_TOKENIZER
from ravvent_tpu.utils.masking import input_mask, masked_accuracy, masked_ce_loss

Params = Dict[str, Any]

PAD, END, START = NUC_TOKENIZER.pad_id, NUC_TOKENIZER.end_id, NUC_TOKENIZER.start_id


def init_basecaller(key, cfg: ModelConfig) -> Params:
    k_raw, k_event, k_dec = jax.random.split(key, 3)
    return {
        "encoder_raw": init_encoder(
            k_raw, cfg.enc_units, cfg.encoder_depth, 1, cfg.cell_type, cfg.bidirectional
        ),
        "encoder_event": init_encoder(
            k_event, cfg.enc_units, cfg.encoder_depth, 5, cfg.cell_type, cfg.bidirectional
        ),
        "decoder": dec.init_decoder(
            k_dec,
            cfg.vocab_size,
            cfg.decoder_depth,
            cfg.dec_units,
            cfg.enc_out_dim,
            cfg.effective_attention,
            cfg.cell_type,
        ),
    }


def encode_input(
    params: Params, raw: jnp.ndarray, event: jnp.ndarray, cfg: ModelConfig,
    trainable: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (enc_output [B, S, enc_out_dim], input_mask [B, S])
    (reference: basecaller.py:384-416). ``trainable=True`` keeps the encoder
    on the differentiable scan path (see encoder_apply)."""
    if cfg.data_type == "raw":
        mask = input_mask(raw)
        out, _ = encoder_apply(params["encoder_raw"], raw, cfg.cell_type,
                               cfg.bidirectional, trainable)
        return out, mask
    if cfg.data_type == "event":
        mask = input_mask(event)
        out, _ = encoder_apply(params["encoder_event"], event, cfg.cell_type,
                               cfg.bidirectional, trainable)
        return out, mask
    raw_mask = input_mask(raw)
    event_mask = input_mask(event)
    out_raw, _ = encoder_apply(params["encoder_raw"], raw, cfg.cell_type,
                               cfg.bidirectional, trainable)
    out_event, _ = encoder_apply(params["encoder_event"], event, cfg.cell_type,
                                 cfg.bidirectional, trainable)
    out = jnp.concatenate([out_raw, out_event], axis=1)
    mask = jnp.concatenate([raw_mask, event_mask], axis=-1)
    return out, mask


class TrainOutput(NamedTuple):
    loss: jnp.ndarray
    acc: jnp.ndarray
    logits: jnp.ndarray


def train_forward(
    params: Params,
    raw: jnp.ndarray,
    event: jnp.ndarray,
    targets: jnp.ndarray,  # [B, T] token ids
    cfg: ModelConfig,
    sampling_probability: float = 0.0,
    rng: jax.Array | None = None,
    memory_constraint=None,
) -> TrainOutput:
    """Teacher-forced forward pass with loss and train accuracy
    (reference: basecaller.py:225-253). ``memory_constraint``, when given,
    is applied to (enc_out, mask) — e.g. a sharding constraint that
    sequence-shards the attention memory over a 'model' mesh axis
    (parallel.mesh.memory_sharding)."""
    enc_out, mask = encode_input(params, raw, event, cfg, trainable=True)
    if memory_constraint is not None:
        enc_out, mask = memory_constraint(enc_out, mask)
    mem = attn.setup_memory(params["decoder"]["attention"], enc_out, mask)

    dec_input = targets[:, :-1]
    real = targets[:, 1:]

    logits, sample_ids = dec.teacher_forced_decode(
        params["decoder"],
        dec_input,
        mem,
        cfg.vocab_size,
        cfg.effective_attention,
        cfg.cell_type,
        sampling_probability=sampling_probability,
        rng=rng,
    )
    loss = masked_ce_loss(real, logits, PAD)
    acc = masked_accuracy(real, sample_ids, [PAD, START, END])
    return TrainOutput(loss=loss, acc=acc, logits=logits)


def loss_fn(
    params: Params,
    batch: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray],
    cfg: ModelConfig,
    sampling_probability: float = 0.0,
    rng: jax.Array | None = None,
):
    raw, event, targets = batch
    out = train_forward(params, raw, event, targets, cfg, sampling_probability, rng)
    return out.loss, out


def batch_max_target_len(targets: jnp.ndarray, pad_token: int = PAD) -> jnp.ndarray:
    """Dynamic batch-max token width — the width the reference would have
    padded this batch to (data_loader.py:124)."""
    return jnp.max(jnp.sum(targets != pad_token, axis=1))


def val_metrics(
    real: jnp.ndarray,  # [B, T-1] (targets[:, 1:])
    pred_tokens: jnp.ndarray,  # [B, T-1] greedy tokens (zeroed after finish)
    logits: jnp.ndarray,  # [B, T-1, V]
    targets: jnp.ndarray,  # [B, T] original targets (for the width mask)
):
    """Validation loss/accuracy with the reference's semantics
    (basecaller.py:267-279): loss masks pad; accuracy omits start/end only.
    Positions beyond the batch-max width (which would not exist under the
    reference's dynamic padding) are excluded via an extra mask."""
    loss = masked_ce_loss(real, logits, PAD)
    width = batch_max_target_len(targets) - 1
    cols = jnp.arange(real.shape[1])[None, :]
    in_width = cols < width
    acc = masked_accuracy(real, pred_tokens, [START, END], extra_mask=in_width)
    return loss, acc

"""Masking, loss, and accuracy utilities (reference: utils.py:15-32,
basecaller.py:212-220)."""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def input_mask(x: jnp.ndarray, padding_value: float = 0.0) -> jnp.ndarray:
    """True where a timestep is not entirely padding
    (reference: utils.py:26-32). x: [B, T, F] -> [B, T] bool."""
    return jnp.all(x != padding_value, axis=-1)


def masked_ce_loss(real: jnp.ndarray, logits: jnp.ndarray, pad_token: int = 0) -> jnp.ndarray:
    """Sparse categorical cross-entropy from logits, mean over non-pad
    positions (reference: basecaller.py:212-220)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(logp, real[..., None], axis=-1)[..., 0]
    mask = (real != pad_token).astype(ce.dtype)
    return jnp.sum(ce * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def masked_accuracy(
    y_true: jnp.ndarray,
    y_pred: jnp.ndarray,
    omit_vals: Sequence[int],
    extra_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Exact-match rate over positions whose true token is not in
    ``omit_vals`` (reference: utils.py:15-24). ``extra_mask`` (bool, same
    shape) additionally excludes positions — used to reproduce the
    reference's dynamic batch-max target width on top of our static padding.
    """
    match = (y_true == y_pred).astype(jnp.int32)
    mask = jnp.ones_like(y_true, dtype=jnp.int32)
    for ov in omit_vals:
        mask = mask * (y_true != ov).astype(jnp.int32)
    if extra_mask is not None:
        mask = mask * extra_mask.astype(jnp.int32)
    total = jnp.sum(mask)
    count = jnp.sum(mask * match)
    return count / jnp.maximum(total, 1)


def masked_ce_loss_sum(real: jnp.ndarray, logits: jnp.ndarray, pad_token: int = 0) -> jnp.ndarray:
    """Sum-reduction masked CE — the reference's alternative ``MaskedLoss``
    (reference: utils.py:138-160; only used by stale code there, provided for
    completeness)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(logp, real[..., None], axis=-1)[..., 0]
    mask = (real != pad_token).astype(ce.dtype)
    return jnp.sum(ce * mask)

"""Data-parallel inference over a device mesh.

Weights replicated, the snippet axis sharded (SURVEY.md §2.3: snippets are
the embarrassingly-parallel axis; reads are the cross-host unit). Wraps the
BasecallEngine's jitted functions with shardings so one chunk spreads across
all local chips of a mesh.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ravvent_tpu.config import ModelConfig
from ravvent_tpu.decode.beam import beam_decode, beam_scores_to_step_probs
from ravvent_tpu.models import attention as attn
from ravvent_tpu.models.basecaller import encode_input
from ravvent_tpu.parallel.mesh import batch_sharding, replicated_sharding


class ShardedBasecallEngine:
    """Beam-decode chunks sharded across a mesh's ``data`` axis.

    The chunk size must be a multiple of the mesh size; each chip encodes and
    decodes its shard independently (no collectives on the hot path — the
    batch axis is fully parallel)."""

    def __init__(
        self,
        params,
        cfg: ModelConfig,
        mesh,
        chunk_size: int = 1024,
        total_steps: int = 47,
    ) -> None:
        self.cfg = cfg
        self.mesh = mesh
        self.chunk_size = chunk_size
        self.total_steps = total_steps
        n_dev = int(np.prod([mesh.shape[k] for k in mesh.shape]))
        if chunk_size % n_dev:
            raise ValueError(f"chunk_size {chunk_size} not divisible by mesh size {n_dev}")

        rs = replicated_sharding(mesh)
        bs = batch_sharding(mesh)
        self.params = jax.device_put(params, rs)

        def _beam(params, raw, event, max_steps, beam_width):
            enc_out, mask = encode_input(params, raw, event, cfg)
            mem = attn.setup_memory(params["decoder"]["attention"], enc_out, mask)
            res = beam_decode(
                params["decoder"], mem, cfg.vocab_size, beam_width,
                self.total_steps, max_steps, cfg.effective_attention, cfg.cell_type,
            )
            return res.tokens[:, :, 0], beam_scores_to_step_probs(res.scores[:, :, 0])

        self._beam_jit = jax.jit(
            _beam,
            static_argnames=("beam_width",),
            in_shardings=(rs, bs, bs, rs),
            out_shardings=(bs, bs),
        )

        def _beam_compact(params, signal, raw_ranges, events, event_ranges,
                          max_steps, beam_width):
            # Compact form on a mesh: the per-read signal/event arrays are
            # small and replicated; the per-snippet index ranges are sharded,
            # so each chip gathers and decodes only its shard's snippet
            # windows (the gather is local — no collectives).
            S = signal.shape[0]
            E = events.shape[0]
            r_pos = raw_ranges[:, 0:1] + jnp.arange(200)[None, :]
            r_valid = (
                jnp.arange(200)[None, :]
                < (raw_ranges[:, 1] - raw_ranges[:, 0])[:, None]
            )
            raw = jnp.where(
                r_valid, signal[jnp.clip(r_pos, 0, S - 1)], 0.0
            )[..., None]
            e_pos = event_ranges[:, 0:1] + jnp.arange(30)[None, :]
            e_valid = (
                jnp.arange(30)[None, :]
                < (event_ranges[:, 1] - event_ranges[:, 0])[:, None]
            )
            event = jnp.where(
                e_valid[..., None], events[jnp.clip(e_pos, 0, E - 1)], 0.0
            )
            return _beam(params, raw, event, max_steps, beam_width)

        self._beam_compact_jit = jax.jit(
            _beam_compact,
            static_argnames=("beam_width",),
            in_shardings=(rs, rs, bs, rs, bs, rs),
            out_shardings=(bs, bs),
        )

    def predict_beam_compact(
        self,
        signal: np.ndarray,
        raw_ranges: np.ndarray,
        events: np.ndarray,
        event_ranges: np.ndarray,
        max_output_len: int,
        beam_width: int = 5,
        aux: Optional[dict] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Compact-representation decode sharded over the mesh (same
        semantics as BasecallEngine.predict_beam_compact, f32 wire; ``aux``
        is accepted for evaluator interchangeability and unused — the
        sharded path ships full-precision features)."""
        N = raw_ranges.shape[0]
        if N == 0:
            return (np.zeros((0, self.total_steps), np.int64),
                    np.zeros((0, self.total_steps), np.float32))
        raw_ranges = np.minimum(raw_ranges, signal.shape[0]).astype(np.int64)
        event_ranges = np.minimum(event_ranges, events.shape[0]).astype(np.int64)
        sig_d = jnp.asarray(signal, jnp.float32)
        ev_d = jnp.asarray(events, jnp.float32)
        pending = []
        for s in range(0, N, self.chunk_size):
            rr = raw_ranges[s : s + self.chunk_size]
            er = event_ranges[s : s + self.chunk_size]
            n = rr.shape[0]
            if n < self.chunk_size:
                pad = np.zeros((self.chunk_size - n, 2), np.int64)
                rr = np.concatenate([rr, pad])
                er = np.concatenate([er, pad])
            toks, probs = self._beam_compact_jit(
                self.params, sig_d, jnp.asarray(rr), ev_d, jnp.asarray(er),
                jnp.int32(max_output_len - 1), beam_width,
            )
            pending.append((toks, probs, n))
        return (
            np.concatenate([np.asarray(t[:n]) for t, _, n in pending]),
            np.concatenate([np.asarray(p[:n]) for _, p, n in pending]),
        )

    def predict_beam(
        self, raw: np.ndarray, event: np.ndarray, max_output_len: int, beam_width: int = 5
    ) -> Tuple[np.ndarray, np.ndarray]:
        pending = []
        for s in range(0, raw.shape[0], self.chunk_size):
            rc = raw[s : s + self.chunk_size]
            n = rc.shape[0]
            if n < self.chunk_size:
                rc = np.concatenate(
                    [rc, np.zeros((self.chunk_size - n,) + rc.shape[1:], rc.dtype)]
                )
            ec = event[s : s + self.chunk_size]
            if ec.shape[0] < self.chunk_size:
                ec = np.concatenate(
                    [ec, np.zeros((self.chunk_size - ec.shape[0],) + ec.shape[1:], ec.dtype)]
                )
            toks, probs = self._beam_jit(
                self.params, jnp.asarray(rc), jnp.asarray(ec),
                jnp.int32(max_output_len - 1), beam_width,
            )
            pending.append((toks, probs, n))
        return (
            np.concatenate([np.asarray(t[:n]) for t, _, n in pending]),
            np.concatenate([np.asarray(p[:n]) for _, p, n in pending]),
        )

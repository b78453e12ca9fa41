"""Production inference engine: snippets in, per-snippet basecalls out.

This is the device-side half of the reference evaluators' ``run`` flow
(reference: ravvent_mapping_evaluator.py:31-57): chunked beam (or greedy)
prediction over a read's snippets. TPU-first design decisions:

- the decode functions are jit-compiled once for a fixed chunk shape; the
  last partial chunk is padded up to the chunk size instead of triggering a
  recompile (the reference re-traces tfa decoders per call);
- the dynamic decode-length bound (the reference derives it from the
  ground-truth target width — quirk #4, ravvent_mapping_evaluator.py:49) is a
  traced scalar argument, not a shape;
- beam score -> per-step probability conversion happens on device.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ravvent_tpu.config import ModelConfig, MAX_TARGET_LEN
from ravvent_tpu.decode.beam import beam_decode, beam_scores_to_step_probs
from ravvent_tpu.decode.greedy import greedy_decode
from ravvent_tpu.models import attention as attn
from ravvent_tpu.models.basecaller import encode_input
from ravvent_tpu.tokenizer import NUC_TOKENIZER


class BasecallEngine:
    def __init__(
        self,
        params,
        cfg: ModelConfig,
        chunk_size: int = 1024,
        total_steps: int = MAX_TARGET_LEN - 1,
    ) -> None:
        self.params = params
        self.cfg = cfg
        self.chunk_size = chunk_size
        self.total_steps = total_steps
        mcfg = cfg

        def _beam(params, raw, event, max_steps, beam_width):
            enc_out, mask = encode_input(params, raw, event, mcfg)
            mem = attn.setup_memory(params["decoder"]["attention"], enc_out, mask)
            res = beam_decode(
                params["decoder"], mem, mcfg.vocab_size, beam_width,
                self.total_steps, max_steps, mcfg.effective_attention, mcfg.cell_type,
            )
            top_tokens = res.tokens[:, :, 0]
            top_scores = res.scores[:, :, 0]
            probs = beam_scores_to_step_probs(top_scores)
            return top_tokens, probs

        def _greedy(params, raw, event, max_steps):
            enc_out, mask = encode_input(params, raw, event, mcfg)
            mem = attn.setup_memory(params["decoder"]["attention"], enc_out, mask)
            tokens, logits = greedy_decode(
                params["decoder"], mem, mcfg.vocab_size, self.total_steps,
                max_steps, mcfg.effective_attention, mcfg.cell_type,
            )
            return tokens, logits

        self._beam_jit = jax.jit(_beam, static_argnames=("beam_width",))
        self._greedy_jit = jax.jit(_greedy)

    # ------------------------------------------------------------------
    def _pad_chunk(self, arr: np.ndarray) -> Tuple[np.ndarray, int]:
        n = arr.shape[0]
        if n == self.chunk_size:
            return arr, n
        pad = np.zeros((self.chunk_size - n,) + arr.shape[1:], dtype=arr.dtype)
        return np.concatenate([arr, pad], axis=0), n

    def predict_beam(
        self,
        raw: np.ndarray,
        event: np.ndarray,
        max_output_len: int,
        beam_width: int = 5,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Beam decode a snippet array of any length; returns
        (tokens [N, T], step_probs [N, T]) for the top beam."""
        toks_out, probs_out = [], []
        for s in range(0, raw.shape[0], self.chunk_size):
            rc, n = self._pad_chunk(raw[s : s + self.chunk_size])
            ec, _ = self._pad_chunk(event[s : s + self.chunk_size])
            toks, probs = self._beam_jit(
                self.params, jnp.asarray(rc), jnp.asarray(ec),
                jnp.int32(max_output_len - 1), beam_width,
            )
            toks_out.append(np.asarray(toks[:n]))
            probs_out.append(np.asarray(probs[:n]))
        return np.concatenate(toks_out), np.concatenate(probs_out)

    def predict_greedy(
        self, raw: np.ndarray, event: np.ndarray, max_output_len: int
    ) -> Tuple[np.ndarray, np.ndarray]:
        toks_out, logits_out = [], []
        for s in range(0, raw.shape[0], self.chunk_size):
            rc, n = self._pad_chunk(raw[s : s + self.chunk_size])
            ec, _ = self._pad_chunk(event[s : s + self.chunk_size])
            toks, logits = self._greedy_jit(
                self.params, jnp.asarray(rc), jnp.asarray(ec),
                jnp.int32(max_output_len - 1),
            )
            toks_out.append(np.asarray(toks[:n]))
            logits_out.append(np.asarray(logits[:n]))
        return np.concatenate(toks_out), np.concatenate(logits_out)

    @staticmethod
    def tokens_to_sequences(tokens: np.ndarray) -> List[str]:
        return NUC_TOKENIZER.sequences_to_texts(tokens)

"""Character tokenizer for nucleotide sequences.

Reproduces the reference's fixed keras Tokenizer vocabulary
(data_loader.py:20-26): ``{'':0, '^':1, '$':2, 'a':3, 'c':4, 'g':5, 't':6}``
with ``$`` = start, ``^`` = end, ``''`` = pad, and the reference's
token->string conversion (basecaller.py:289-294): join, strip start/end/pad,
uppercase.
"""

from __future__ import annotations

from typing import Iterable, List, Sequence

import numpy as np


class NucTokenizer:
    WORD_INDEX = {"": 0, "^": 1, "$": 2, "a": 3, "c": 4, "g": 5, "t": 6}

    def __init__(self) -> None:
        self.word_index = dict(self.WORD_INDEX)
        self.index_word = {v: k for k, v in self.word_index.items()}
        self.pad_id = self.word_index[""]
        self.end_id = self.word_index["^"]
        self.start_id = self.word_index["$"]
        # Fast lookup table over ASCII codes (lowercased input).
        self._lut = np.zeros(128, dtype=np.int64)
        for ch, idx in self.word_index.items():
            if ch:
                self._lut[ord(ch)] = idx

    @property
    def vocab_size(self) -> int:
        return len(self.word_index)

    def texts_to_sequences(self, texts: Iterable[str]) -> List[np.ndarray]:
        """Char-level tokenization, lowercasing like the reference tokenizer."""
        out = []
        for t in texts:
            codes = np.frombuffer(t.lower().encode("ascii"), dtype=np.uint8)
            out.append(self._lut[codes])
        return out

    def pad_sequences(
        self, seqs: Sequence[np.ndarray], maxlen: int | None = None
    ) -> np.ndarray:
        """Post-pad with the pad token (reference: data_loader.py:124).

        ``maxlen=None`` pads to the batch max (reference behavior); a fixed
        ``maxlen`` gives the static shapes the TPU path needs (post-truncating,
        matching keras ``pad_sequences(..., truncating='post')``).
        """
        if maxlen is None:
            maxlen = max((len(s) for s in seqs), default=0)
        out = np.full((len(seqs), maxlen), self.pad_id, dtype=np.int64)
        for i, s in enumerate(seqs):
            n = min(len(s), maxlen)
            out[i, :n] = s[:n]
        return out

    def sequences_to_texts(self, tokens: np.ndarray) -> List[str]:
        """Token rows -> uppercase base strings, start/end/pad stripped
        (reference: basecaller.py:289-294). Vectorized: tokens map to ASCII
        through a lookup table and non-base tokens compress out per row in C
        (the per-token Python loop costs ~40ms/read at production sizes)."""
        tokens = np.asarray(tokens)
        lut = np.zeros(256, dtype=np.uint8)
        for b in "acgt":
            lut[self.word_index[b]] = ord(b.upper())
        ascii_rows = lut[tokens.astype(np.uint8)]
        return [bytes(row[row != 0]).decode("ascii") for row in ascii_rows]


NUC_TOKENIZER = NucTokenizer()

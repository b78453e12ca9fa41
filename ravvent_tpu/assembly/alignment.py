"""Pairwise sequence alignment.

From-scratch replacement for the Biopython ``pairwise2`` C extension the
reference merger depends on (reference: merger.py:167-180). Two entry points:

- :func:`local_align` — Smith-Waterman-Gotoh local alignment with affine gaps
  using pairwise2 conventions: a gap of length L costs
  ``open + (L-1) * extend``; the result contains the *full* input sequences
  with gap padding (unaligned flanks of seq1 laid out before those of seq2),
  so downstream position-wise merging keeps every input character — the
  property the reference's overlap splice relies on
  (merger.py:204-244).
- :func:`banded_global_identity` — banded Needleman-Wunsch used as the
  built-in fallback for minimap2-style mapping identity when minimap2 is not
  installed (see ravvent_tpu.evaluation.mapping). Prefers the native C++
  implementation (ravvent_tpu.ops.native) and falls back to numpy.

Substitution-matrix scoring (reference merger score set 2,
merger.py:138-146) is supported via ``matrix=``.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import numpy as np

NEG = -1e30


class AlignmentResult(NamedTuple):
    seq1_gapped: str
    seq2_gapped: str
    score: float
    begin: int
    end: int


def _score_matrix_fn(seq1, seq2, match, mismatch, matrix):
    a = np.frombuffer(seq1.encode(), dtype=np.uint8)
    b = np.frombuffer(seq2.encode(), dtype=np.uint8)
    if matrix is None:
        return np.where(a[:, None] == b[None, :], match, mismatch).astype(np.float64)
    S = np.zeros((len(a), len(b)))
    for i, ca in enumerate(seq1):
        for j, cb in enumerate(seq2):
            S[i, j] = matrix[(ca, cb)]
    return S


def local_align(
    seq1: str,
    seq2: str,
    match: float = 1.0,
    mismatch: float = -1.0,
    gap_open: float = -1.0,
    gap_extend: float = -0.2,
    matrix: Optional[Dict[Tuple[str, str], float]] = None,
) -> Optional[AlignmentResult]:
    """Best local alignment, or None if no positive-scoring alignment exists
    (the reference treats an empty alignment list as "no alignment",
    merger.py:181-197)."""
    n, m = len(seq1), len(seq2)
    if n == 0 or m == 0:
        return None
    S = _score_matrix_fn(seq1, seq2, match, mismatch, matrix)

    H = np.zeros((n + 1, m + 1))
    E = np.full((n + 1, m + 1), NEG)  # gap in seq1 (moving along seq2)
    F = np.full((n + 1, m + 1), NEG)  # gap in seq2 (moving along seq1)
    # traceback: 0 stop, 1 diag, 2 up (gap in seq2), 3 left (gap in seq1)
    TB = np.zeros((n + 1, m + 1), dtype=np.int8)
    TE = np.zeros((n + 1, m + 1), dtype=np.int8)  # E came from H (0) or E (1)
    TF = np.zeros((n + 1, m + 1), dtype=np.int8)

    for i in range(1, n + 1):
        # E: horizontal (consume seq2 char, gap in seq1)
        e_open = H[i, :-1] + gap_open
        e_ext = E[i, :-1] + gap_extend
        # E needs a row-wise scan; do it with a loop over columns fused below.
        hf_prev_row = H[i - 1]
        f_open = hf_prev_row + gap_open
        f_ext = F[i - 1] + gap_extend
        F[i] = np.maximum(f_open, f_ext)
        TF[i] = (f_ext > f_open).astype(np.int8)
        e = NEG
        row_h = H[i]
        row_e = E[i]
        diag = H[i - 1, :-1] + S[i - 1]
        for j in range(1, m + 1):
            e_o = H[i, j - 1] + gap_open
            e_x = e + gap_extend
            if e_x > e_o:
                e = e_x
                TE[i, j] = 1
            else:
                e = e_o
                TE[i, j] = 0
            row_e[j] = e
            best = 0.0
            tb = 0
            d = diag[j - 1]
            if d > best:
                best, tb = d, 1
            if F[i, j] > best:
                best, tb = F[i, j], 2
            if e > best:
                best, tb = e, 3
            row_h[j] = best
            TB[i, j] = tb

    # best cell
    flat = np.argmax(H)
    bi, bj = divmod(flat, m + 1)
    if H[bi, bj] <= 0:
        return None
    score = float(H[bi, bj])

    # traceback (preferring the recorded move)
    i, j = int(bi), int(bj)
    core1, core2 = [], []
    state = "H"
    while i > 0 or j > 0:
        if state == "H":
            tb = TB[i, j]
            if tb == 0:
                break
            if tb == 1:
                core1.append(seq1[i - 1])
                core2.append(seq2[j - 1])
                i -= 1
                j -= 1
            elif tb == 2:
                state = "F"
            else:
                state = "E"
        elif state == "F":
            core1.append(seq1[i - 1])
            core2.append("-")
            came_ext = TF[i, j]
            i -= 1
            state = "F" if came_ext else "H"
        else:  # E
            core1.append("-")
            core2.append(seq2[j - 1])
            came_ext = TE[i, j]
            j -= 1
            state = "E" if came_ext else "H"

    start1, start2 = i, j
    core1.reverse()
    core2.reverse()

    # pairwise2-style full-length layout: left flanks (seq1's then seq2's),
    # aligned core, right flanks (seq1's then seq2's).
    left1, left2 = seq1[:start1], seq2[:start2]
    right1, right2 = seq1[bi:], seq2[bj:]
    a1 = left1 + "-" * len(left2) + "".join(core1) + right1 + "-" * len(right2)
    a2 = "-" * len(left1) + left2 + "".join(core2) + "-" * len(right1) + right2
    begin = len(left1) + len(left2)
    end = begin + len(core1)
    return AlignmentResult(a1, a2, score, begin, end)


def banded_global_identity(
    query: str,
    ref: str,
    match: float = 1.0,
    mismatch: float = -1.0,
    gap_open: float = -2.0,
    gap_extend: float = -0.5,
    band: Optional[int] = None,
) -> Tuple[int, int, float]:
    """Banded global alignment of ``query`` vs ``ref``; returns
    (matches, block_len, score) where block_len counts alignment columns —
    the minimap2 PAF (matches, block length) analogue used for identity.

    Tries the native C++ kernel first (ravvent_tpu.ops.native); falls back to
    a numpy implementation.
    """
    try:
        from ravvent_tpu.ops import native

        if native.available():
            return native.banded_global_identity(
                query, ref, match, mismatch, gap_open, gap_extend, band
            )
    except Exception:
        pass
    return _banded_global_identity_np(query, ref, match, mismatch, gap_open, gap_extend, band)


def _banded_global_identity_np(query, ref, match, mismatch, gap_open, gap_extend, band):
    n, m = len(query), len(ref)
    if n == 0 or m == 0:
        return 0, max(n, m), 0.0
    if band is None:
        band = max(64, abs(n - m) + 64)
    q = np.frombuffer(query.encode(), dtype=np.uint8)
    r = np.frombuffer(ref.encode(), dtype=np.uint8)

    # rows: query, cols: ref, band around the diagonal j ~ i * m/n
    width = 2 * band + 1
    H = np.full((n + 1, width), NEG)
    # matches/columns carried along with the score (greedy traceback-free
    # identity accounting)
    MA = np.zeros((n + 1, width), dtype=np.int32)
    CO = np.zeros((n + 1, width), dtype=np.int32)

    def center(i):
        return int(round(i * m / n))

    # init row 0: leading gap in query
    c0 = center(0)
    for k in range(width):
        j = c0 - band + k
        if 0 <= j <= m:
            H[0, k] = (gap_open + (j - 1) * gap_extend) if j > 0 else 0.0
            CO[0, k] = j
    for i in range(1, n + 1):
        ci, cp = center(i), center(i - 1)
        shift = ci - cp
        js = ci - band + np.arange(width)
        valid = (js >= 0) & (js <= m)
        # previous row arrays re-indexed for this row's centering
        def prev(k_off):
            idx = np.arange(width) + shift + k_off
            ok = (idx >= 0) & (idx < width)
            out_h = np.full(width, NEG)
            out_ma = np.zeros(width, dtype=np.int32)
            out_co = np.zeros(width, dtype=np.int32)
            out_h[ok] = H[i - 1, idx[ok]]
            out_ma[ok] = MA[i - 1, idx[ok]]
            out_co[ok] = CO[i - 1, idx[ok]]
            return out_h, out_ma, out_co

        dh, dma, dco = prev(-1)  # diagonal (i-1, j-1)
        uh, uma, uco = prev(0)  # up (i-1, j): gap in ref (consume query)
        is_match = np.zeros(width, dtype=bool)
        jm1 = js - 1
        okj = (jm1 >= 0) & (jm1 < m)
        is_match[okj] = r[jm1[okj]] == q[i - 1]
        sub = np.where(is_match, match, mismatch)
        cand_d = dh + sub
        cand_u = uh + gap_open  # (approximate affine: open per gap char run start not tracked)
        new_h = np.full(width, NEG)
        new_ma = np.zeros(width, dtype=np.int32)
        new_co = np.zeros(width, dtype=np.int32)
        # diagonal vs up
        take_d = cand_d >= cand_u
        new_h = np.where(take_d, cand_d, cand_u)
        new_ma = np.where(take_d, dma + is_match.astype(np.int32), uma)
        new_co = np.where(take_d, dco + 1, uco + 1)
        # left (i, j-1): gap in query — sequential within row
        for k in range(width):
            if not valid[k]:
                new_h[k] = NEG
                continue
            if k > 0 and new_h[k - 1] + gap_open > new_h[k]:
                new_h[k] = new_h[k - 1] + gap_open
                new_ma[k] = new_ma[k - 1]
                new_co[k] = new_co[k - 1] + 1
        H[i], MA[i], CO[i] = new_h, new_ma, new_co

    # final cell: j = m
    kf = m - center(n) + band
    if not (0 <= kf < width) or H[n, kf] <= NEG / 2:
        return 0, 0, 0.0
    return int(MA[n, kf]), int(CO[n, kf]), float(H[n, kf])

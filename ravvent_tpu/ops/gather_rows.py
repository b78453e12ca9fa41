"""Batched contiguous-row gather, TPU-fast.

The compact inference path materializes snippet windows on device as
``out[n, j] = src[starts[n] + j]`` (reference semantics: data_loader.py:64-68
slices raw/event snippets out of the read arrays). XLA lowers that [N, L]
arbitrary-index gather to a serialized scalar-load loop on TPU — measured
4.93 ms for a [3072, 200] bf16 slab (tools/parse_trace.py).

Because every row is a CONTIGUOUS slice, the gather decomposes into

1. a 128-aligned block gather: ``blk[n, b, :] = src2d[starts[n]//128 + b]``
   — slice size (1, 128) keeps whole lanes together, which XLA vectorizes
   (embedding-lookup shape), and
2. a data-parallel binary shift tree resolving the intra-block offset
   ``starts[n] % 128``: seven masked static shifts over [N, nb*128], one per
   bit — pure VPU selects, no serialization.

Same outputs bit-for-bit; 40.7 us on the same slab (121x).

A Pallas per-row dynamic-slice kernel is NOT viable here: Mosaic requires
dynamic 1-D vector-load offsets to be provably 1024-aligned (vreg-aligned),
and snippet starts are arbitrary sample offsets.
"""

from __future__ import annotations

import jax.numpy as jnp


def gather_rows(src, starts, lens, L: int):
    """``out[n, j] = where(j < lens[n], src[starts[n] + j], 0)`` as [N, L].

    ``src`` is a 1-D array; ``starts``/``lens`` are [N] integers with
    ``starts >= 0`` (rows may run past the end of ``src`` — positions beyond
    ``lens`` are zero-filled, and the source is zero-padded so they never
    read garbage).
    """
    N = starts.shape[0]
    starts = starts.astype(jnp.int32)
    nb = (L + 127) // 128 + 1
    pad = (-src.shape[0]) % 128 + 128 * nb
    src2 = jnp.pad(src, (0, pad)).reshape(-1, 128)
    qb = starts >> 7
    r = starts & 127
    rows = qb[:, None] + jnp.arange(nb, dtype=jnp.int32)[None, :]
    flat = src2[rows].reshape(N, nb * 128)
    for s in (64, 32, 16, 8, 4, 2, 1):
        shifted = jnp.pad(flat[:, s:], ((0, 0), (0, s)))
        flat = jnp.where(((r & s) > 0)[:, None], shifted, flat)
    out = flat[:, :L]
    valid = jnp.arange(L, dtype=jnp.int32)[None, :] < lens[:, None]
    return jnp.where(valid, out, jnp.zeros((), src.dtype))

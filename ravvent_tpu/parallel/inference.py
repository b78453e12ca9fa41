"""Data-parallel inference over a device mesh.

Weights replicated, the snippet axis sharded (SURVEY.md §2.3: snippets are
the embarrassingly-parallel axis; reads are the cross-host unit). Since
round 2 the sharded engine IS the flagship fast path: ``BasecallEngine``
takes a ``mesh`` and runs its full compact pipeline — wire formats
(f16/i8/i8sig/i8dev), on-device snippet construction via ``gather_rows``,
fused Pallas beam kernels, packed u8 result fetch, and dispatch/collect
pipelining — with the snippet rows ``shard_map``-ed over the mesh's 'data'
axis. Each chip executes the identical single-device program on its row
shard; no collectives sit on the hot path.

``ShardedBasecallEngine`` is the mesh-first constructor of that engine,
kept as the parallel-layer entry point (and for API continuity).
"""

from __future__ import annotations

from ravvent_tpu.config import ModelConfig
from ravvent_tpu.evaluation.basecall import BasecallEngine


class ShardedBasecallEngine(BasecallEngine):
    """``BasecallEngine`` over a device mesh (see module docstring).

    Every slab size in the dispatch ladder (512 and multiples of 1024) must
    divide by the mesh's 'data'-axis size; chips beyond that cannot help a
    single read's slab anyway (shard reads across hosts instead —
    ravvent_tpu.parallel.distributed)."""

    def __init__(
        self,
        params,
        cfg: ModelConfig,
        mesh,
        chunk_size: int = 1024,
        total_steps: int = 47,
        **engine_kwargs,
    ) -> None:
        super().__init__(
            params, cfg, chunk_size=chunk_size, total_steps=total_steps,
            mesh=mesh, **engine_kwargs,
        )

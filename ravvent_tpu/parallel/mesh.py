"""Device mesh and sharding helpers.

The reference has no parallelism at all (SURVEY.md §2.3) — this layer is
green-field, designed from the workload shape: the model is tiny (128-unit
RNNs, vocab 7) but throughput-critical, so the strategy is pure data
parallelism over a 1-D ``('data',)`` mesh: parameters replicated, the snippet
batch axis sharded. Under ``jit`` with these shardings XLA inserts the
gradient ``psum`` over ICI automatically.

Multi-host: ``jax.distributed.initialize`` + per-host read ownership (each
host feeds its local shard of the global batch); see
``ravvent_tpu.parallel.distributed``.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    devices: Optional[Sequence] = None,
    model_shards: int = 1,
) -> Mesh:
    """1-D ``('data',)`` mesh, or — with ``model_shards > 1`` — a 2-D
    ``('data', 'model')`` mesh whose 'model' axis sequence-shards the
    attention memory (see ``memory_sharding``). TP/PP/EP do not apply to
    this workload (128-unit RNN, no experts, depth<=2 decoder — SURVEY.md
    §2.3); the model's long axis is the attention memory (<=230 positions)
    and the snippet batch, which these two axes cover."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    devices = np.array(devices)
    if model_shards > 1:
        assert devices.size % model_shards == 0, (
            f"{devices.size} devices not divisible by model_shards={model_shards}")
        return Mesh(devices.reshape(-1, model_shards), ("data", "model"))
    return Mesh(devices, ("data",))


def memory_sharding(mesh: Mesh) -> Optional[NamedSharding]:
    """Sharding for the attention memory [B, S, U] (and its mask [B, S]):
    batch over 'data', the S (time/memory-position) axis over 'model' —
    sequence-parallel attention. Per decode step GSPMD turns the masked
    softmax and context reductions over S into psums across 'model'.
    Returns None when the mesh has no model axis (pure DP)."""
    if "model" in mesh.axis_names and mesh.shape["model"] > 1:
        return NamedSharding(mesh, P("data", "model"))
    return None


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch/snippet) axis across the data mesh axis."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Device-put every leaf of a batch pytree with its leading axis sharded."""
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    s = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)

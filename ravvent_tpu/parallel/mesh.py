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


def make_mesh(n_devices: Optional[int] = None, devices: Optional[Sequence] = None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.array(devices), ("data",))


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

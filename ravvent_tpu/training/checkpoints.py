"""Checkpointing via Orbax.

The reference saves weights-only keras checkpoints, one directory per epoch,
named by the run-name schema, with no optimizer or data-pipeline state
(reference: ravvent.py:61-70); resume is ``load_weights`` of a named epoch
(test_training_memory_time.py:51-53). Here a checkpoint carries the full
training state — params, optimizer state, epoch, PRNG key, and the data
generator's seed — so resume is exact, while the directory layout still
follows the reference schema via ``RunConfig.checkpoint_path``.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, base_dir: str) -> None:
        self.base_dir = Path(base_dir)
        self._ckpt = ocp.StandardCheckpointer()

    def save(
        self,
        path: str,
        params: Any,
        opt_state: Any = None,
        epoch: int = 0,
        rng: Optional[jax.Array] = None,
        data_seed: int = 0,
        force: bool = True,
    ) -> str:
        full = (self.base_dir / path).resolve()
        state: Dict[str, Any] = {
            "params": params,
            "epoch": np.asarray(epoch, dtype=np.int64),
            "data_seed": np.asarray(data_seed, dtype=np.int64),
        }
        if opt_state is not None:
            state["opt_state"] = opt_state
        if rng is not None:
            state["rng"] = rng
        self._ckpt.save(full, state, force=force)
        self._ckpt.wait_until_finished()
        return str(full)

    def restore(self, path: str, template: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
        """Restore a checkpoint; a ``template`` covering only part of the
        saved state (e.g. just ``params`` for inference) is allowed."""
        full = (self.base_dir / path).resolve()
        if template is None:
            return self._ckpt.restore(full)
        try:
            return self._ckpt.restore(full, template)
        except ValueError:
            # Template covers only part of the saved tree (e.g. params-only
            # for inference) or the checkpoint was written on a different
            # device type: restore everything as host numpy arrays.
            return self.restore_numpy(path)

    def restore_numpy(self, path: str) -> Dict[str, Any]:
        """Restore a full checkpoint as host numpy arrays — portable across
        device types (a TPU-written checkpoint loads on CPU and vice versa)."""
        full = (self.base_dir / path).resolve()
        ckptr = ocp.PyTreeCheckpointer()
        tree = ckptr.metadata(full).item_metadata.tree
        restore_args = jax.tree_util.tree_map(
            lambda _m: ocp.RestoreArgs(restore_type=np.ndarray), tree,
            is_leaf=lambda x: hasattr(x, "shape") or x is None,
        )
        return ckptr.restore(full, restore_args=restore_args)

    def latest_epoch(self, run_dir: str, prefix: str) -> Optional[int]:
        """Find the newest epoch checkpoint matching the reference naming
        convention ``<prefix>.<epoch:02d>``."""
        d = self.base_dir / run_dir
        if not d.exists():
            return None
        epochs = []
        for p in d.iterdir():
            name = p.name
            if name.startswith(prefix + ".") and name[len(prefix) + 1 :].isdigit():
                epochs.append(int(name[len(prefix) + 1 :]))
        return max(epochs) if epochs else None


def rename_model_epochs(models_dir: str, offset: int, dry_run: bool = False) -> list:
    """Renumber epoch-suffixed checkpoint directories when chaining runs
    (reference: rename_models.py:5-20)."""
    d = Path(models_dir)
    renames = []
    entries = sorted(d.iterdir(), reverse=offset > 0)
    for p in entries:
        if not p.is_dir():
            continue
        stem, _, ep = p.name.rpartition(".")
        if not ep.isdigit():
            continue
        new = d / f"{stem}.{int(ep) + offset:02d}"
        renames.append((str(p), str(new)))
        if not dry_run:
            os.rename(p, new)
    return renames

"""Named-axis shape assertions (reference: shape_checker.py:3-41).

The reference's eager-only ``ShapeChecker`` caches a dimension per axis name
and raises on mismatch. This version works on numpy arrays and on traced JAX
values (static shapes are known at trace time), so it is usable inside jitted
functions as a debugging aid.
"""

from __future__ import annotations

from typing import Dict


class ShapeChecker:
    def __init__(self) -> None:
        self.shapes: Dict[str, int] = {}

    def __call__(self, tensor, names, broadcast: bool = False) -> None:
        if isinstance(names, str):
            names = names.split()
        shape = tuple(tensor.shape)
        if len(shape) != len(names):
            raise ValueError(
                f"rank mismatch: shape {shape} vs axis names {tuple(names)}"
            )
        for name, dim in zip(names, shape):
            if broadcast and dim == 1:
                continue
            old = self.shapes.get(name)
            if old is None:
                self.shapes[name] = int(dim)
            elif old != dim:
                raise ValueError(
                    f"axis '{name}' was {old}, got {dim} (shape {shape})"
                )

"""Checkpoint / resume (new capability - the reference has none; SURVEY.md
section 5.4 flags this as a cheap win).

Whole-``SimulationState`` snapshots as compressed ``.npz``: every particle
field, the neighbor structure and the loop counters, so a resumed run
continues bit-for-bit from the saved step (modulo the interval-local
displacement accumulator, which resets at interval start by design - the same
reset the reference performs every ``SimulationLoop`` call).
"""

from __future__ import annotations

import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..state import SimulationState


def save_checkpoint(path: str, state: SimulationState, counter: int):
    leaves, treedef = jax.tree.flatten(state)
    arrays = {f"leaf_{i}": np.asarray(v) for i, v in enumerate(leaves)}
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(path, counter=np.asarray(counter), **arrays)


def load_checkpoint(path: str, template: SimulationState) -> Tuple[SimulationState, int]:
    """Restore into the structure of ``template`` (shapes/dtypes must match the
    run that wrote the checkpoint)."""
    data = np.load(path)
    leaves, treedef = jax.tree.flatten(template)
    restored = []
    for i, leaf in enumerate(leaves):
        arr = data[f"leaf_{i}"]
        if arr.shape != leaf.shape:
            raise ValueError(
                f"checkpoint leaf {i} shape {arr.shape} != template {leaf.shape}"
            )
        restored.append(jnp.asarray(arr, dtype=leaf.dtype))
    return jax.tree.unflatten(treedef, restored), int(data["counter"])

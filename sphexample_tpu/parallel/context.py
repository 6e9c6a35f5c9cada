"""Communication context: the single abstraction that makes the step function
run identically on one chip and under ``shard_map`` over a device mesh.

Multi-chip design (SURVEY.md sections 5.7/5.8): the particle axis is sharded
in *global cell-sorted order* - each device owns an equal contiguous slab of
sorted particle slots.  Neighbor access all-gathers the five sweep fields over
ICI (XLA collectives); reductions for the adaptive dt and the rebuild trigger
ride ``pmin``/``pmax``.  The cell-list sort is computed replicated from the
gathered keys, so every device derives the identical global permutation and
re-gathers its slab - no scatter communication at all.

This is the SPH analog of sequence parallelism: compute and state scale with
devices, neighbor reads are a tiled all-gather.  (A 1-hop halo exchange - the
reference's "neighbors live one cell away" property - is the planned
bandwidth optimization; the collective pattern here is already correct and
ICI-friendly.)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax


@dataclass(frozen=True)
class CommContext:
    """``axis=None`` means single-chip (all methods are identity/local)."""

    axis: Optional[str] = None
    num_devices: int = 1

    @property
    def is_sharded(self) -> bool:
        return self.axis is not None

    def gather(self, x):
        """Concatenate device slabs along axis 0 (tiled all-gather)."""
        if self.axis is None:
            return x
        return jax.lax.all_gather(x, self.axis, axis=0, tiled=True)

    def pmax(self, x):
        return x if self.axis is None else jax.lax.pmax(x, self.axis)

    def pmin(self, x):
        return x if self.axis is None else jax.lax.pmin(x, self.axis)

    def psum(self, x):
        return x if self.axis is None else jax.lax.psum(x, self.axis)

    def rank(self):
        return 0 if self.axis is None else jax.lax.axis_index(self.axis)


SINGLE = CommContext()

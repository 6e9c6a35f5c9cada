"""Prescribed rigid-body motion for Moving particles.

Reference: ``ProgressMotion`` (``src/SPHCellList.jl:575-596``) - applied twice
per step, once per half step (call sites SPHCellList.jl:765,787).  The
reference's per-GroupMarker ``MotionDefinition`` table (SPHCellList.jl:855-864)
becomes a small dense device table indexed by group marker.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..config import Geometry, ParticleType


@dataclass(frozen=True)
class MotionTable:
    """Static per-group-marker motion parameters (row 0 unused; markers are
    1-based like the reference)."""

    velocity: Tuple[float, ...]
    start_time: Tuple[float, ...]
    duration: Tuple[float, ...]
    direction: Tuple[Tuple[float, ...], ...]
    defined: Tuple[bool, ...]

    @property
    def any_motion(self) -> bool:
        return any(self.defined)


def build_motion_table(geometries: Sequence[Geometry], dims: int) -> MotionTable:
    gmax = max((g.group_marker for g in geometries), default=0)
    vel = [0.0] * (gmax + 1)
    start = [0.0] * (gmax + 1)
    dur = [0.0] * (gmax + 1)
    direction = [tuple([0.0] * dims) for _ in range(gmax + 1)]
    defined = [False] * (gmax + 1)
    for g in geometries:
        if g.motion is not None:
            m = g.motion
            vel[g.group_marker] = float(m.velocity)
            start[g.group_marker] = float(m.start_time)
            dur[g.group_marker] = float(m.duration)
            direction[g.group_marker] = tuple(float(v) for v in m.direction)
            defined[g.group_marker] = True
    return MotionTable(
        velocity=tuple(vel),
        start_time=tuple(start),
        duration=tuple(dur),
        direction=tuple(direction),
        defined=tuple(defined),
    )


def progress_motion(motion: MotionTable, particles, total_time, dt2):
    """Set velocity / advance position of Moving particles inside their motion
    window (reference SPHCellList.jl:575-596).  Velocity is *assigned* (zeroed
    outside the window), position integrated by dt/2.  Returns updated
    (position, velocity).  No-op trace when no motion is defined.
    """
    if not motion.any_motion:
        return particles.position, particles.velocity

    dtype = particles.position.dtype
    vel_t = jnp.asarray(motion.velocity, dtype=dtype)
    start_t = jnp.asarray(motion.start_time, dtype=dtype)
    dur_t = jnp.asarray(motion.duration, dtype=dtype)
    dir_t = jnp.asarray(motion.direction, dtype=dtype)
    def_t = jnp.asarray(motion.defined)

    marker = jnp.clip(particles.group_marker, 0, len(motion.velocity) - 1)
    is_moving = (particles.ptype == int(ParticleType.MOVING)) & def_t[marker]

    should = (start_t[marker] <= total_time) & (total_time <= start_t[marker] + dur_t[marker])
    v = (vel_t[marker] * should.astype(dtype))[:, None] * dir_t[marker]

    velocity = jnp.where(is_moving[:, None], v, particles.velocity)
    position = jnp.where(
        is_moving[:, None], particles.position + v * dt2, particles.position
    )
    return position, velocity

"""Multi-chip execution: shard an assembled simulation over a device mesh.

The particle axis is partitioned in global cell-sorted order (see
``parallel.context``); the step function itself is unchanged - it runs under
``shard_map`` with a sharded :class:`CommContext`, its all-gathers and
pmin/pmax lowering to XLA collectives over ICI.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..core.driver import Simulation
from ..core.step import StepConfig, sph_step
from ..state import PallasTables, Particles, SimulationState, empty_pallas_tables
from .context import CommContext

AXIS = "particles"


def make_mesh(n_devices: Optional[int] = None, axis: str = AXIS) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n]), (axis,))


def _particle_specs(axis: str) -> Particles:
    pp = P(axis)
    return Particles(
        cell=pp, chunk_id=pp, kernel_w=pp, kernel_grad=pp, position=pp,
        acceleration=pp, velocity=pp, density=pp, pressure=pp,
        gravity_factor=pp, motion_limiter=pp, boundary_bool=pp, id=pp,
        ptype=pp, group_marker=pp, ghost_points=pp, ghost_normals=pp,
        active=pp,
    )


def state_specs(axis: str = AXIS) -> SimulationState:
    return SimulationState(
        particles=_particle_specs(axis),
        cell_start=P(),
        total_time=P(),
        current_dt=P(),
        iteration=P(),
        max_occupancy=P(),
        max_segment=P(),
        occupied_cells=P(),
        position_half=P(axis),
        pallas_tables=PallasTables(
            occ_keys=P(), prog_base=P(), prog_slot=P(), slot_of_cell=P()
        ),
    )


def pad_capacity(state: SimulationState, new_capacity: int) -> SimulationState:
    """Grow the particle capacity with inactive padding slots (host-side)."""
    old = state.particles.capacity
    if new_capacity == old:
        return state
    if new_capacity < old:
        raise ValueError("cannot shrink capacity")
    extra = new_capacity - old

    def pad(a):
        if a.ndim == 0 or a.shape[0] != old:
            return a
        pad_block = jnp.zeros((extra,) + a.shape[1:], dtype=a.dtype)
        return jnp.concatenate([a, pad_block], axis=0)

    parts = jax.tree.map(pad, state.particles)
    parts = parts.replace(
        id=parts.id.at[old:].set(-1),
        active=parts.active.at[old:].set(False),
    )
    return state.replace(particles=parts, position_half=pad(state.position_half))


def make_sharded_interval_fn(cfg: StepConfig, mesh: Mesh, axis: str = AXIS):
    """shard_map the per-interval while-loop over the mesh."""
    ctx = CommContext(axis=axis, num_devices=mesh.shape[axis])
    cfg = dataclasses.replace(cfg, ctx=ctx)
    specs = state_specs(axis)

    cap = cfg.meta.max_steps_per_call

    def chunk_body(state: SimulationState, t_out, dx_acc):
        def cond(carry):
            s, _, k = carry
            ok = s.total_time <= t_out
            if cap is not None:
                ok = ok & (k < cap)
            return ok

        def body(carry):
            s, dxa, k = carry
            s2, dxa2 = sph_step(cfg, s, dxa)
            return s2, dxa2, k + 1

        final, dx_out, _ = jax.lax.while_loop(
            cond, body, (state, dx_acc, jnp.zeros((), jnp.int32))
        )
        return final, dx_out

    sharded_chunk = jax.jit(shard_map(
        chunk_body,
        mesh=mesh,
        in_specs=(specs, P(), P()),
        out_specs=(specs, P()),
        check_vma=False,
    ))

    def interval(state: SimulationState, t_out, progress=None) -> SimulationState:
        from ..core.step import _check_interval_progress

        dx = jnp.asarray(1.0 + cfg.spec.kernel.h, dtype=state.total_time.dtype)
        while True:
            it_before = int(state.iteration)
            state, dx = sharded_chunk(state, t_out, dx)
            _check_interval_progress(state, t_out, it_before)
            if float(state.total_time) > float(t_out):
                return state
            if progress is not None:
                progress(state)

    return interval, cfg


def shard_simulation(sim: Simulation, mesh: Optional[Mesh] = None, axis: str = AXIS) -> Simulation:
    """Return a copy of ``sim`` whose state lives sharded over ``mesh`` and
    whose interval function runs SPMD.  Capacity is padded up to a multiple of
    the mesh size."""
    mesh = mesh or make_mesh()
    ndev = mesh.shape[axis]
    cap = sim.state.particles.capacity
    new_cap = int(-(-cap // ndev) * ndev)
    state = pad_capacity(sim.state, new_cap)
    # the sharded path runs the gather sweep (no per-device Pallas programs
    # yet), so drop the single-chip program tables instead of replicating them
    state = state.replace(pallas_tables=empty_pallas_tables())

    interval_fn, cfg = make_sharded_interval_fn(sim.cfg, mesh, axis)
    specs = state_specs(axis)
    shardings = jax.tree.map(
        lambda spec: NamedSharding(mesh, spec), specs,
        is_leaf=lambda x: isinstance(x, P),
    )
    state = jax.device_put(state, shardings)

    return Simulation(
        cfg=cfg, state=state, meta=sim.meta, n_live=sim.n_live, interval_fn=interval_fn
    )

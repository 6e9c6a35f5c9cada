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
from ..core.step import StepConfig
from ..state import (BlockTables, PallasTables, Particles, SimulationState,
                     empty_block_tables, empty_pallas_tables)
from .context import CommContext

AXIS = "particles"


def make_mesh(n_devices: Optional[int] = None, axis: str = AXIS) -> Mesh:
    devs = jax.devices()
    n = len(devs) if n_devices is None else int(n_devices)
    if n < 1 or n > len(devs):
        raise ValueError(
            f"make_mesh({n_devices}): {len(devs)} device(s) available "
            "(for a CPU smoke run set "
            "XLA_FLAGS=--xla_force_host_platform_device_count=N "
            "before any jax import)"
        )
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
            occ_keys=P(axis), prog_base=P(axis), prog_slot=P(axis),
            slot_of_cell=P(axis), nprog=P(axis), prog_idx=P(axis),
            row_idx=P(axis), slot_pair=P(axis),
        ),
        max_halo=P(),
        # per-device block tables, stacked on the device axis (the cell-pair
        # and all-gather paths carry EMPTY tables: (0,)-shaped leaves shard
        # trivially); chunk_total is replicated telemetry (pmax'd on rebuild)
        block_tables=BlockTables(
            prog_start=P(axis), prog_mid=P(axis), chunk_tab=P(axis),
            csr=P(axis), cer=P(axis), idx=P(axis), chunk_total=P(),
        ),
        max_chunks=P(),
        grid_escapes=P(),
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

    from ..core.step import make_chunk_body

    sharded_chunk = jax.jit(shard_map(
        make_chunk_body(cfg),
        mesh=mesh,
        in_specs=(specs, P(), P()),
        out_specs=(specs, P()),
        check_vma=False,
    ))

    # shared host chunk loop: progress spinner + device-call watchdog
    # (a stalled transport in a sharded run fails as loudly as single-chip)
    from ..core.step import make_chunk_loop

    return make_chunk_loop(cfg, sharded_chunk), cfg


def measure_halo(position, active, inv_cutoff, grid, ndev: int, capacity: int,
                 ghost_points=None) -> int:
    """Host-side: max sorted-row reach of any stencil window past its own
    slab's boundaries in the initial configuration.  Every neighbor cell of
    cell k has a linear key within ``W = sum(strides)`` of k, so a window's
    rows are bounded by the ``[k-W, k+W]`` key band - the same conservative
    band the runtime ``max_halo`` telemetry guards as the fluid drifts.

    ``ghost_points`` (mDBC): the sharded mDBC kernel reads each boundary
    particle's GHOST-node stencil from the same halo, and the ghost sits up
    to ~one cell away from its particle - its band is evaluated at the ghost
    key but anchored to the particle's own slab, exactly like the runtime
    telemetry (core/step.py ghost branch)."""
    from ..ops.cell_list import host_cell_keys

    pos = np.asarray(position)
    act = np.asarray(active)
    ncells = grid.ncells
    key = np.where(act, host_cell_keys(pos, inv_cutoff, grid), ncells)
    order = np.argsort(key, kind="stable")
    skeys = key[order]
    cell_start = np.searchsorted(skeys, np.arange(ncells + 2))
    rank = np.empty(capacity, np.int64)
    rank[order] = np.arange(capacity)
    C = capacity // ndev
    dev = rank // C
    W = int(sum(grid.strides))

    def band_need(k_arr, mask):
        s = cell_start[np.clip(k_arr - W, 0, ncells)]
        e = cell_start[np.clip(k_arr + W + 1, 0, ncells + 1)]
        l = np.where(mask, dev * C - s, 0)
        r = np.where(mask, e - (dev + 1) * C, 0)
        return max(int(l.max(initial=0)), int(r.max(initial=0)))

    need = band_need(key, act & (key < ncells))
    if ghost_points is not None:
        gp = np.asarray(ghost_points)
        has_g = act & np.any(gp != 0, axis=-1)
        gkey = host_cell_keys(gp, inv_cutoff, grid)
        need = max(need, band_need(gkey, has_g))
    return max(int(need), 0)


def shard_simulation(sim: Simulation, mesh: Optional[Mesh] = None, axis: str = AXIS,
                     min_halo: int = 0, min_ct_cap: int = 0) -> Simulation:
    """Return a copy of ``sim`` whose state lives sharded over ``mesh`` and
    whose interval function runs SPMD.  Capacity is padded up to a multiple
    of ``ndev * 128`` (slab capacities stay 128-aligned for the Pallas DMA
    windows).

    With ``cfg.use_pallas`` the sweeps run per-device fused kernels with a
    1-hop halo exchange: the BLOCK kernel (``pallas_block_sweep_sharded``,
    the hot path - ``meta.block_sweep`` and the per-device encoding budget
    permitting, with ``ct_cap`` sized per slab) or the cell-pair kernel
    otherwise.  The halo capacity is sized from the initial geometry with 2x
    margin and guarded by the ``max_halo`` rebuild telemetry.  Without
    ``use_pallas`` (or when the measured halo would exceed a slab) the
    all-gather XLA sweep runs instead.  ``min_ct_cap`` is the retune floor
    for the per-device chunk-table capacity."""
    import dataclasses as _dc

    mesh = mesh or make_mesh()
    ndev = mesh.shape[axis]
    cap = sim.state.particles.capacity
    # 512 rows = 4 blocks per device: keeps per-slab block counts divisible
    # by the BPB (blocks-per-program) settings, like assemble_simulation
    new_cap = int(-(-cap // (ndev * 512)) * (ndev * 512))
    state = pad_capacity(sim.state, new_cap)

    # Pre-sort into global cell-sorted order BEFORE slicing into slabs: the
    # distributed rebuild (ops/cell_list.rebuild_sharded) migrates rows at
    # most one hop per rebuild, which is only sound when every slab starts
    # within one halo of its sorted position.  (The replicated rebuild
    # tolerated any order; the first distributed rebuild must not.)
    from ..ops import cell_list as _cl

    cfg0 = sim.cfg
    p0 = state.particles
    # the EXACT ordering rule of the in-step rebuild (the 1-hop migration
    # bound of rebuild_sharded assumes slabs start in this order)
    keys0, coords = _cl.sort_keys(p0, cfg0.spec.kernel.H_inv, cfg0.grid)
    perm0 = jnp.argsort(keys0, stable=True)
    p0 = p0.permute(perm0)
    p0 = p0.replace(cell=jnp.take(coords, perm0, axis=0))
    cs0 = _cl.segment_starts(keys0, cfg0.grid.ncells)
    state = state.replace(
        particles=p0,
        cell_start=cs0,
        position_half=jnp.take(state.position_half, perm0, axis=0),
    )

    halo = 0
    if cfg0.use_pallas:
        from ..config import MDBCMode as _MDBC

        C = new_cap // ndev
        need = measure_halo(
            state.particles.position, state.particles.active,
            cfg0.spec.kernel.H_inv, cfg0.grid, ndev, new_cap,
            ghost_points=(state.particles.ghost_points
                          if sim.meta.mdbc is _MDBC.SIMPLE else None),
        )
        r128 = lambda v: -(-int(v) // 128) * 128  # noqa: E731
        want = r128(need * 2 + 128)               # 2x margin for drift
        want = max(want, r128(min_halo))          # retune-observed floor
        if want <= C:
            halo = want
        elif r128(min_halo) > C:
            # a RETUNE asked for more halo than a slab can give: the 1-hop
            # exchange cannot cover it, and answering with halo = C again
            # would replay the identical config forever - fall back to the
            # all-gather sweep (halo = 0), which has no halo to overflow
            halo = 0
        elif r128(need + 64) <= C:
            halo = C                              # tight fit, telemetry guards
        else:
            halo = 0  # slabs thinner than the stencil reach: 1 hop can't cover

        if halo > 0 and sim.meta.mdbc is _MDBC.SIMPLE:
            # the fused sharded mDBC kernel (ops/pallas_mdbc.py) requires the
            # halo-extended window to hold one candidate DMA window:
            # C + 2*halo >= cseg + 128.  Thin slabs that violate it used to
            # die with a trace-time ValueError deep in the kernel; grow the
            # halo to cover (it is bounded by C, the 1-hop exchange width),
            # else fall back to the all-gather path like the sweeps do.
            mdbc_need = cfg0.cseg + 128
            if C + 2 * halo < mdbc_need:
                grown = r128(-(-(mdbc_need - C) // 2))
                if grown <= C:
                    halo = grown
                else:
                    halo = 0  # slab too thin for the mDBC window: all-gather

    # Per-device chunk-table capacity for the sharded BLOCK sweep: sized from
    # the per-slab cover estimates with 2x headroom (max over devices - the
    # tables are equal-shaped so slabs stay exchangeable across retunes), the
    # same economics as the single-chip sizing in assemble_simulation.
    ct_cap_dev = 0
    if halo > 0 and sim.meta.block_sweep:
        from ..ops.pallas_block_sweep import (BLOCK_CAP_LIMIT,
                                              estimate_chunk_totals_sharded)

        C = new_cap // ndev
        # the packed sorted index is exact f32 only below 2^24 GLOBAL rows
        # (the role quirk compares global positions); beyond either budget
        # the cell-pair kernel serves the halo path instead
        if C + 2 * halo <= BLOCK_CAP_LIMIT and new_cap <= 2 ** 24:
            act = np.asarray(state.particles.active)
            pos_live = np.asarray(state.particles.position)[act]
            ests = estimate_chunk_totals_sharded(
                pos_live, cfg0.spec.kernel.H_inv, cfg0.grid, new_cap, ndev
            )
            need = max(max(ests) * 2, int(min_ct_cap)) + 1024
            ct_cap_dev = -(-need // 1024) * 1024
            if ct_cap_dev >= 2 ** 24:
                ct_cap_dev = 0  # degenerate cover: cell-pair kernel instead

    tile = lambda a: jnp.tile(  # noqa: E731 - stack per-device tables
        a[None], (ndev,) + (1,) * a.ndim
    ).reshape((ndev * a.shape[0],) + a.shape[1:])

    if ct_cap_dev > 0:
        from ..ops.pallas_block_sweep import init_block_tables

        t = init_block_tables(new_cap // ndev, ct_cap_dev)
        state = state.replace(
            pallas_tables=empty_pallas_tables(),
            block_tables=BlockTables(
                prog_start=tile(t.prog_start), prog_mid=tile(t.prog_mid),
                chunk_tab=tile(t.chunk_tab), csr=tile(t.csr),
                cer=tile(t.cer), idx=tile(t.idx),
                chunk_total=t.chunk_total,  # scalar telemetry: replicated
            ),
        )
    elif halo > 0:
        from ..ops.pallas_sweep import init_program_tables, sweep_rows

        # per-device tables, stacked on the device axis (leading dim shards)
        C = new_cap // ndev
        t = init_program_tables(cfg0.grid, cfg0.maxc, sweep_rows(cfg0.mpc),
                                C + 2 * halo, local_rows=C)
        state = state.replace(
            pallas_tables=jax.tree.map(
                lambda a: tile(a) if a.ndim else jnp.zeros((ndev,), a.dtype),
                t,
            ),
            block_tables=empty_block_tables(),
        )
    else:
        # the gather sweep needs no program tables
        state = state.replace(
            pallas_tables=empty_pallas_tables(),
            block_tables=empty_block_tables(),
        )

    # both telemetry maxima were measured against the PREVIOUS slab geometry
    # (or the single-chip run) - stale values would spuriously trip the
    # overflow check against the fresh halo/ct_cap on the first interval
    state = state.replace(max_chunks=jnp.zeros((), jnp.int32),
                          max_halo=jnp.zeros((), jnp.int32),
                          grid_escapes=jnp.zeros((), jnp.int32))
    interval_fn, cfg = make_sharded_interval_fn(
        _dc.replace(cfg0, halo=halo, ct_cap=ct_cap_dev), mesh, axis
    )
    specs = state_specs(axis)
    shardings = jax.tree.map(
        lambda spec: NamedSharding(mesh, spec), specs,
        is_leaf=lambda x: isinstance(x, P),
    )
    state = jax.device_put(state, shardings)

    return Simulation(
        cfg=cfg, state=state, meta=sim.meta, n_live=sim.n_live, interval_fn=interval_fn
    )

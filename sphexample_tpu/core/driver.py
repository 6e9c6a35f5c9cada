"""Host driver: build the simulation, stream output intervals.

TPU-native equivalent of ``RunSimulation`` (reference
``src/SPHCellList.jl:808-930``): all physics lives in one jitted
per-interval function; the host loop only schedules output times, pulls
snapshots, and checks the cell-occupancy overflow telemetry.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import (
    Geometry,
    MDBCMode,
    SimulationConstants,
    SimulationMetaData,
    SPHKernelInstance,
    DensityDiffusionModel,
    ViscosityModel,
)
from ..io.csv_io import load_boundary_normals, load_geometries
from ..ops import cell_list as cl
from ..ops.interactions import PhysicsSpec
from ..models import equations as eq
from ..state import SimulationState, allocate_particles
from .motion import build_motion_table
from .step import StepConfig, make_interval_fn


@dataclass
class Simulation:
    """A ready-to-run simulation: static config + on-device state."""

    cfg: StepConfig
    state: SimulationState
    meta: SimulationMetaData
    n_live: int
    interval_fn: Callable = None
    hourglass: object = None  # filled by run_simulation

    def __post_init__(self):
        if self.interval_fn is None:
            self.interval_fn = make_interval_fn(self.cfg)


def _dtype_of(meta: SimulationMetaData):
    return jnp.float64 if meta.dtype == "float64" else jnp.float32


def assemble_simulation(
    position: np.ndarray,
    density: np.ndarray,
    ptype: np.ndarray,
    group_marker: np.ndarray,
    idp: np.ndarray,
    meta: SimulationMetaData,
    constants: SimulationConstants,
    kernel: SPHKernelInstance,
    viscosity: ViscosityModel,
    diffusion: DensityDiffusionModel,
    *,
    ghost_points: Optional[np.ndarray] = None,
    ghost_normals: Optional[np.ndarray] = None,
    geometries: Sequence[Geometry] = (),
    capacity: Optional[int] = None,
) -> Simulation:
    """Allocate device state from host arrays and assemble the jitted step
    config (grid bounds, candidate-window capacity, motion table)."""
    dims = meta.dims
    dtype = _dtype_of(meta)
    n = len(density)

    grid = cl.grid_from_positions(position, kernel.H_inv, meta.grid_margin_cells)
    if not meta.use_pallas:
        # the pallas branch below derives its own occupancy (this estimate
        # would be dead work - an O(n) host pass at 1M+ particle scale)
        mpc = meta.max_per_cell or cl.estimate_max_per_cell(position, kernel.H_inv)
    if meta.use_pallas:
        # Pallas windows sized from the measured initial geometry with 25%
        # headroom (runtime telemetry raises if occupancy outgrows them):
        # self window multiple of 8 (sublane), candidate segment multiple of
        # 128 (lane); DMA windows must fit the capacity.
        occ0, seg0 = cl.measure_occupancy(position, kernel.H_inv, grid)
        ncc0 = cl.count_occupied(position, kernel.H_inv, grid)
        # row headroom is free with the compacted chunk list (chunks only
        # materialize where cells actually grow), so budget generously to
        # avoid mid-run retunes; the candidate window (cseg) costs real
        # lanes and keeps tighter 25% headroom + auto-retune.  Measured 3D
        # dam-break impact compresses cells to >2.3x their at-rest max
        # occupancy (64 -> 147 by t=0.19 s), so even 2x may retune once
        # during the most violent phase - by design for the lanes, and the
        # retune itself now grows decisively (see _retune).
        mpc_exact = meta.max_per_cell or int(occ0 * 2.0) + 2
        mpc_pad = -(-mpc_exact // 8) * 8
        cseg = -(-(int(seg0 * 1.25) + 2) // 128) * 128
        mpc = mpc_pad
        # tail padding keeps the kernel's aligned DMA-window clamps from
        # EVER binding on a live cell (capacity >= n_live + window): beyond
        # correctness headroom this makes the in-window lane offsets - and
        # therefore the f32 summation order - independent of the array
        # length, so sharded slabs reproduce the single-chip sums exactly
        cwin = -(-(cseg + mpc) // 128) * 128 + 128
        capacity = max(capacity or 0, n + cwin + 128, n + 256)
        # 512 = 4 blocks: keeps the block count divisible by the BPB
        # (blocks-per-program) A/B settings 2 and 4, so SPH_BLOCK_BPB never
        # silently falls back to 1 on the benchmark cases
        capacity = -(-capacity // 512) * 512
    else:
        mpc_pad = mpc
        cseg = 3 * mpc

    particles = allocate_particles(
        position, density, ptype, group_marker, idp, dtype=dtype, capacity=capacity
    )

    n_ghost = 0
    if ghost_points is not None:
        # Reference LoadMDBCNormals! (SPHCellList.jl:507-524): ghost rows map
        # 1:1 onto the first particles in ID order (the boundary body loads
        # first and IDs are contiguous from 1).
        n_ghost = len(ghost_points)
        gp = np.zeros((particles.capacity, dims))
        gn = np.zeros((particles.capacity, dims))
        gp[:n_ghost] = ghost_points
        gn[:n_ghost] = ghost_normals
        particles = particles.replace(
            ghost_points=jnp.asarray(gp, dtype=dtype),
            ghost_normals=jnp.asarray(gn, dtype=dtype),
        )

    # Initial pressure (reference RunSimulation, SPHCellList.jl:835)
    particles = particles.replace(pressure=eq.pressure(particles.density, constants))

    spec = PhysicsSpec(
        constants=constants,
        kernel=kernel,
        viscosity=viscosity,
        diffusion=diffusion,
        shifting=meta.shifting,
        kernel_output=meta.kernel_output,
    )
    ct_cap = 0
    if meta.use_pallas and meta.block_sweep:
        from ..ops.pallas_block_sweep import (BLOCK_CAP_LIMIT,
                                             estimate_chunk_total)

        # two encoding budgets gate the block path: the packed row-offset
        # field (BLOCK_CAP_LIMIT, CH-dependent) and the f32 sorted-index
        # pack (exact only below 2^24 - the density-diffusion role quirk
        # compares idx values; the sharded path enforces the same bound)
        if int(particles.capacity) <= min(BLOCK_CAP_LIMIT, 2 ** 24):
            # block-sweep chunk budget from the measured initial cover with
            # 2x headroom (compression during impact grows neighbor counts
            # and therefore chunks; max_chunks telemetry retunes on overflow)
            est = estimate_chunk_total(
                position, kernel.H_inv, grid, int(particles.capacity)
            )
            ct_cap = -(-(int(est * 2.0) + 1024) // 1024) * 1024
            if ct_cap >= 2 ** 24:
                ct_cap = 0  # degenerate cover: use the cell-pair kernel
        # beyond the block kernel's row-offset field budget, fall back to
        # the cell-pair kernel (which supports the full capacity range)

    cfg = StepConfig(
        spec=spec,
        meta=meta,
        grid=grid,
        cseg=cseg,
        block_size=meta.block_size,
        motion=build_motion_table(geometries, dims),
        boundary_capacity=max(1, n_ghost),
        use_pallas=meta.use_pallas,
        mpc=mpc_pad,
        maxc=(
            min(grid.ncells, int(particles.capacity), meta.max_occupied_cells)
            if meta.max_occupied_cells
            else min(grid.ncells, int(particles.capacity),
                     (int(ncc0 * 2.0) + 64) if meta.use_pallas else 10**9)
        ),
        ct_cap=ct_cap,
    )

    from ..state import empty_block_tables, empty_pallas_tables

    btables = empty_block_tables()
    if ct_cap > 0:
        # block path: the cell-pair program tables are unused single-chip
        # (mDBC has its own kernel; sharding re-inits tables per slab)
        from ..ops.pallas_block_sweep import init_block_tables

        tables = empty_pallas_tables()
        btables = init_block_tables(int(particles.capacity), ct_cap)
    elif meta.use_pallas:
        from ..ops.pallas_sweep import init_program_tables, sweep_rows

        tables = init_program_tables(
            grid, cfg.maxc, sweep_rows(cfg.mpc), particles.capacity
        )
    else:
        tables = empty_pallas_tables()

    zero = jnp.zeros((), dtype=dtype)
    state = SimulationState(
        particles=particles,
        cell_start=jnp.zeros((grid.ncells + 2,), dtype=jnp.int32),
        total_time=zero,
        current_dt=zero,
        iteration=jnp.zeros((), dtype=jnp.int32),
        max_occupancy=jnp.zeros((), dtype=jnp.int32),
        max_segment=jnp.zeros((), dtype=jnp.int32),
        occupied_cells=jnp.zeros((), dtype=jnp.int32),
        position_half=jnp.zeros_like(particles.position),
        pallas_tables=tables,
        max_halo=jnp.zeros((), dtype=jnp.int32),
        block_tables=btables,
    )
    return Simulation(cfg=cfg, state=state, meta=meta, n_live=n)


def build_simulation(
    geometries: Sequence[Geometry],
    meta: SimulationMetaData,
    constants: SimulationConstants,
    kernel: SPHKernelInstance,
    viscosity: ViscosityModel,
    diffusion: DensityDiffusionModel,
    particle_normals_path: Optional[str] = None,
    capacity: Optional[int] = None,
) -> Simulation:
    """Load CSV geometry and assemble a ready-to-run simulation."""
    position, density, ptype, group_marker, idp = load_geometries(geometries, meta.dims)

    ghost_points = ghost_normals = None
    if meta.mdbc is MDBCMode.SIMPLE and particle_normals_path is not None:
        _, ghost_points, ghost_normals = load_boundary_normals(
            particle_normals_path, meta.dims
        )

    return assemble_simulation(
        position, density, ptype, group_marker, idp,
        meta, constants, kernel, viscosity, diffusion,
        ghost_points=ghost_points, ghost_normals=ghost_normals,
        geometries=geometries, capacity=capacity,
    )


def _overflow_reason(cfg: StepConfig, state) -> Optional[str]:
    """Non-None when the interval ran with overflowed neighbor windows.

    Only budgets a LIVE consumer reads can invalidate an interval: on the
    block-sweep path (ct_cap > 0) the chunk table replaces the mpc/cseg
    candidate windows and the maxc program grid entirely - their only
    remaining consumer is the mDBC kernel (mpc/cseg; never maxc).  Checking
    a dead budget would declare physically-correct results invalid and pay
    a multi-minute recompile for nothing."""
    from ..config import MDBCMode

    esc = int(state.grid_escapes)
    if esc > 0:
        return (
            f"{esc} particle(s) escaped the static cell grid and were "
            f"clamped into edge cells (wrong physics); re-grid with a "
            f"larger bounding box or raise grid_margin_cells"
        )
    block = bool(cfg.ct_cap)
    mdbc_on = cfg.meta.mdbc is MDBCMode.SIMPLE
    mpc_cseg_live = (not block) or mdbc_on
    occ = int(state.max_occupancy)
    mpc_budget = cfg.mpc if cfg.use_pallas else cfg.cseg // 3
    if mpc_cseg_live and occ > mpc_budget:
        return (
            f"cell occupancy {occ} exceeded the static budget {mpc_budget}; "
            f"set SimulationMetaData.max_per_cell >= {occ}"
        )
    if cfg.use_pallas and mpc_cseg_live and int(state.max_segment) > cfg.cseg:
        return (
            f"stencil-row segment {int(state.max_segment)} exceeded the "
            f"candidate window {cfg.cseg}; raise max_per_cell"
        )
    if cfg.use_pallas and not block and int(state.occupied_cells) > cfg.maxc:
        return (
            f"occupied cells {int(state.occupied_cells)} exceeded the "
            f"program-grid capacity {cfg.maxc}; raise max_occupied_cells"
        )
    if cfg.ct_cap and int(state.max_chunks) > cfg.ct_cap:
        return (
            f"block-sweep chunk table needed {int(state.max_chunks)} entries, "
            f"exceeding the capacity {cfg.ct_cap}; the swept cover was "
            f"truncated"
        )
    if cfg.halo and int(state.max_halo) > cfg.halo:
        return (
            f"stencil windows reached {int(state.max_halo)} sorted rows past "
            f"a slab boundary, exceeding the halo capacity {cfg.halo}; "
            f"re-shard with a larger halo"
        )
    return None


def _regrow_grid(cfg: StepConfig, failed_state, margin_cells: int) -> cl.Grid:
    """Union of the current grid and the escaped configuration's bounding box
    (plus margin): covers wherever the failed interval's particles actually
    went.  The reference's Dict grid is unbounded (SPHCellList.jl:144-162);
    this is the static-grid analog - grow, replay, carry on."""
    p = jax.device_get(failed_state.particles)
    act = np.asarray(p.active)
    pos = np.asarray(p.position)[act]
    if not np.all(np.isfinite(pos)):
        raise FloatingPointError(
            "simulation diverged: non-finite particle positions at the "
            "grid-escape re-grid"
        )
    esc_grid = cl.grid_from_positions(pos, cfg.spec.kernel.H_inv, margin_cells)
    cmin = tuple(min(a, b) for a, b in zip(cfg.grid.cmin, esc_grid.cmin))
    cmax = tuple(
        max(a + s - 1, b + t - 1)
        for a, s, b, t in zip(cfg.grid.cmin, cfg.grid.shape,
                              esc_grid.cmin, esc_grid.shape)
    )
    new_grid = cl.Grid(
        cmin=cmin, shape=tuple(hi - lo + 1 for lo, hi in zip(cmin, cmax))
    )
    if new_grid.ncells > max(8 * cfg.grid.ncells, 2 ** 24):
        raise RuntimeError(
            f"grid-escape re-grid would need {new_grid.ncells} cells "
            f"({new_grid.shape}, was {cfg.grid.shape}): particles are far "
            f"outside the simulation domain - this is almost certainly a "
            f"diverged simulation, not a domain-sizing problem"
        )
    return new_grid


def _retune(sim: Simulation, prev_state, failed_state) -> "tuple[Simulation, object]":
    """Grow the static neighbor windows to fit the observed telemetry of the
    failed interval, re-jit, and return (sim, pre-interval state) for replay."""
    import dataclasses as _dc

    from ..parallel.mesh import pad_capacity

    occ = int(failed_state.max_occupancy)
    seg = int(failed_state.max_segment)
    ncc = int(failed_state.occupied_cells)
    cfg = sim.cfg
    esc = int(failed_state.grid_escapes)
    new_grid = cfg.grid
    if esc > 0:
        new_grid = _regrow_grid(cfg, failed_state, sim.meta.grid_margin_cells)
    if cfg.ctx.is_sharded:
        # pull the pre-interval state to host, grow the windows AND the halo,
        # re-shard over the same mesh, and replay - the sharded analog of the
        # single-chip replay below (a long sharded run whose occupancy or
        # halo outgrows the initial sizing used to die with a RuntimeError).
        import sys

        from ..parallel.context import SINGLE
        from ..parallel.mesh import make_mesh, shard_simulation

        ndev = cfg.ctx.num_devices
        halo_need = int(failed_state.max_halo)
        mpc = -(-(int(occ * 2.0) + 2) // 8) * 8 if cfg.use_pallas else cfg.mpc
        mpc = max(mpc, cfg.mpc)
        cseg = max(
            -(-(int(max(seg, 3 * occ) * 1.5) + 2) // 128) * 128, cfg.cseg
        )
        maxc = max(min(cfg.grid.ncells, ncc * 2 + 256), cfg.maxc)
        min_halo = -(-max(halo_need * 2, cfg.halo) // 128) * 128 + 128
        # chunk-table overflow (sharded block sweep): floor the re-shard's
        # per-device ct_cap at 2x the observed need, like the single-chip path
        min_ct_cap = 0
        if cfg.ct_cap:
            min_ct_cap = max(int(failed_state.max_chunks) * 2, cfg.ct_cap)

        host_state = jax.device_get(prev_state)
        if esc > 0:
            # re-grid: shard_simulation rebuilds cell_start and all tables
            # from the cfg grid, so only the shape-bearing leaves need fixing
            host_state = host_state.replace(
                cell_start=jnp.zeros((new_grid.ncells + 2,), jnp.int32),
            )
        single_cfg = _dc.replace(
            cfg, mpc=mpc, cseg=cseg, maxc=maxc, ctx=SINGLE, halo=0,
            grid=new_grid,
        )
        base = Simulation(
            cfg=single_cfg, state=host_state, meta=sim.meta, n_live=sim.n_live
        )
        print(
            f"[sphexample_tpu] sharded neighbor windows outgrown (occ {occ}, "
            f"seg {seg}, cells {ncc}, halo {halo_need}/{cfg.halo}, grid "
            f"escapes {esc}); retuning mpc {cfg.mpc}->{mpc}, cseg "
            f"{cfg.cseg}->{cseg}, maxc {cfg.maxc}->{maxc}, halo >= "
            f"{min_halo}, grid {cfg.grid.shape}->{new_grid.shape}, "
            f"re-sharding over {ndev} devices and replaying the interval",
            file=sys.stderr,
        )
        new_sim = shard_simulation(base, make_mesh(ndev), min_halo=min_halo,
                                   min_ct_cap=min_ct_cap)
        return new_sim, new_sim.state

    if cfg.use_pallas:
        # a retune fires while occupancy is still climbing (dam-break impact
        # compresses cells to >2x their at-rest max), and each one costs a
        # full recompile - grow decisively: rows are free (2x), candidate
        # lanes cost VMEM but repeated recompiles cost minutes (1.5x).
        mpc = max(-(-(int(occ * 2.0) + 2) // 8) * 8, cfg.mpc)
        cseg = max(-(-(int(max(seg, 3 * occ) * 1.5) + 2) // 128) * 128, cfg.cseg)
        maxc = min(new_grid.ncells, ncc * 2 + 256)
        cwin = -(-(cseg + mpc) // 128) * 128 + 128
        new_cap = max(
            prev_state.particles.capacity,
            sim.n_live + cwin + 128,
            sim.n_live + 256,
        )
        # 512-multiple like assemble_simulation: keeps the block count
        # divisible by the SPH_BLOCK_BPB=2/4 settings after a mid-run retune
        # (128 rounding silently dropped post-retune segments to bpb=1)
        new_cap = -(-new_cap // 512) * 512
        ct_cap = cfg.ct_cap
        if ct_cap:
            # chunk overflow (or a grown cover after the window growth):
            # budget 2x the observed need, like the initial sizing
            need = int(failed_state.max_chunks)
            ct_cap = max(-(-(need * 2 + 1024) // 1024) * 1024, ct_cap)
            from ..ops.pallas_block_sweep import BLOCK_CAP_LIMIT

            if new_cap > min(BLOCK_CAP_LIMIT, 2 ** 24) or ct_cap >= 2 ** 24:
                # grown past the block kernel's encoding budget: fall back
                # to the cell-pair kernel for the rest of the run
                ct_cap = 0
        prev_state = pad_capacity(prev_state, new_cap)
        new_cfg = _dc.replace(cfg, mpc=mpc, cseg=cseg,
                              maxc=max(maxc, cfg.maxc), ct_cap=ct_cap,
                              grid=new_grid)
        # the tables are shaped by (maxc, mpc / ct_cap, capacity) and the
        # grid: re-init to the new shapes (the replayed interval's first
        # step rebuilds them)
        if ct_cap:
            from ..ops.pallas_block_sweep import init_block_tables

            prev_state = prev_state.replace(
                block_tables=init_block_tables(new_cap, ct_cap),
                max_chunks=jnp.zeros((), jnp.int32),
            )
        else:
            from ..ops.pallas_sweep import init_program_tables, sweep_rows

            prev_state = prev_state.replace(
                pallas_tables=init_program_tables(
                    new_cfg.grid, new_cfg.maxc, sweep_rows(new_cfg.mpc),
                    new_cap
                )
            )
    else:
        mpc = int(occ * 1.25) + 2
        new_cfg = _dc.replace(cfg, cseg=max(3 * mpc, cfg.cseg), grid=new_grid)

    if esc > 0:
        # replay starts from the pre-interval state on the grown grid: the
        # old cell_start shape belongs to the old grid, and the escape count
        # was measured against it
        prev_state = prev_state.replace(
            cell_start=jnp.zeros((new_grid.ncells + 2,), jnp.int32),
            grid_escapes=jnp.zeros((), jnp.int32),
        )

    if (new_cfg.mpc, new_cfg.cseg, new_cfg.maxc, new_cfg.ct_cap,
            new_cfg.grid) == (cfg.mpc, cfg.cseg, cfg.maxc, cfg.ct_cap,
                              cfg.grid):
        raise RuntimeError(
            "neighbor-window retune made no progress; raise max_per_cell manually"
        )
    import sys

    print(
        f"[sphexample_tpu] neighbor windows outgrown (occ {occ}, seg {seg}, "
        f"cells {ncc}, chunks {int(failed_state.max_chunks)}, grid escapes "
        f"{esc}); retuning mpc "
        f"{cfg.mpc}->{new_cfg.mpc}, cseg {cfg.cseg}->{new_cfg.cseg}, maxc "
        f"{cfg.maxc}->{new_cfg.maxc}, ct_cap {cfg.ct_cap}->{new_cfg.ct_cap}, "
        f"grid {cfg.grid.shape}->{new_cfg.grid.shape} "
        f"and replaying the interval (recompile)",
        file=sys.stderr,
    )
    new_sim = Simulation(
        cfg=new_cfg, state=prev_state, meta=sim.meta, n_live=sim.n_live
    )
    return new_sim, prev_state


def _default_progress(meta: SimulationMetaData, t_wall0: float):
    """In-interval progress line (the reference's ProgressMeter spinner,
    SPHCellList.jl:870-907): fires once per device chunk, rate-limited, and
    only when stderr is a terminal."""
    import sys

    if not sys.stderr.isatty():
        return None
    last = [0.0]

    def progress(state):
        now = time.perf_counter()
        if now - last[0] < 2.0:
            return
        last[0] = now
        tt = float(state.total_time)
        frac = min(tt / meta.simulation_time, 1.0) if meta.simulation_time else 0.0
        wall = now - t_wall0
        eta = wall * (1.0 - frac) / frac if frac > 1e-9 else float("nan")
        sys.stderr.write(
            f"\r  iter {int(state.iteration):>8}  t={tt:.4f}/"
            f"{meta.simulation_time:g}s  dt={float(state.current_dt):.2e}  "
            f"wall {wall:6.0f}s  eta {eta:6.0f}s "
        )
        sys.stderr.flush()

    return progress


class _AsyncSaver:
    """Run the save callback on a worker thread so device->host snapshot
    transfers and HDF5 writes overlap the next interval's device compute.

    Measured on the tunneled v5e headline run: saves were 510 s of a 1549 s
    wall (33%) - almost entirely device->host bandwidth + h5py - while the
    chip sat idle.  One worker thread keeps snapshot ordering (same HDF5
    files); the queue is bounded so at most ``maxsize`` state pytrees are
    kept alive.  Exceptions re-raise on the next enqueue or on close()."""

    def __init__(self, save_callback, maxsize: int = 2, watchdog=None):
        import queue
        import threading

        self._cb = save_callback
        self._q = queue.Queue(maxsize=maxsize)
        self._err = None
        self._wd = watchdog  # covers snapshot device->host fetches too
        self._t = threading.Thread(target=self._run, daemon=True)
        self._t.start()

    def _run(self):
        while True:
            item = self._q.get()
            try:
                if item is None:
                    return
                if self._wd is not None:
                    self._wd.arm(f"snapshot {item[0]}")
                self._cb(*item)
            except BaseException as e:  # noqa: BLE001 - surfaced on main thread
                self._err = e
                return
            finally:
                # disarm on EVERY exit: a save exception leaving the
                # watchdog armed would fire a bogus "device call hung"
                # (or an os._exit(86) in hard mode) that masks the real
                # error close() is about to raise
                if self._wd is not None:
                    self._wd.disarm()
                self._q.task_done()

    def __call__(self, counter, state):
        # bounded-timeout puts: if the worker died (or is itself stuck in a
        # stalled transfer), the main thread must not block forever on a
        # full queue - surface the error instead
        import queue

        while True:
            if self._err is not None:
                raise RuntimeError("async save failed") from self._err
            if not self._t.is_alive():
                raise RuntimeError("async saver thread died")
            try:
                self._q.put((counter, state), timeout=30.0)
                return
            except queue.Full:
                continue

    def close(self):
        # after a worker exception the thread has exited without draining:
        # an unconditional blocking put on the bounded queue would turn a
        # save failure into a hang (advisor finding, round 2).  A healthy
        # but slow worker (tunneled transfers run minutes) must instead be
        # WAITED for - silently returning with snapshots still queued would
        # drop the final output intervals with exit code 0.
        import queue as _queue

        import time as _time

        deadline = _time.monotonic() + 1800.0
        while (self._err is None and self._t.is_alive()
               and _time.monotonic() < deadline):
            try:
                self._q.put(None, timeout=60.0)
                break
            except _queue.Full:
                continue  # worker alive and draining: keep waiting
        while self._t.is_alive() and _time.monotonic() < deadline:
            self._t.join(timeout=60.0)
        if self._err is not None:
            raise RuntimeError("async save failed") from self._err
        if self._t.is_alive() or not self._q.empty():
            raise RuntimeError(
                "async saver did not drain within 30 min: "
                "snapshots would be lost (stalled transfer?)"
            )


def run_simulation(
    sim: Simulation,
    save_callback: Optional[Callable[[int, SimulationState], None]] = None,
    log_callback: Optional[Callable[[dict], None]] = None,
    max_intervals: Optional[int] = None,
    auto_retune: bool = True,
    start_counter: int = 1,
    progress_callback: Optional[Callable] = None,
) -> Simulation:
    """Outer host loop over output intervals (reference SPHCellList.jl:881-929).

    ``save_callback(counter, state)`` fires once for the initial state and once
    per output time.  If the static neighbor windows overflow (cell occupancy
    outgrew the budget) the interval's results are invalid; with
    ``auto_retune`` the driver enlarges the windows, re-jits, and **replays
    the interval from the pre-interval state** - otherwise it raises.
    """
    from ..utils.timers import HourGlass

    meta = sim.meta
    state = sim.state
    counter = start_counter
    saver = save_callback
    save_wd = None
    if save_callback is not None and getattr(meta, "async_output", True):
        if getattr(meta, "device_call_timeout", None):
            from ..utils.watchdog import DeviceWatchdog

            save_wd = DeviceWatchdog(
                meta.device_call_timeout,
                hard=getattr(meta, "watchdog_hard", False),
                context="snapshot save",
            )
        saver = _AsyncSaver(save_callback, watchdog=save_wd)
    if saver is not None and counter == 1:
        # initial-state snapshot; on resume (start_counter > 1) the snapshot
        # for this counter already exists in the reopened output files
        saver(counter, state)

    # stage-level wall accounting (reference's TimerOutputs taxonomy,
    # SPHCellList.jl:883-918); retrieve via sim.hourglass.report()
    hourglass = HourGlass()
    sim.hourglass = hourglass
    t_wall0 = time.perf_counter()
    if progress_callback is None:
        progress_callback = _default_progress(meta, t_wall0)
    intervals = 0
    try:
        while True:
            t_out = meta.output_time_for(counter)
            prev_iter = int(state.iteration)
            prev_state = state
            with hourglass.section("00 SimulationLoop"):
                state = sim.interval_fn(
                    state, jnp.asarray(t_out, dtype=state.total_time.dtype),
                    progress=progress_callback,
                )
                float(state.total_time)  # completion barrier

            overflow = _overflow_reason(sim.cfg, state)
            if overflow:
                if not auto_retune:
                    raise RuntimeError(overflow)
                with hourglass.section("02b Retune neighbor windows"):
                    new_sim, state = _retune(sim, prev_state, state)
                    # mutate the caller's Simulation in place so external
                    # references (checkpoint callbacks) see the grown windows
                    sim.cfg = new_sim.cfg
                    sim.state = new_sim.state
                    sim.interval_fn = new_sim.interval_fn
                    sim.hourglass = hourglass
                continue  # replay the same interval with bigger windows

            counter += 1
            intervals += 1

            if saver is not None:
                # enqueue only with the async saver: the transfer + HDF5
                # write overlap the next interval's device compute
                with hourglass.section("13 Save Particle Data"):
                    saver(counter, state)
            if log_callback is not None:
                tt = float(state.total_time)
                log_callback(
                    dict(
                        counter=counter,
                        total_time=tt,
                        iteration=int(state.iteration),
                        steps_in_interval=int(state.iteration) - prev_iter,
                        dt=float(state.current_dt),
                        wall_time=time.perf_counter() - t_wall0,
                    )
                )

            if float(state.total_time) > meta.simulation_time:
                break
            if max_intervals is not None and intervals >= max_intervals:
                break
    finally:
        try:
            if isinstance(saver, _AsyncSaver):
                with hourglass.section("13 Save Particle Data"):
                    saver.close()
        finally:
            # stop the watchdog even when close() raises - a still-armed
            # hard watchdog would os._exit(86) over the real error
            if save_wd is not None:
                save_wd.stop()

    sim.state = state
    return sim

"""The 12-stage symplectic predictor-corrector step, fully on device.

One output interval = one ``lax.while_loop`` whose body is the step below -
the TPU-native equivalent of ``SimulationLoop`` (reference
``src/SPHCellList.jl:727-805``).  The host only calls the jitted interval
function once per OutputTime and streams snapshots.

Stage numbering mirrors the reference's timer taxonomy (SURVEY.md section 3.2):

  00  dx accumulation (update_delta_x!, SPHCellList.jl:744,706-724)
  01  adaptive dt                         (:748)
  02  lazy neighbor rebuild when dx >= h  (:758-762)
  --  motion (dt/2)                       (:765)
  03  pressure from density               (:771)
  04  mDBC density correction             (:772)
  05  first neighbor sweep                (:774)
  06  half step predictor                 (:778)
  07  clamp rho_half at boundary          (:781)
  --  motion (dt/2)                       (:787)
  03b pressure from rho_half              (:789)
  08  second neighbor sweep               (:790)
  09  clamp density at boundary           (:794)
  10  symplectic density corrector        (:796)
  11  full step corrector (+ shifting)    (:798)
  12  time/iteration bookkeeping          (:800)
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..config import MDBCMode, ShiftingMode, SimulationMetaData
from ..models import equations as eq
from ..ops import cell_list as cl
from ..ops.interactions import PhysicsSpec, pair_sweep
from ..ops.mdbc import mdbc_density_correction
from ..ops.timestep import adaptive_dt
from ..parallel.context import SINGLE, CommContext
from ..state import SimulationState
from .motion import MotionTable, progress_motion


@dataclass(frozen=True)
class StepConfig:
    """Static compile-time bundle for the step function."""

    spec: PhysicsSpec
    meta: SimulationMetaData
    grid: cl.Grid
    cseg: int               # candidate capacity per stencil row (3 cells)
    block_size: int
    motion: MotionTable
    boundary_capacity: int  # number of mDBC ghost-carrying particles (static)
    ctx: CommContext = SINGLE  # sharded comm context (single-chip by default)
    # fused Pallas sweep (single-chip TPU hot path)
    use_pallas: bool = False
    mpc: int = 0            # self-window capacity (multiple of 8)
    maxc: int = 0           # occupied-cell list capacity
    pallas_interpret: bool = False  # CPU interpreter mode (tests)
    # sharded Pallas: halo rows exchanged with each slab neighbor per sweep
    # (multiple of 128; 0 = fall back to the all-gather XLA sweep)
    halo: int = 0
    # flat chunk-table capacity of the block-structured sweep (0 = use the
    # cell-pair program kernel instead).  Single-chip: sized for the whole
    # capacity.  Sharded with halo > 0: PER-DEVICE capacity - the sweeps run
    # the block kernel on halo-extended windows (pallas_block_sweep_sharded).
    ct_cap: int = 0


def _sweep(cfg: StepConfig, p, cell_start, position, density, pressure, velocity,
           idx_base, tables=None, btables=None):
    """Dispatch one neighbor sweep to the Pallas or XLA path."""
    if cfg.use_pallas and not cfg.ctx.is_sharded and cfg.ct_cap > 0:
        from ..ops.pallas_block_sweep import pallas_block_sweep

        return pallas_block_sweep(
            cfg.spec, cfg.grid, cfg.ct_cap,
            p, cell_start, position, density, pressure, velocity,
            tables=btables, interpret=cfg.pallas_interpret,
        )
    if cfg.use_pallas and not cfg.ctx.is_sharded:
        from ..ops.pallas_sweep import pallas_pair_sweep

        return pallas_pair_sweep(
            cfg.spec, cfg.grid, cfg.mpc, cfg.cseg, cfg.maxc,
            p, cell_start, position, density, pressure, velocity,
            tables=tables, interpret=cfg.pallas_interpret,
        )
    if cfg.use_pallas and cfg.ctx.is_sharded and cfg.halo > 0 and cfg.ct_cap > 0:
        from ..ops.pallas_block_sweep import pallas_block_sweep_sharded

        return pallas_block_sweep_sharded(
            cfg.spec, cfg.grid, cfg.ct_cap, cfg.halo,
            p, cell_start, position, density, pressure, velocity, cfg.ctx,
            tables=btables, interpret=cfg.pallas_interpret,
        )
    if cfg.use_pallas and cfg.ctx.is_sharded and cfg.halo > 0:
        from ..ops.pallas_sweep import pallas_pair_sweep_sharded

        return pallas_pair_sweep_sharded(
            cfg.spec, cfg.grid, cfg.mpc, cfg.cseg, cfg.maxc, cfg.halo,
            p, cell_start, position, density, pressure, velocity, cfg.ctx,
            tables=tables, interpret=cfg.pallas_interpret,
        )
    ctx = cfg.ctx
    return pair_sweep(
        cfg.spec, cfg.grid, cfg.cseg, cfg.block_size,
        p, cell_start,
        ctx.gather(position), ctx.gather(density),
        ctx.gather(pressure), ctx.gather(velocity),
        global_ml=ctx.gather(p.motion_limiter),
        local_position=position, local_density=density,
        local_pressure=pressure, local_velocity=velocity,
        idx_base=idx_base,
    )


def _gravity_acc(cfg: StepConfig, particles, acc):
    """acc += gravity on the last axis scaled by GravityFactor
    (reference HalfTimeStep/FullTimeStep, SPHCellList.jl:630,647)."""
    g_last = cfg.spec.constants.g * particles.gravity_factor
    return acc.at[..., -1].add(g_last)


def sph_step(cfg: StepConfig, state: SimulationState, dx_acc):
    """One symplectic step.  Returns (new_state, new_dx_acc)."""
    spec = cfg.spec
    c = spec.constants
    kern = spec.kernel
    meta = cfg.meta
    ctx = cfg.ctx
    p = state.particles

    # 00 - displacement accumulator: dx += 4 * max |pos_half - pos|
    # (sqrt AFTER the max: monotone + correctly rounded, so the scalar sqrt
    # is bitwise-identical to max(elementwise sqrt) at a lane's cost)
    disp2 = jnp.sum((state.position_half - p.position) ** 2, axis=-1)
    dx_acc = dx_acc + 4.0 * jnp.sqrt(ctx.pmax(jnp.max(disp2)))

    # 01 - adaptive dt
    dt = adaptive_dt(p.position, p.velocity, p.acceleration, c, kern, ctx)
    dt2 = dt * 0.5

    # 02 - lazy rebuild when dx >= h
    pallas_block = cfg.use_pallas and not ctx.is_sharded and cfg.ct_cap > 0
    pallas_single = cfg.use_pallas and not ctx.is_sharded and not pallas_block
    pallas_halo = cfg.use_pallas and ctx.is_sharded and cfg.halo > 0

    def do_rebuild(p_in):
        # grid-escape telemetry: active particles whose UNCLAMPED cell coords
        # fall outside the static grid would be silently clamped into edge
        # cells (wrong physics - the reference's Dict grid is unbounded,
        # SPHCellList.jl:144-162); count them so the driver can re-grid and
        # replay the interval instead
        raw = cl.cell_coords(p_in.position, kern.H_inv)
        esc = ctx.psum(jnp.sum(
            jnp.any(raw != cl.clamp_coords(raw, cfg.grid), axis=-1)
            & p_in.active
        ).astype(jnp.int32))
        if pallas_halo:
            # distributed rebuild: local stable sort + 1-hop row migration -
            # no global gather, no replicated argsort (O(C + halo) peak)
            sorted_p, cell_start, occ, migration = cl.rebuild_sharded(
                p_in, kern.H_inv, cfg.grid, ctx, cfg.halo
            )
        else:
            sorted_p, cell_start, occ = cl.rebuild(p_in, kern.H_inv, cfg.grid, ctx)
            migration = jnp.zeros((), jnp.int32)
        cap = sorted_p.capacity
        base = ctx.rank() * cap
        nblk = (base + jnp.arange(cap, dtype=jnp.int32)) // cfg.block_size
        sorted_p = sorted_p.replace(chunk_id=nblk)
        seg = cl.max_row_segment(cell_start, cfg.grid)
        counts = cell_start[1 : cfg.grid.ncells + 1] - cell_start[: cfg.grid.ncells]
        ncc = jnp.sum(counts > 0).astype(jnp.int32)
        halo_need = state.max_halo
        btables = state.block_tables
        if pallas_block:
            from ..ops.pallas_block_sweep import make_block_tables

            tables = state.pallas_tables
            btables = make_block_tables(
                cell_start, sorted_p.cell, sorted_p.active, cfg.grid,
                cap, cfg.ct_cap,
            )
        elif pallas_single:
            from ..ops.pallas_sweep import make_program_tables, sweep_rows

            tables = make_program_tables(
                cell_start, cfg.grid, cfg.maxc, sweep_rows(cfg.mpc), cap,
                sorted_p.cell, sorted_p.active, cfg.mpc, pair=True,
            )
        elif pallas_halo:
            if cfg.ct_cap > 0:
                # sharded block sweep: per-device tables in halo-extended
                # coordinates, global sorted indices for the role quirk;
                # chunk_total rides the replicated telemetry (pmax)
                from ..ops.pallas_block_sweep import make_block_tables

                tables = state.pallas_tables
                btables = make_block_tables(
                    cell_start, sorted_p.cell, sorted_p.active, cfg.grid,
                    cap, cfg.ct_cap, ext_off=base - cfg.halo,
                    ext_capacity=cap + 2 * cfg.halo, idx0=base,
                )
                btables = btables.replace(
                    chunk_total=ctx.pmax(btables.chunk_total)
                )
            else:
                from ..ops.pallas_sweep import (make_local_program_tables,
                                                sweep_rows)

                tables = make_local_program_tables(
                    cell_start, cfg.grid, cfg.maxc, sweep_rows(cfg.mpc), base,
                    cap, cap + 2 * cfg.halo, sorted_p.cell, sorted_p.active,
                    cfg.mpc, pair=True,
                )
            # halo telemetry: furthest sorted-row reach of any live local
            # stencil window past the slab boundaries (empty segments have
            # start == end == 0 and must not count)
            starts, ends = cl.row_segments(sorted_p.cell, cfg.grid, cell_start)
            live_seg = sorted_p.active[:, None] & (ends > starts)
            lneed = jnp.max(jnp.where(live_seg, base - starts, 0))
            rneed = jnp.max(jnp.where(live_seg, ends - (base + cap), 0))
            need = jnp.maximum(jnp.maximum(lneed, rneed), 0)
            if meta.mdbc is MDBCMode.SIMPLE:
                # the sharded mDBC kernel reads its ghost-point stencils from
                # the same halo: ghost windows can reach ~one cell further
                # than the particle's own (ghost = particle + normal), so
                # their reach rides the telemetry too
                gp_pts = sorted_p.ghost_points
                has_g = jnp.any(gp_pts != 0, axis=-1) & sorted_p.active
                g_coords = cl.clamp_coords(
                    cl.cell_coords(gp_pts, kern.H_inv), cfg.grid
                )
                gs, ge = cl.row_segments(g_coords, cfg.grid, cell_start)
                live_g = has_g[:, None] & (ge > gs)
                need = jnp.maximum(
                    need, jnp.max(jnp.where(live_g, base - gs, 0))
                )
                need = jnp.maximum(
                    need, jnp.max(jnp.where(live_g, ge - (base + cap), 0))
                )
            # the migration count of the distributed rebuild rides the same
            # telemetry: both must stay within the sized halo
            halo_need = ctx.pmax(
                jnp.maximum(need, migration)
            ).astype(jnp.int32)
        else:
            tables = state.pallas_tables
        return (sorted_p, cell_start, occ, seg, ncc, jnp.zeros_like(dx_acc),
                tables, btables, halo_need, esc)

    def no_rebuild(p_in):
        return (p_in, state.cell_start, state.max_occupancy, state.max_segment,
                state.occupied_cells, dx_acc, state.pallas_tables,
                state.block_tables, state.max_halo, state.grid_escapes)

    (p, cell_start, occ, seg, ncc, dx_acc, tables, btables, halo_need,
     escapes) = jax.lax.cond(dx_acc >= kern.h, do_rebuild, no_rebuild, p)
    occ = jnp.maximum(occ, state.max_occupancy)
    seg = jnp.maximum(seg, state.max_segment)
    ncc = jnp.maximum(ncc, state.occupied_cells)
    halo_need = jnp.maximum(halo_need, state.max_halo)
    escapes = jnp.maximum(escapes, state.grid_escapes)
    mchunks = jnp.maximum(state.max_chunks, btables.chunk_total)

    # -- motion (first half, reference :765)
    pos, vel = progress_motion(cfg.motion, p, state.total_time, dt2)
    p = p.replace(position=pos, velocity=vel)

    # 03 - pressure from current density (quirk: computed BEFORE the mDBC
    # correction mutates density; the first sweep therefore pairs corrected
    # densities with pre-correction pressures, as the reference does).
    p = p.replace(pressure=eq.pressure(p.density, c))

    # 04 - mDBC: fused Pallas moment kernel single-chip AND on the sharded
    # halo path (1-hop exchange of the three mDBC fields - no per-step
    # all-gather); the gather loop only under the all-gather fallback
    if meta.mdbc is MDBCMode.SIMPLE:
        if pallas_halo:
            from ..ops.mdbc import mdbc_density_correction_sharded

            p = p.replace(
                density=mdbc_density_correction_sharded(
                    spec, cfg.grid, cfg.cseg, p, cell_start,
                    cfg.boundary_capacity, ctx, cfg.halo, cfg.mpc,
                    pallas_interpret=cfg.pallas_interpret,
                )
            )
        else:
            # global_* only under the sharded all-gather fallback: for the
            # SINGLE ctx gather is identity, and handing the (non-None)
            # locals to the pallas path trips its local-fields guard
            p = p.replace(
                density=mdbc_density_correction(
                    spec, cfg.grid, cfg.cseg, p, cell_start, cfg.boundary_capacity,
                    global_position=ctx.gather(p.position) if ctx.is_sharded else None,
                    global_density=ctx.gather(p.density) if ctx.is_sharded else None,
                    global_ptype=ctx.gather(p.ptype) if ctx.is_sharded else None,
                    # the fused moment kernel serves BOTH single-chip sweep
                    # paths (it only needs the mpc/cseg windows, which every
                    # pallas config sizes) - tying it to the cell-pair path
                    # alone silently re-inherited the 300x-slower gather
                    # loop whenever the block sweep was selected
                    use_pallas=pallas_single or pallas_block,
                    mpc=cfg.mpc,
                    pallas_interpret=cfg.pallas_interpret,
                )
            )

    idx_base = ctx.rank() * p.capacity

    # 05 - first neighbor sweep (predictor forces)
    with jax.named_scope("05_first_neighbor_sweep"):
        out1 = _sweep(cfg, p, cell_start, p.position, p.density, p.pressure,
                  p.velocity, idx_base, tables, btables)

    # 06 - half step predictor (reference HalfTimeStep, :624-638)
    acc = _gravity_acc(cfg, p, out1.acceleration)
    ml = p.motion_limiter[:, None]
    pos_half = p.position + p.velocity * dt2 * ml
    vel_half = p.velocity + acc * dt2 * ml
    rho_half = p.density + out1.drhodt * dt2
    p = p.replace(acceleration=acc)

    # 07 - clamp rho_half at boundaries
    rho_half = eq.limit_density_at_boundary(rho_half, c.rho0, p.motion_limiter)

    # -- motion (second half, reference :787)
    pos, vel = progress_motion(cfg.motion, p, state.total_time, dt2)
    p = p.replace(position=pos, velocity=vel)

    # 03b - pressure from rho_half
    p = p.replace(pressure=eq.pressure(rho_half, c))

    # 08 - second neighbor sweep (corrector forces, on half-step fields)
    with jax.named_scope("08_second_neighbor_sweep"):
        out2 = _sweep(cfg, p, cell_start, pos_half, rho_half, p.pressure, vel_half,
                  idx_base, tables, btables)

    # 09 - clamp density at boundaries (before the corrector, reference :794)
    density = eq.limit_density_at_boundary(p.density, c.rho0, p.motion_limiter)

    # 10 - symplectic density corrector
    density = eq.density_epsi(density, out2.drhodt, rho_half, dt)

    # 11 - full step corrector (reference FullTimeStep, :640-677)
    acc2 = _gravity_acc(cfg, p, out2.acceleration)
    vel_new = p.velocity + acc2 * dt * ml
    mid_vel = 0.5 * (vel_new + (vel_new - acc2 * dt * ml))
    dpos = mid_vel * dt
    if meta.shifting is ShiftingMode.PLANAR:
        # Fickian shifting with free-surface scaling (reference :654-677):
        # A=2, A_FST=0, A_FSM=D; shift disabled where the scaling is negative.
        A_coef, A_fst = 2.0, 0.0
        A_fsm = float(p.dims)
        a_fsc = (out2.div_r - A_fst) / (A_fsm - A_fst)
        vmag = jnp.sqrt(jnp.sum(vel_new * vel_new, axis=-1))
        delta_x = (-a_fsc * A_coef * kern.h * vmag * dt)[:, None] * out2.grad_c
        delta_x = jnp.where(a_fsc[:, None] < 0, jnp.zeros_like(delta_x), delta_x)
        dpos = dpos + delta_x
    pos_new = p.position + dpos * ml

    updates = dict(
        position=pos_new,
        velocity=vel_new,
        acceleration=acc2,
        density=density,
    )
    if out2.kernel_w is not None:
        updates["kernel_w"] = out2.kernel_w
        updates["kernel_grad"] = out2.kernel_grad
    p = p.replace(**updates)

    # 12 - bookkeeping
    new_state = state.replace(
        particles=p,
        cell_start=cell_start,
        total_time=state.total_time + dt,
        current_dt=dt,
        iteration=state.iteration + 1,
        max_occupancy=occ,
        max_segment=seg,
        occupied_cells=ncc,
        position_half=pos_half,
        pallas_tables=tables,
        max_halo=halo_need,
        block_tables=btables,
        max_chunks=mchunks,
        grid_escapes=escapes,
    )
    return new_state, dx_acc


def _check_interval_progress(state: SimulationState, t_out, it_before: int) -> None:
    """Fail loudly instead of spinning when the state diverges.

    A NaN ``total_time`` makes the while-loop cond (``t <= t_out``) false, so
    a chunk returns instantly having taken zero steps — and the host exit test
    (``t > t_out``) is also false for NaN, which used to busy-loop forever."""
    import math

    t = float(state.total_time)
    if not math.isfinite(t):  # NaN, or +inf via f32 overflow without a NaN
        raise FloatingPointError(
            f"simulation diverged: total_time is {t} at iteration "
            f"{int(state.iteration)}"
        )
    if t <= float(t_out) and int(state.iteration) == it_before:
        raise FloatingPointError(
            f"simulation stalled: no steps taken at t={t} < t_out="
            f"{float(t_out)} (non-finite dt or state)"
        )


def make_interval_fn(cfg: StepConfig):
    """Build the per-output-interval function.

    Runs steps while ``total_time <= t_out`` (reference SPHCellList.jl:742),
    with the displacement accumulator freshly initialized to 1 + h so the
    first step of every interval rebuilds the cell list (reference :739).

    ``meta.max_steps_per_call`` bounds the steps executed inside a single
    device program; the host loops chunks until the output time is crossed
    (the displacement accumulator carries across chunks, so the trajectory is
    identical to one unbounded while_loop).  Unbounded single executions of
    many minutes can trip remote-worker watchdogs (observed on the tunneled
    TPU), and the cap also keeps the host responsive.
    """
    return make_chunk_loop(cfg, jax.jit(make_chunk_body(cfg)))


def make_chunk_body(cfg: StepConfig):
    """The bounded step while-loop of ONE device program - shared verbatim
    by the single-chip (jit) and sharded (shard_map) interval functions so
    the ``max_steps_per_call`` semantics can never diverge between them."""
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

    return chunk_body


def make_chunk_loop(cfg: StepConfig, chunk):
    """Host loop driving ``chunk(state, t_out, dx_acc)`` calls until the
    output time is crossed - shared by the single-chip and sharded interval
    functions (``parallel/mesh.py``), so both get the progress spinner AND
    the device-call watchdog."""
    wd_timeout = getattr(cfg.meta, "device_call_timeout", None)
    # the FIRST chunk call of this interval_fn traces + compiles (minutes on
    # the tunneled chip for big kernels) - the watchdog must not count that
    # as a stalled transport, so arming starts after one completed chunk.
    # A retune rebuilds interval_fn, resetting the warm flag for its own
    # recompile.
    warm = [False]

    def interval(state: SimulationState, t_out, progress=None) -> SimulationState:
        """``progress(state)`` fires after every device chunk - the host-side
        analog of the reference's in-interval ProgressMeter spinner
        (SPHCellList.jl:870-907).  With ``meta.device_call_timeout`` set, a
        watchdog turns a hung device call (stalled transport) into a loud
        warning - or a clean exit-86 with ``meta.watchdog_hard`` so a
        supervisor can restart from the last checkpoint (utils/watchdog.py)."""
        wd = None
        if wd_timeout:
            from ..utils.watchdog import DeviceWatchdog

            wd = DeviceWatchdog(
                wd_timeout, hard=getattr(cfg.meta, "watchdog_hard", False),
                context="device chunk",
            )
        try:
            dx = jnp.asarray(1.0 + cfg.spec.kernel.h,
                             dtype=state.total_time.dtype)
            while True:
                it_before = int(state.iteration)
                if wd is not None and warm[0]:
                    wd.arm(f"from iteration {it_before}")
                state, dx = chunk(state, t_out, dx)
                done = float(state.total_time) > float(t_out)
                if wd is not None:
                    wd.disarm()
                warm[0] = True
                _check_interval_progress(state, t_out, it_before)
                if done:
                    return state
                if progress is not None:
                    progress(state)
        finally:
            if wd is not None:
                wd.stop()

    return interval


def make_fixed_steps_fn(cfg: StepConfig, n_steps: int):
    """Benchmark helper: run exactly ``n_steps`` steps under one jit."""

    def run(state: SimulationState) -> SimulationState:
        dx0 = jnp.asarray(1.0 + cfg.spec.kernel.h, dtype=state.total_time.dtype)

        def body(_, carry):
            s, dx_acc = carry
            return sph_step(cfg, s, dx_acc)

        final, _ = jax.lax.fori_loop(0, n_steps, body, (state, dx0))
        return final

    return jax.jit(run)

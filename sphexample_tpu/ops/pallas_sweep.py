"""Fused Pallas pair-interaction kernel - the TPU hot path.

Replaces the per-particle XLA gather sweep with a per-*cell* kernel that
amortizes candidate traffic across all particles of a cell (the reference's
cell-centric ``NeighborLoop!`` reimagined for VMEM, reference
``src/SPHCellList.jl:168-217``):

  * one grid program per occupied (cell-PAIR, row-chunk) - two x-adjacent
    occupied cells merge into one program (paired by x-parity, so the
    structure is deterministic under sharding); the compacted program
    tables are pure functions of ``cell_start`` and are built once per lazy
    rebuild (``make_program_tables``, carried in the state), not per sweep,
  * the sweep fields are packed twice in HBM: ``[F, N]`` lane-major for
    candidate segments and ``[N, F]`` row-major for the self window (pos,
    vel, rho, pressure, motion limiter); each program DMAs its self rows
    ``[R + 8, F]`` (8-aligned, one cheap sublane roll) plus S = 3^(D-1)
    stencil-row candidate segments ``[F, CSEG + 128]`` into VMEM,
  * candidates are indexed IN PLACE in their 128-aligned windows - no lane
    rolls (measured ~1/3 of sweep time) and no per-field transposes; lane
    validity masks fold into the kernel-gradient factor g, and trailing
    128-lane chunks are predicated off,
  * all pair math runs on ``[R, 128]`` VPU tiles (sublane = self particle,
    lane = candidate), accumulating drho/acc (+ optional kernel/shifting
    sums) in VMEM,
  * outputs are written per (cell, chunk) block ``[maxp, R]`` - no write
    races by construction - and gathered back to particle order with one
    XLA gather.

Candidate HBM traffic drops from O(N * S * CSEG) to O(ncells * S * CSEG),
i.e. by the mean cell occupancy (tens of x).

The physics is identical to ``ops/interactions.py`` (each pair computed from
both endpoints, cell-centric diffusion role-order quirk - see
models/density_diffusion.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import KernelOutputMode, ShiftingMode
from ..state import PallasTables
from .cell_list import Grid, linearize, stencil_rows
from .interactions import PhysicsSpec, SweepOut

# packed field rows (D == 3): px py pz vx vy vz rho pres ml
# for D == 2 the z rows are absent: px pz vx vz rho pres ml


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def prog_rows(mpc: int) -> int:
    """Self rows per program: cells larger than this get extra chunk programs."""
    return min(mpc, 32)


def sweep_rows(mpc: int) -> int:
    """Self rows per SWEEP program: twice the chunk rows, covering a cell
    PAIR (two x-adjacent occupied cells merged into one program - halves the
    launch floor and the per-segment DMA/bookkeeping).  The kernel computes
    the two halves as predicated 32-row sub-tiles, so an unpaired or small
    cell pays no dead-row lanes beyond the old single-cell fill."""
    return 2 * prog_rows(mpc)


# Trace-time toggle: predicate trailing candidate chunks (skip their VPU
# work) vs compute them masked.  Measured on-chip per kernel change.
PREDICATE_CHUNKS = True

# Candidate chunk width in lanes (multiple of 128).  256 halves the
# per-chunk fixed overhead (branch + scalar bookkeeping, ~50 cycles/chunk)
# for ~18% more masked lanes at typical segment fill - measured on-chip.
CHUNK_W = 256


def pack_fields(position, velocity, density, pressure, ml):
    """Packed sweep fields, twice: ``[F_pad, N]`` (lane-major, for candidate
    segments) and ``[N, F_pad]`` (row-major, for the per-program self window -
    self rows are DMA'd directly in column orientation, so the kernel never
    transposes).  The field axis is padded to a multiple of 8 so VMEM slices
    meet the sublane tiling."""
    cols = [position[:, d] for d in range(position.shape[1])]
    cols += [velocity[:, d] for d in range(velocity.shape[1])]
    cols += [density, pressure, ml]
    pad = _round_up(len(cols), 8) - len(cols)
    cols += [jnp.zeros_like(density)] * pad
    packed = jnp.stack(cols, axis=0)
    # the row-major copy is padded to full 128 lanes: Mosaic cannot slice a
    # partial lane tile out of HBM for the self-window DMA (tiled (1,128)
    # layout), and the padding costs ~0.1 ms/sweep of HBM writes at 160k
    # particles - noise next to the kernel.
    packedT = jnp.pad(packed.T, ((0, 0), (0, 128 - len(cols))))
    return packed, packedT


def make_program_tables(cell_start, grid: Grid, maxc: int, R: int,
                        capacity: int, cells, active, mpc: int,
                        pair: bool = False) -> PallasTables:
    """Compacted (cell, row-chunk) program tables from ``cell_start``.

    Pure function of the cell list (and of the rebuild-sorted particle
    order), so it runs once per lazy rebuild (carried in
    ``SimulationState.pallas_tables``), not per sweep: the nonzero / cumsum /
    scatter prelude is O(ncells) and measured ~26% of sweep wall time when
    recomputed every call; the per-particle gather-back indices ride along.

    Each occupied cell gets ``ceil(count / R)`` consecutive programs - no
    dead chunk programs, and the grid size is bounded by
    ``maxc + capacity // R`` regardless of occupancy skew.
    """
    ncells = grid.ncells
    counts = cell_start[1 : ncells + 1] - cell_start[:ncells]
    t = _tables_from_counts(counts, counts, grid, maxc, R,
                            maxc + capacity // R + 1, pair=pair)
    return _with_gather_indices(t, cell_start, cells, active, 0, grid, mpc, R)


def make_local_program_tables(cell_start, grid: Grid, maxc: int, R: int,
                              base, local_rows: int, ext_capacity: int,
                              cells, active, mpc: int,
                              pair: bool = False) -> PallasTables:
    """Per-device program tables under ``shard_map`` (halo-exchange path).

    A device enumerates programs for every cell whose sorted rows intersect
    its local slab ``[base, base + local_rows)``; straddling boundary cells
    are computed in full (their non-local rows land in the halo and are
    simply never gathered - at most ~one cell of duplicated work per slab
    boundary).  ``nprog`` comes back as shape [1] so it shards over the
    device axis.
    """
    ncells = grid.ncells
    counts_full = cell_start[1 : ncells + 1] - cell_start[:ncells]
    lo = jnp.clip(cell_start[:ncells] - base, 0, local_rows)
    hi = jnp.clip(cell_start[1 : ncells + 1] - base, 0, local_rows)
    t = _tables_from_counts(hi - lo, counts_full, grid, maxc, R,
                            maxc + ext_capacity // R + 1, pair=pair)
    halo = (ext_capacity - local_rows) // 2
    cs_ext = jnp.clip(cell_start - (base - halo), 0, ext_capacity)
    t = _with_gather_indices(t, cs_ext, cells, active, halo, grid, mpc, R)
    return t.replace(nprog=t.nprog[None])


def _with_gather_indices(t: PallasTables, cell_start_k, cells, active, idx0,
                         grid: Grid, mpc: int, R: int) -> PallasTables:
    """Attach the particle-row -> (program block, row) gather indices -
    rebuild-constant, so computed here rather than per sweep."""
    ncells = grid.ncells
    maxp = t.prog_slot.shape[0]
    keys_p = linearize(cells, grid)
    keys_p = jnp.where(active, keys_p, ncells)
    slot = t.slot_of_cell[jnp.minimum(keys_p, ncells)]
    # rank is measured from the slot's LEAD cell start (== own cell start
    # for unpaired slots; for the partner cell of a pair the lead sits one
    # key lower and the pair's rows are contiguous in sorted order)
    lead = jnp.minimum(t.occ_keys[slot] >> 1, ncells - 1)
    s0 = jnp.where(keys_p < ncells, cell_start_k[lead], 0)
    n_local = cells.shape[0]
    # rank must NOT be clipped to the window budget: chunked programs cover
    # ANY cell occupancy (ceil(count/R) chunks), and clipping aliases every
    # high-rank entry onto one block row (observed as identical wrong mDBC
    # moments for all ghosts past mpc in a crowded ghost cell).  Inactive
    # entries produce huge ranks; the prog_idx clip keeps them in bounds and
    # their values are masked by `active` downstream.
    rank = jnp.maximum(
        (idx0 + jnp.arange(n_local, dtype=jnp.int32)) - s0, 0
    )
    prog_idx = jnp.clip(t.prog_base[slot] + rank // R, 0, maxp - 1)
    return t.replace(
        prog_idx=prog_idx.astype(jnp.int32),
        row_idx=(rank % R).astype(jnp.int32),
    )


def _tables_from_counts(counts_select, counts_prog, grid: Grid, maxc: int,
                        R: int, maxp: int, pair: bool = False) -> PallasTables:
    """Shared table construction: cells with ``counts_select > 0`` get
    ``ceil(rows / R)`` consecutive programs each.

    ``pair=True`` (sweep only): x-adjacent occupied cells {k, k+1} with
    ``x(k)`` EVEN merge into one slot covering both cells' contiguous sorted
    rows.  Pairing by x-PARITY (not occ-list position) is deterministic
    under sharding: a device whose slab intersects only one cell of a pair
    still builds the identical pair (the selection is widened to whole pair
    units), so per-chunk accumulation boundaries - and therefore f32 sums -
    match the single-chip kernel exactly.
    """
    ncells = grid.ncells
    sel = counts_select > 0
    if pair:
        nx = grid.shape[0]
        occ_full = counts_prog > 0
        nxt = jnp.concatenate(
            [occ_full[1:], jnp.zeros((1,), bool)]
        )
        xidx = jnp.arange(ncells, dtype=jnp.int32) % nx
        pairable = occ_full & nxt & (xidx % 2 == 0) & (xidx < nx - 1)
        partner = jnp.concatenate([jnp.zeros((1,), bool), pairable[:-1]])
        sel_prev = jnp.concatenate([jnp.zeros((1,), bool), sel[:-1]])
        sel_next = jnp.concatenate([sel[1:], jnp.zeros((1,), bool)])
        sel = (sel | (sel_next & pairable) | (sel_prev & partner)) & ~partner

    (occ_keys,) = jnp.nonzero(sel, size=maxc, fill_value=ncells)
    occ_valid = occ_keys < ncells
    k = jnp.minimum(occ_keys, ncells - 1)

    if pair:
        slot_pair = occ_valid & pairable[k]
        cnt_b = jnp.where(
            slot_pair, counts_prog[jnp.minimum(k + 1, ncells - 1)], 0
        )
        counts_occ = jnp.where(occ_valid, counts_prog[k] + cnt_b, 0)
    else:
        slot_pair = jnp.zeros((maxc,), bool)
        counts_occ = jnp.where(occ_valid, counts_prog[k], 0)

    nch = -(-counts_occ // R)                                  # live chunks/slot
    offsets = jnp.cumsum(nch)                                  # [maxc]
    prog_base = (offsets - nch).astype(jnp.int32)              # slot -> first prog
    prog_slot = jnp.clip(
        jnp.searchsorted(offsets, jnp.arange(maxp, dtype=offsets.dtype), side="right"),
        0, maxc - 1,
    ).astype(jnp.int32)                                        # prog -> slot
    slot_of_cell = jnp.zeros((ncells + 1,), jnp.int32).at[occ_keys].set(
        jnp.arange(maxc, dtype=jnp.int32), mode="drop"
    )
    if pair:
        # the partner cell resolves to the pair's slot (gather-back ranks
        # are measured from the LEAD cell's first row)
        partner_keys = jnp.where(slot_pair, occ_keys + 1, ncells + 1)
        slot_of_cell = slot_of_cell.at[partner_keys].set(
            jnp.arange(maxc, dtype=jnp.int32), mode="drop"
        )
    z = jnp.zeros((0,), jnp.int32)
    # the pair flag rides occ_keys' bit 0 (key encoded as 2*key + pair):
    # a fifth SMEM prefetch array measured OVER the 1 MB scoped-SMEM cap at
    # the 430k-particle scale (the four arrays already total ~968 KB there)
    occ_enc = occ_keys.astype(jnp.int32) * 2 + slot_pair.astype(jnp.int32)
    return PallasTables(
        occ_keys=occ_enc, prog_base=prog_base,
        prog_slot=prog_slot, slot_of_cell=slot_of_cell,
        nprog=jnp.minimum(offsets[-1], maxp).astype(jnp.int32),
        prog_idx=z, row_idx=z, slot_pair=slot_pair.astype(jnp.int32),
    )


def init_program_tables(grid: Grid, maxc: int, R: int, capacity: int,
                        local_rows: "int | None" = None) -> PallasTables:
    """Zero-filled tables with the shapes ``make_program_tables`` produces
    (the first step of every interval rebuilds, so these are never swept).
    ``local_rows`` sizes the gather indices when ``capacity`` is the
    halo-extended window (sharded path)."""
    maxp = maxc + capacity // R + 1
    nloc = capacity if local_rows is None else local_rows
    return PallasTables(
        occ_keys=jnp.zeros((maxc,), jnp.int32),
        prog_base=jnp.zeros((maxc,), jnp.int32),
        prog_slot=jnp.zeros((maxp,), jnp.int32),
        slot_of_cell=jnp.zeros((grid.ncells + 1,), jnp.int32),
        nprog=jnp.zeros((), jnp.int32),
        prog_idx=jnp.zeros((nloc,), jnp.int32),
        row_idx=jnp.zeros((nloc,), jnp.int32),
        slot_pair=jnp.zeros((maxc,), jnp.int32),
    )


def _grad_w_factor(kern, q, d, scale=1.0):
    """Scalar gradient factor g with grad_W = g * x_ij, on [MPC, CSEG] tiles.

    Wendland C2: alpha_d 5 (q-2)^3 / (8 h^2)  (reference SPHKernels.jl:80-87).
    Cubic spline: dW/dq / (h (|x|+eta^2))     (reference SPHKernels.jl:94-110).

    The kernel-support cutoff is built in: Wendland clamps t = min(q-2, 0)
    (bitwise-identical to select-masking on d2 <= H2, since both read the
    same f32 q; at q == 2 exactly both give 0), the cubic dW/dq chain
    already selects 0 past q = 2.  Callers therefore need no d2 cutoff on
    any g-proportional term.  ``scale`` folds a constant (e.g. m0) into the
    factor at no per-pair cost.
    """
    from ..config import KernelFamily

    aD = kern.alpha_d
    if kern.family is KernelFamily.WENDLAND_C2:
        t = jnp.minimum(q - 2.0, 0.0)
        return (aD * 5.0 * scale / (8.0 * kern.h * kern.h)) * (t * t * t)
    dwdq_inner = aD * (-3.0 * q + 2.25 * q * q)
    t2 = 2.0 - q
    dwdq_outer = aD * (-0.75) * (t2 * t2)
    dwdq = jnp.where(
        q <= 1.0, dwdq_inner, jnp.where(q <= 2.0, dwdq_outer, jnp.zeros_like(q))
    )
    return dwdq * (kern.h_inv * scale) / (d + kern.eta2)


def _w_value(kern, q):
    from ..config import KernelFamily

    aD = kern.alpha_d
    if kern.family is KernelFamily.WENDLAND_C2:
        t = 1.0 - 0.5 * q
        t2 = t * t
        return aD * (t2 * t2) * (2.0 * q + 1.0)
    inner = (1.0 - 1.5 * q * q + 0.75 * q * q * q) * (q <= 1.0)
    t = 2.0 - q
    outer = 0.25 * (t * t * t) * ((q > 1.0) & (q <= 2.0))
    return aD * (inner + outer)


def diffusion_rr_scale(spec: PhysicsSpec) -> float:
    """The trace-time constant C_d that multiplies the LINEAR /
    ZERO_GRAVITY_LINEAR diffusion numerator in :func:`_pair_math` -
    EXACTLY the expression the kernel uses (m0-fold and the artificial-
    viscosity 1/C_pi compensation included), so pack-time pre-scaling of
    the ``rr`` column (``rr_scaled=True``) removes one full-tile multiply
    per chunk with identical physics."""
    from ..config import (DensityDiffusionModel, KernelOutputMode,
                          ShiftingMode, ViscosityModel)

    if spec.diffusion not in (DensityDiffusionModel.LINEAR,
                              DensityDiffusionModel.ZERO_GRAVITY_LINEAR):
        return 1.0
    c = spec.constants
    kern = spec.kernel
    need_gw = (spec.kernel_output is KernelOutputMode.STORE
               or spec.shifting is ShiftingMode.PLANAR
               or spec.viscosity is ViscosityModel.LAMINAR_SPS)
    m0x = 1.0 if not need_gw else c.m0
    C_pi = 2.0 * c.alpha * c.c0 * kern.h * m0x
    diff_scale = (1.0 / C_pi
                  if spec.viscosity is ViscosityModel.ARTIFICIAL
                  and C_pi != 0.0 else 1.0)
    return -2.0 * c.delta_sph * kern.h * c.c0 * m0x * diff_scale


def _pair_math(spec: PhysicsSpec, dims, self_f, cand_f, i_is_role_i, within,
               rcps=None, p_is_pq=False, rr=None, rr_scaled=False):
    """All per-pair physics on [R, L] tiles (sublane = self particle, lane =
    candidate) - plain VPU elementwise ops that Mosaic lowers directly.

    Written to minimize *full-tile* op count:

    * self-only quantities stay [R, 1] columns and candidate-only quantities
      stay [1, L] rows (a fraction of the vreg cost of a full tile);
    * grad_W = g * x_ij is never materialized on the default path - every
      dot product with grad_W collapses to a scalar: x_ij.gw = g*d2,
      v_ij.gw = g*(v.x) - so momentum/viscosity/diffusion reduce to one
      coefficient times x_ij (gw is built only for SPS / kernel-output /
      shifting modes);
    * reciprocals of per-particle densities are rank-1 ([1,L] / [R,1]), not
      full-tile divisions;
    * the pair mask is folded into the kernel-gradient factor ``g`` once,
      and the kernel-support cutoff itself is FREE (built into
      ``_grad_w_factor``: Wendland clamps min(q-2, 0), cubic's dW/dq chain
      already selects 0 past q = 2) - ``within`` carries only table/window
      validity, no d2 test;
    * on the default (no-gw) path the constant m0 is folded into g at trace
      time - every output term (continuity, diffusion D, momentum,
      viscosity) carries exactly one factor of m0 - and the artificial-
      viscosity constant 2 alpha c0 h rides the fused reciprocal while
      C_d / (2 alpha c0 h) rides g_d2, so no per-pair constant multiplies
      remain;
    * ``p_is_pq`` callers pack p/rho instead of p: the pressure factor
      (p_i + p_j)/(rho_i rho_j) becomes pq_i rcp_j + pq_j rcp_i (and the
      cubic tensile term loses a squaring);
    * ``rr`` callers pack rho + C_lin z: the LINEAR-diffusion numerator
      rho_j - rho_i - rho_h collapses to rr_j - rr_i.

    The physics mirrors ops/interactions.py exactly (which in turn mirrors
    ComputeInteractions!, reference SPHCellList.jl:268-317); the interpret
    parity test vs the XLA path guards equivalence of this re-expression.
    """
    from ..config import DensityDiffusionModel, KernelFamily, ViscosityModel

    kern = spec.kernel
    c = spec.constants

    pos_i = self_f[:dims]                                       # [R, 1] each
    vel_i = self_f[dims : 2 * dims]
    rho_i, p_i, ml_i = self_f[2 * dims], self_f[2 * dims + 1], self_f[2 * dims + 2]
    pos_j = cand_f[:dims]                                       # [1, L] each
    vel_j = cand_f[dims : 2 * dims]
    rho_j, p_j, ml_j = cand_f[2 * dims], cand_f[2 * dims + 1], cand_f[2 * dims + 2]

    want_kernel = spec.kernel_output is KernelOutputMode.STORE
    want_shift = spec.shifting is ShiftingMode.PLANAR
    vm = spec.viscosity
    need_gw = want_kernel or want_shift or vm is ViscosityModel.LAMINAR_SPS
    # m0 folds into g when gw is not materialized (every default-path output
    # is proportional to g and carries exactly one m0); the gw paths (SPS
    # tensor, kernel output, shifting) need the bare kernel gradient, so
    # they keep the explicit per-term factor ``m0x`` instead.
    fold_m0 = not need_gw
    m0x = 1.0 if fold_m0 else c.m0

    xij = [pos_i[d] - pos_j[d] for d in range(dims)]
    vij = [vel_i[d] - vel_j[d] for d in range(dims)]
    d2 = sum(x * x for x in xij)

    if rcps is None:
        # Reciprocal guards at rank 1: padded HBM slots carry rho == 0
        # (their lanes/rows are masked, but the division must stay finite so
        # that mask * value is 0, not NaN).  Real densities are ~rho0 > 0.
        rho_j = jnp.where(rho_j > 0.0, rho_j, jnp.ones_like(rho_j))  # [1, L]
        rcp_rho_j = 1.0 / rho_j
        rho_i = jnp.where(rho_i > 0.0, rho_i, jnp.ones_like(rho_i))  # [R, 1]
        rcp_rho_i = 1.0 / rho_i
    else:
        # Caller supplies precomputed reciprocals (and guarantees the rho
        # fields themselves are already guarded: padded slots carry 1.0) -
        # the block kernel packs both at XLA pack time, where the divide
        # costs one dense [N] op instead of per-chunk sparse-vreg work.
        rcp_rho_i, rcp_rho_j = rcps

    d = jnp.sqrt(d2)
    q = d * kern.h_inv
    g = _grad_w_factor(kern, q, d, scale=c.m0 if fold_m0 else 1.0)
    # fold the window-validity mask into g once: every output term except W
    # is proportional to g, so a single select replaces one mask multiply
    # per output (the d2 cutoff itself is already inside _grad_w_factor).
    g = jnp.where(within, g, jnp.zeros_like(g))
    # scalar identities: x_ij . grad_W = g * d2;  v_ij . grad_W = g * (v.x)
    v_dot_x = sum(v * x for v, x in zip(vij, xij))
    g_d2 = g * d2
    g_vx = g * v_dot_x
    gw = [g * x for x in xij] if need_gw else None
    # shared denominator of diffusion psi and artificial-viscosity mu.  On
    # the artificial path the two needed reciprocals 1/d2_eta and
    # 1/(rho_i+rho_j) are fused into ONE (reciprocals are multi-op on the
    # VPU), and the viscosity constant C_pi = 2 alpha c0 h rides it (the
    # diffusion scale below compensates with C_d / C_pi).
    d2_eta = d2 + kern.eta2
    C_pi = 2.0 * c.alpha * c.c0 * kern.h * m0x
    if vm is ViscosityModel.ARTIFICIAL and C_pi != 0.0:
        rho_sum = rho_i + rho_j
        r_fused = C_pi / (d2_eta * rho_sum)
        inv_d2 = r_fused * rho_sum                 # = C_pi / d2_eta
        diff_scale = 1.0 / C_pi
    else:
        r_fused = None
        inv_d2 = 1.0 / d2_eta
        diff_scale = 1.0

    # continuity (reference :289-291): drho+ = -rho_i (m0/rho_j) (-v_ij.gw)
    drho = (m0x * rho_i) * rcp_rho_j * g_vx

    # density diffusion (reference SPHDensityDiffusionModels.jl) with the
    # cell-centric role quirk (see models/density_diffusion.py)
    diff = spec.diffusion
    if diff is not DensityDiffusionModel.ZERO:
        ml_gate = None
        if diff is DensityDiffusionModel.ZERO_GRAVITY_LINEAR:
            diff_n = (rr[1] - rr[0]) if rr is not None else (rho_j - rho_i)
        elif diff is DensityDiffusionModel.LINEAR:
            # rho_h = C_lin * (z_i - z_j) (shared constant); packed
            # rr = rho + C_lin z collapses rho_ji - rho_h to one subtract
            from ..models.density_diffusion import linear_hydrostatic_constant
            C_lin = linear_hydrostatic_constant(c)
            if rr is not None:
                diff_n = rr[1] - rr[0]
            else:
                diff_n = (rho_j - rho_i) - C_lin * xij[-1]
            ml_gate = ml_i * ml_j
        else:  # COMPLEX: inverse hydrostatic EOS, 7th root; not odd in
            # P, so the j-role endpoint evaluates the i-role orientation
            # (-P_h) and flips the sign.
            P_h = c.rho0 * (-c.g) * (-xij[-1])

            def _inv_eos(P):
                arg = 1.0 + P * c.Cb_inv
                root = jnp.sign(arg) * jnp.exp(
                    jnp.log(jnp.abs(arg) + 1e-30) * (1.0 / 7.0)
                )
                return c.rho0 * (root - 1.0)

            rho_h = jnp.where(i_is_role_i, _inv_eos(P_h), -_inv_eos(-P_h))
            diff_n = (rho_j - rho_i) - rho_h
            ml_gate = ml_i * ml_j
        # D = delta h c0 (m0/rho_jrole) * [2 (rho_ji - rho_h)(-x).gw / d2eta]
        #   = C_d * vol * diff_n * inv_d2 * g_d2,  C_d = -2 delta h c0 m0;
        # m0 already rides g_d2 on the folded path, and inv_d2 carries C_pi
        # on the artificial path - diff_scale compensates.
        C_d = -2.0 * c.delta_sph * kern.h * c.c0 * m0x * diff_scale
        vol = jnp.where(i_is_role_i, rcp_rho_j, rcp_rho_i)
        # rr_scaled: C_d already rides the packed rr column (one dense [N]
        # multiply at pack time, diffusion_rr_scale) - drop the per-chunk
        # full-tile constant multiply.  Only LINEAR/ZG_LINEAR read rr.
        pre = (rr_scaled and rr is not None and diff in (
            DensityDiffusionModel.LINEAR,
            DensityDiffusionModel.ZERO_GRAVITY_LINEAR))
        D = vol * diff_n * ((inv_d2 if pre else C_d * inv_d2) * g_d2)
        if ml_gate is not None:
            D = D * ml_gate
        drho = drho + D

    # momentum (reference :299-303): dvdt = -m0 (pfac + f_ab) g * x_ij
    # (m0 rides g on the folded path; p_is_pq callers pack p/rho)
    if p_is_pq:
        A_p = (-m0x) * (p_i * rcp_rho_j + p_j * rcp_rho_i)
    else:
        A_p = (-m0x) * ((p_i + p_j) * (rcp_rho_i * rcp_rho_j))
    if kern.family is KernelFamily.CUBIC_SPLINE:
        w_q = _w_value(kern, q)
        # static python evaluation of W at q = dx (reference's raw-distance
        # quirk, SPHKernels.jl:119-126)
        q0 = c.dx
        if q0 <= 1.0:
            w_dx = kern.alpha_d * (1.0 - 1.5 * q0 * q0 + 0.75 * q0**3)
        elif q0 <= 2.0:
            w_dx = kern.alpha_d * 0.25 * (2.0 - q0) ** 3
        else:
            w_dx = 0.0
        ratio = w_q * (1.0 / w_dx)
        if p_is_pq:
            f_ab = (p_i * rcp_rho_i + p_j * rcp_rho_j) * (
                kern.cubic_eps * (ratio * ratio) * (ratio * ratio)
            )
        else:
            f_ab = (
                (p_i * (rcp_rho_i * rcp_rho_i)) + (p_j * (rcp_rho_j * rcp_rho_j))
            ) * (kern.cubic_eps * (ratio * ratio) * (ratio * ratio))
        A_p = A_p + (-m0x) * f_ab

    # viscosity (reference SPHViscosityModels.jl)
    if vm is ViscosityModel.ARTIFICIAL:
        # pi = m0 alpha c0 mu / rho_bar, mu = h (v.x)/d2eta, only where
        # v.x < 0 - the gate folds into min(v.x, 0) (one op, no select);
        # the constant 2 alpha c0 h m0x already rides r_fused, and the
        # remaining m0 rides g on the folded path.
        if r_fused is not None:
            pi_fac = jnp.minimum(v_dot_x, 0.0) * r_fused
            A = (A_p + pi_fac) * g
        else:  # alpha == 0: no viscous term
            A = A_p * g
        dvdt = [A * x for x in xij]
    elif vm in (ViscosityModel.LAMINAR, ViscosityModel.LAMINAR_SPS):
        # term = 4 m0 nu0 (x.gw) / ((rho_i+rho_j) + d2eta)  [DSPH form quirk]
        term = (4.0 * c.nu0 * m0x) * g_d2 / ((rho_i + rho_j) + d2_eta)
        A = A_p * g
        dvdt = [A * x + term * v for x, v in zip(xij, vij)]
        if vm is ViscosityModel.LAMINAR_SPS:
            # S_a[r][cd] = (m0/rho_b) * dv[r] * gw[cd]; tau built per the
            # role-invariant forms (see models/viscosity.py)
            cs2_dx2 = (c.smagorinsky_constant * c.dx) ** 2
            blin_dx2 = c.blin_constant * c.dx * c.dx
            dv = [-v for v in vij]  # v_j - v_i

            def tau_dot_gw(rcp_rho_scale, rho_self):
                s_fac = c.m0 * rcp_rho_scale
                sum_dv2 = sum(a * a for a in dv)
                sum_gw2 = sum(w * w for w in gw)
                norm_S2 = 2.0 * (s_fac * s_fac) * sum_dv2 * sum_gw2
                norm_S = jnp.sqrt(norm_S2)
                nu_t = cs2_dx2 * norm_S
                trace_S = s_fac * sum(a * w for a, w in zip(dv, gw))
                iso = -(trace_S / 3.0) * (2.0 * nu_t * rho_self) - (
                    (2.0 / 3.0) * rho_self * blin_dx2 * norm_S2
                )
                dev_fac = 2.0 * nu_t * rho_self * s_fac
                return [dev_fac * dv[r] * sum_gw2 + iso * gw[r] for r in range(dims)]

            t_i = tau_dot_gw(rcp_rho_j, rho_i)
            t_j = tau_dot_gw(rcp_rho_i, rho_j)
            fac = c.m0 * (rcp_rho_i * rcp_rho_j)
            dvdt = [a + fac * (ti + tj) for a, ti, tj in zip(dvdt, t_i, t_j)]
    else:
        A = A_p * g
        dvdt = [A * x for x in xij]

    # masks are already folded into g (every term below is proportional to g
    # or a power of it); only the STORE-mode W value needs an explicit mask.
    out = {"drho": drho}
    for r in range(dims):
        out[f"dvdt{r}"] = dvdt[r]
    if want_kernel:
        w = _w_value(kern, q)
        # W is the only output not proportional to g: it needs the explicit
        # support cutoff on top of the window-validity mask
        out["w"] = w * (within & (d2 <= kern.H2)).astype(w.dtype)
        for r in range(dims):
            out[f"gw{r}"] = gw[r]
    if want_shift:
        # add_shifting_terms! (reference :73-88): grad_C uses the self
        # density, div_r the neighbor's; -x_ij.gw = -g*d2.
        mlcond = ml_i * ml_j
        for r in range(dims):
            out[f"gc{r}"] = (c.m0 * rcp_rho_i) * gw[r]
        out["dr"] = (c.m0 * rcp_rho_j) * (-g_d2) * mlcond
    return out


def _make_kernel(spec: PhysicsSpec, grid: Grid, dims, nfields, mpc, cseg, S, n, R):
    want_kernel = spec.kernel_output is KernelOutputMode.STORE
    want_shift = spec.shifting is ShiftingMode.PLANAR
    # Cell-pair programs: one program covers the contiguous sorted rows of
    # up to TWO x-adjacent occupied cells (R2 = 2R rows as two predicated
    # R-row halves), so the candidate x-window spans up to 4 cells.  The
    # 4-cell segment bound is cseg + mpc (3-cell segment <= cseg and one
    # cell <= mpc - both already telemetry-guarded), so no new overflow
    # telemetry is needed.
    R2 = 2 * R
    cseg4 = _round_up(cseg + mpc, 128)
    cwin = cseg4 + 128
    cwin_pad = -(-cwin // CHUNK_W) * CHUNK_W
    ncells = grid.ncells
    gshape = grid.shape
    gstrides = grid.strides
    rows_np = stencil_rows(dims)  # [S, D-1] static python ints

    def kernel(
        occ_keys_ref,    # [maxc] SMEM (prefetch): 2*lead_key + pair_flag
        cell_start_ref,  # [ncells+2] SMEM (prefetch)
        prog_slot_ref,   # [maxp] SMEM (prefetch): program -> occupied slot
        prog_base_ref,   # [maxc] SMEM (prefetch): slot -> first program id
        packed_hbm,      # [F_pad, N] HBM (lane-major, candidate segments)
        packedT_hbm,     # [N, F_pad] HBM (row-major, self windows)
        mom_out,         # [1, K_pad, R2] fused output block (all keys)
        selfT_buf, cand_buf, acc_ref, sem,
    ):
        outs = (mom_out,)

        # Compacted (cell-pair, row-chunk) program list: only live chunks
        # get programs; slots past the live count point at a dead occ slot.
        b = pl.program_id(0)

        if cwin_pad > cwin:
            # one-time zero of the buffer tail the DMAs never write (the
            # grid is sequential per core, so program 0 runs first and the
            # tail stays zero for every later program)
            @pl.when(b == 0)
            def _zero_tail():
                cand_buf[:, :, cwin:cwin_pad] = jnp.zeros(
                    (S, cand_buf.shape[1], cwin_pad - cwin), jnp.float32
                )

        slot = prog_slot_ref[b]
        key_enc = occ_keys_ref[slot]     # 2*key + pair_flag (SMEM economy)
        key = key_enc >> 1
        pairflag = key_enc & 1
        is_live = key < ncells
        keyc = jnp.minimum(key, ncells - 1)
        chunk = b - prog_base_ref[slot]
        base_row = chunk * R2
        csA = cell_start_ref[keyc]
        ceA = cell_start_ref[keyc + 1]
        ceB = cell_start_ref[keyc + 1 + pairflag]  # == ceA when unpaired
        cnt_unit = jnp.where(is_live, ceB - csA, 0)
        # this program handles rows [base_row, base_row + R2) of the pair
        s0 = csA + base_row
        cnt = jnp.clip(cnt_unit - base_row, 0, R2)
        is_live = is_live & (cnt > 0)

        # decompose the linear LEAD key into grid coordinates (x fastest)
        rel = []
        rem_k = keyc
        for d_i in range(dims):
            rel.append(rem_k % gshape[d_i])
            rem_k = rem_k // gshape[d_i]
        x_lo = jnp.clip(rel[0] - 1, 0, gshape[0] - 1)
        x_hi = jnp.clip(rel[0] + 1 + pairflag, 0, gshape[0] - 1)

        keys = ["drho"] + [f"dvdt{r}" for r in range(dims)]
        if want_kernel:
            keys += ["w"] + [f"gw{r}" for r in range(dims)]
        if want_shift:
            keys += [f"gc{r}" for r in range(dims)] + ["dr"]

        # dead occupied-slots (and the tail beyond the live cell count) skip
        # all DMAs and compute; their output blocks are never gathered.
        @pl.when(is_live)
        def _body():
            # Self rows come from the ROW-major copy: the (8, 128) HBM tiling
            # only constrains the sublane start to a multiple of 8, so the
            # window is 8-aligned and de-rotated with one cheap sublane roll
            # (no per-field transposes).  The driver pads the capacity so the
            # clamp never bites for live cells.
            s08 = pl.multiple_of(
                jnp.maximum(jnp.minimum((s0 // 8) * 8, n - (R2 + 8)), 0), 8
            )
            rem8 = s0 - s08  # in [0, 8)

            cp_self = pltpu.make_async_copy(
                packedT_hbm.at[pl.ds(s08, R2 + 8)], selfT_buf, sem.at[0]
            )
            cp_self.start()

            # precompute all segment bounds (scalar work) so candidate DMAs
            # can be double-buffered: prefetch s+1 while computing s.
            seg_rs, seg_re, seg_rs_al = [], [], []
            for s in range(S):
                deltas = rows_np[s]
                row_ok = True
                row_base = jnp.zeros_like(keyc)
                for d_i in range(1, dims):
                    rc = rel[d_i] + int(deltas[d_i - 1])
                    row_ok = row_ok & (rc >= 0) & (rc < gshape[d_i])
                    row_base = row_base + rc * gstrides[d_i]
                key_lo = jnp.where(row_ok, row_base + x_lo, 0)
                key_hi = jnp.where(row_ok, row_base + x_hi, -1)
                rs = jnp.where(row_ok, cell_start_ref[key_lo], 0)
                re = jnp.where(row_ok, cell_start_ref[key_hi + 1], 0)
                seg_rs.append(rs)
                seg_re.append(re)
                seg_rs_al.append(
                    pl.multiple_of(
                        jnp.maximum(jnp.minimum((rs // 128) * 128, n - cwin), 0), 128
                    )
                )

            def seg_dma(s):
                # tail lanes [cwin, cwin_pad) were zeroed once at program 0
                return pltpu.make_async_copy(
                    packed_hbm.at[:, pl.ds(seg_rs_al[s], cwin)],
                    cand_buf.at[s, :, pl.ds(0, cwin)], sem.at[1 + s],
                )

            # launch ALL segment DMAs up front: the per-DMA latency (~us)
            # dwarfs both the transfer and the per-segment compute, so the
            # kernel is latency-bound unless the copies fly concurrently.
            for s in range(S):
                @pl.when(seg_re[s] > seg_rs[s])
                def _():
                    seg_dma(s).start()

            cp_self.wait()

            # self quantities live as [R, 1] columns per HALF (rank-1: a
            # fraction of the full-tile vreg cost).  One sublane roll
            # de-rotates the 8-aligned window; columns are then static
            # slices.  (positive modular shift: compiled Mosaic mis-lowers
            # dynamic NEGATIVE roll shifts; interpret mode is correct,
            # which is why interpret parity tests never caught it.)
            selfT = pltpu.roll(selfT_buf[...], shift=(R2 + 8) - rem8, axis=0)[0:R2]
            want_kernel_out = spec.kernel_output is KernelOutputMode.STORE

            # per-half hoisted quantities: self columns, sorted self index,
            # row-validity, and per-ROW cell bounds (a row of the second
            # cell of a pair must test same-cell against ITS OWN bounds for
            # the diffusion role quirk)
            half = []
            row_ids = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
            for hf in range(2):
                sl = selfT[hf * R : (hf + 1) * R]
                self_f = [sl[:, f : f + 1] for f in range(nfields)]
                idx_i = (s0 + hf * R) + row_ids          # [R, 1]
                self_valid = (row_ids + hf * R) < cnt    # [R, 1]
                in_a = idx_i < ceA
                cs_row = jnp.where(in_a, csA, ceA)       # [R, 1]
                ce_row = jnp.where(in_a, ceA, ceB)       # [R, 1]
                half.append((self_f, idx_i, self_valid, cs_row, ce_row))

            acc_ref[...] = jnp.zeros_like(acc_ref)

            lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK_W), 1)
            NLW = -(-cwin // CHUNK_W)

            for s in range(S):
                @pl.when(seg_re[s] > seg_rs[s])  # skip empty segments
                def _segment():
                    seg_dma(s).wait()

                    # Candidates are indexed IN PLACE in the 128-aligned
                    # window (no lane roll - rolls measured ~1/3 of sweep
                    # time); lane validity masks both the pre-segment head
                    # (other cells' particles) and the tail.  All pair terms
                    # are proportional to the masked g, so foreign lanes
                    # contribute exact zeros.
                    def chunk_body(kc):
                        lo = kc * CHUNK_W
                        idx_j = (seg_rs_al[s] + lo) + lane_ids     # [1, W]
                        lane_valid = (idx_j >= seg_rs[s]) & (idx_j < seg_re[s])
                        cand_f = [
                            cand_buf[s][f : f + 1, lo : lo + CHUNK_W]
                            for f in range(nfields)
                        ]

                        def half_body(hf):
                            self_f, idx_i, self_valid, cs_row, ce_row = half[hf]
                            within = self_valid & lane_valid
                            if want_kernel_out:
                                # self-pair exclusion: every pair term
                                # vanishes at d2 == 0 except the kernel sum
                                # W(0), so the index test is only needed in
                                # kernel-output mode.
                                within = within & (idx_j != idx_i)
                            # diffusion role flag (cell-centric quirk):
                            # intra-cell pairs give the i role to the lower
                            # sorted index, cross-cell pairs to the particle
                            # in the later cell (== higher sorted index,
                            # arrays are key-sorted).  Composed with logical
                            # ops, not jnp.where - Mosaic cannot lower
                            # select on boolean vectors (i8->i1 trunci).
                            same_cell = (idx_j >= cs_row) & (idx_j < ce_row)
                            i_is_role_i = ~(same_cell ^ (idx_i < idx_j))
                            terms = _pair_math(
                                spec, dims, self_f, cand_f, i_is_role_i,
                                within,
                            )
                            # one stacked read-modify-write per half instead
                            # of n_keys separate VMEM RMWs
                            acc_ref[:, hf * R : (hf + 1) * R, :] += jnp.stack(
                                [terms[k] for k in keys]
                            )

                        # the second half holds rows only when the pair unit
                        # overflows one R-row tile - predicated off
                        # otherwise, so an unpaired small cell pays no
                        # dead-row lanes beyond the old single-cell fill
                        half_body(0)
                        pl.when(cnt > R)(functools.partial(half_body, 1))

                    # chunk 0 always holds live lanes when the segment is
                    # non-empty (seg_rs sits inside the first aligned chunk);
                    # later chunks are predicated on holding any live lane.
                    # (PREDICATE_CHUNKS=False computes every chunk with masks
                    # instead - a measurement toggle for the branch-vs-lanes
                    # trade; correctness is identical since masked lanes
                    # contribute exact zeros.)
                    chunk_body(0)
                    for kc in range(1, NLW):
                        if PREDICATE_CHUNKS:
                            pl.when(seg_re[s] > seg_rs_al[s] + kc * CHUNK_W)(
                                functools.partial(chunk_body, kc)
                            )
                        else:
                            chunk_body(kc)

            # lane-reduce the whole accumulator at once and store ONE fused
            # [1, K, R2] block in `keys` order (acc slot ki[k] == position
            # of k in `keys`) - no per-key transposes, one XLA gather-back
            outs[0][0, 0 : len(keys), :] = jnp.sum(acc_ref[...], axis=2)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("spec", "grid", "mpc", "cseg", "maxc", "interpret"),
)
def pallas_pair_sweep(
    spec: PhysicsSpec,
    grid: Grid,
    mpc: int,
    cseg: int,
    maxc: int,
    particles,
    cell_start,
    position,
    density,
    pressure,
    velocity,
    tables: "PallasTables | None" = None,
    interpret: bool = False,
) -> SweepOut:
    """Full-device sweep via the fused cell kernel (single-chip path).

    ``mpc``: self-window capacity (>= max cell occupancy, multiple of 8);
    ``cseg``: candidate segment capacity (>= 3 * max occupancy, multiple of
    128); ``maxc``: occupied-cell list capacity.

    ``tables``: rebuild-time program tables (see :func:`make_program_tables`).
    ``None`` (direct callers / tests) computes them inline per sweep.
    """
    dims = position.shape[1]
    n = position.shape[0]
    cwin = _round_up(cseg + mpc, 128) + 128  # 4-cell pair window + alignment
    if n % 128 != 0 or n < cwin:
        raise ValueError(
            f"particle capacity {n} must be a multiple of 128 and >= the DMA "
            f"window ({cwin}); pad the capacity"
        )
    if mpc % 8 != 0:
        raise ValueError(f"mpc={mpc} must be a multiple of 8")
    if cseg % 128 != 0:
        raise ValueError(f"cseg={cseg} must be a multiple of 128")
    S = 3 ** (dims - 1)
    nfields = 2 * dims + 3
    nfields_pad = _round_up(nfields, 8)

    packed, packedT = pack_fields(
        position.astype(jnp.float32),
        velocity.astype(jnp.float32),
        density.astype(jnp.float32),
        pressure.astype(jnp.float32),
        particles.motion_limiter.astype(jnp.float32),
    )

    R2 = sweep_rows(mpc)
    maxp = maxc + n // R2 + 1
    if tables is None:
        tables = make_program_tables(cell_start, grid, maxc, R2, n,
                                     particles.cell, particles.active, mpc,
                                     pair=True)
    if tables.prog_slot.shape[0] != maxp:
        raise ValueError(
            f"program tables sized for maxp={tables.prog_slot.shape[0]}, "
            f"expected {maxp} (maxc={maxc}, capacity={n}, R2={R2})"
        )

    outs = _invoke_kernel(
        spec, grid, mpc, cseg, tables, cell_start, packed, packedT, n, dims,
        interpret,
    )
    return _gather_back(outs, spec, tables, particles.active, position.dtype)


def _invoke_kernel(spec, grid, mpc, cseg, tables, cell_start_k, packed,
                   packedT, n_k, dims, interpret):
    """Launch the fused kernel over ``packed``/``packedT`` with segment
    bounds from ``cell_start_k`` (single-chip: global sorted rows; sharded:
    halo-extended local rows - the kernel is coordinate-agnostic)."""
    S = 3 ** (dims - 1)
    nfields = 2 * dims + 3
    nfields_pad = _round_up(nfields, 8)
    want_kernel = spec.kernel_output is KernelOutputMode.STORE
    want_shift = spec.shifting is ShiftingMode.PLANAR
    n_keys = (1 + dims) * (1 + int(want_kernel) + int(want_shift))
    R = prog_rows(mpc)
    R2 = sweep_rows(mpc)
    maxp = tables.prog_slot.shape[0]

    # ONE fused output block holding every key's lane-reduced row (sublane
    # dim padded to 8): a single XLA gather maps all outputs back to
    # particle order, and the kernel stores one [K, R2] tile per program.
    k_pad = _round_up(n_keys, 8)
    out_shapes = [jax.ShapeDtypeStruct((maxp, k_pad, R2), jnp.float32)]
    out_specs = [pl.BlockSpec((1, k_pad, R2), lambda b, *_: (b, 0, 0))]

    # Scalar prefetch: compacted occupied keys, cell_start, and the program
    # list - all 1-D SMEM; per-cell segment metadata is derived with scalar
    # arithmetic inside the kernel.
    # Dynamic grid: only the live programs are launched on hardware (the
    # compacted list has no dead chunks, but the table CAPACITY maxp is
    # ~2.5x the live count).  Interpret mode requires a static trip count;
    # its extra programs fail the is_live gate and no-op.
    nprog = tables.nprog if tables.nprog.ndim == 0 else tables.nprog[0]
    grid_size = maxp if interpret else nprog
    cwin_buf = _round_up(_round_up(cseg + mpc, 128) + 128, CHUNK_W)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(grid_size,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=tuple(out_specs),
        scratch_shapes=[
            pltpu.VMEM((R2 + 8, 128), jnp.float32),
            pltpu.VMEM((S, nfields_pad, cwin_buf), jnp.float32),
            pltpu.VMEM((n_keys, R2, CHUNK_W), jnp.float32),
            pltpu.SemaphoreType.DMA((1 + S,)),
        ],
    )

    kernel = _make_kernel(spec, grid, dims, nfields, mpc, cseg, S, n_k, R)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=tuple(out_shapes),
        interpret=interpret,
    )(
        tables.occ_keys,
        cell_start_k.astype(jnp.int32),
        tables.prog_slot,
        tables.prog_base,
        packed,
        packedT,
    )


def _gather_back(outs, spec, tables, active, dtype):
    """Gather the fused per-(cell, chunk) output block back to particle
    order with ONE gather, then slice per key.

    Key layout mirrors the kernel's `keys` list:
    drho | dvdt_r x D | (w | gw_r x D)? | (gc_r x D | dr)?

    CONTRACT: dead programs (and the k_pad padding rows of live programs)
    never write their ``mom_out`` block, so this gather can read
    uninitialized HBM for inactive particle rows - every value MUST pass
    through the ``active`` mask below (it does) and no consumer may reduce
    over the raw gathered block (e.g. a global sum) without masking first."""
    want_kernel = spec.kernel_output is KernelOutputMode.STORE
    want_shift = spec.shifting is ShiftingMode.PLANAR

    vals = outs[0][tables.prog_idx, :, tables.row_idx]        # [N, K_pad]
    vals = jnp.where(active[:, None], vals, 0).astype(dtype)

    D = spec.kernel.dims
    i = 0
    drho = vals[:, i]; i += 1
    acc = vals[:, i : i + D]; i += D
    kw = kg = gc = dr = None
    if want_kernel:
        kw = vals[:, i]; i += 1
        kg = vals[:, i : i + D]; i += D
    if want_shift:
        gc = vals[:, i : i + D]; i += D
        dr = vals[:, i]; i += 1

    return SweepOut(
        drhodt=drho, acceleration=acc,
        kernel_w=kw, kernel_grad=kg, grad_c=gc, div_r=dr,
    )


def pallas_pair_sweep_sharded(
    spec: PhysicsSpec,
    grid: Grid,
    mpc: int,
    cseg: int,
    maxc: int,
    halo: int,
    particles,               # LOCAL slab Particles (cell / ml / active)
    cell_start,              # [ncells+2] int32 GLOBAL sorted rows (replicated)
    position,                # [C, D] local sweep fields
    density,
    pressure,
    velocity,
    ctx,                     # sharded CommContext (inside shard_map)
    tables: "PallasTables | None" = None,
    interpret: bool = False,
) -> SweepOut:
    """Per-device fused sweep under ``shard_map`` with a 1-hop halo exchange.

    The particle axis is sharded in global cell-sorted order, so every
    neighbor of a local particle lives within one stencil reach of the slab
    boundary - at most ``halo`` sorted rows away (telemetry-checked, see
    ``max_halo`` in the state).  Each device:

      * packs its local sweep fields ([F, C]),
      * ppermutes the first/last ``halo`` packed rows with its two slab
        neighbors (2 x [F, halo] transfers over ICI - this replaces the
        all-gather of the full global arrays, reference counterpart
        ``src/SPHCellList.jl:174-214`` thread fan-out),
      * runs the UNCHANGED cell kernel on the halo-extended arrays with
        ``cell_start`` rebased to extended-local coordinates,
      * gathers only its own rows back (straddling boundary cells are
        computed in full; the non-local rows are discarded).

    Per-device sweep memory is O(C + halo), not O(N_global).  ``halo`` and
    the local capacity must be multiples of 128 so the extended coordinates
    preserve the 128-aligned DMA windows (and, with them, bitwise-identical
    chunk boundaries vs the single-chip kernel).
    """
    C = position.shape[0]
    H = halo
    if C % 128 != 0 or H % 128 != 0:
        raise ValueError(f"local capacity {C} and halo {H} must be multiples of 128")
    dims = position.shape[1]
    n_ext = C + 2 * H
    if n_ext < _round_up(cseg + mpc, 128) + 128:
        raise ValueError(
            f"extended window {n_ext} smaller than the candidate DMA window "
            f"{_round_up(cseg + mpc, 128) + 128}; raise the halo or capacity"
        )
    if mpc % 8 != 0 or cseg % 128 != 0:
        raise ValueError("mpc must be a multiple of 8 and cseg of 128")

    packed, _ = pack_fields(
        position.astype(jnp.float32),
        velocity.astype(jnp.float32),
        density.astype(jnp.float32),
        pressure.astype(jnp.float32),
        particles.motion_limiter.astype(jnp.float32),
    )

    # 1-hop halo exchange: my left halo is the LEFT neighbor's tail, my
    # right halo the RIGHT neighbor's head.  Edge devices receive zeros
    # (lax.ppermute semantics), which is correct: their windows never reach
    # past the global array ends.
    ndev = ctx.num_devices
    fwd = [(i, i + 1) for i in range(ndev - 1)]
    bwd = [(i + 1, i) for i in range(ndev - 1)]
    left = jax.lax.ppermute(packed[:, C - H:], ctx.axis, fwd)
    right = jax.lax.ppermute(packed[:, :H], ctx.axis, bwd)
    # zero tail so the kernel's aligned DMA-window clamp (n - cwin) never
    # binds on a live row: keeps the in-window lane offsets - and so the
    # f32 summation order - bitwise-identical to the single-chip kernel
    cwin = _round_up(cseg + mpc, 128) + 128
    packed_ext = jnp.concatenate(
        [left, packed, right,
         jnp.zeros((packed.shape[0], cwin), jnp.float32)], axis=1
    )
    nf = 2 * dims + 3
    nf_pad = _round_up(nf, 8)
    packedT_ext = jnp.pad(packed_ext.T, ((0, 0), (0, 128 - nf_pad)))

    # rebase global sorted rows to extended-local coordinates: local row r
    # sits at ext index H + r; cells beyond one halo clamp harmlessly (they
    # are never in this device's program list, and clamped stencil windows
    # are exactly what the halo-overflow telemetry guards).
    base = ctx.rank() * C
    cs_ext = jnp.clip(cell_start - (base - H), 0, n_ext).astype(jnp.int32)

    R2 = sweep_rows(mpc)
    maxp = maxc + n_ext // R2 + 1
    if tables is None:
        tables = make_local_program_tables(
            cell_start, grid, maxc, R2, base, C, n_ext,
            particles.cell, particles.active, mpc, pair=True,
        )
    if tables.prog_slot.shape[0] != maxp:
        raise ValueError(
            f"local program tables sized for maxp={tables.prog_slot.shape[0]},"
            f" expected {maxp} (maxc={maxc}, ext capacity={n_ext}, R2={R2})"
        )

    outs = _invoke_kernel(
        spec, grid, mpc, cseg, tables, cs_ext, packed_ext, packedT_ext,
        n_ext + cwin, dims, interpret,
    )
    return _gather_back(outs, spec, tables, particles.active, position.dtype)

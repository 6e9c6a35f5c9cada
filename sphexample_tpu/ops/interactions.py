"""The pair-interaction sweep: gather + in-register reduce (XLA path).

TPU-native replacement for the reference's threaded scatter loop
(``NeighborLoop!`` + ``ComputeInteractions!``, reference
``src/SPHCellList.jl:168-317``):

  * every particle gathers a *fixed-capacity* candidate window - S = 3^(D-1)
    contiguous row-segments of the cell-sorted arrays (3 x-adjacent cells per
    segment), masked by real segment length and the H^2 cutoff,
  * each pair is computed twice (once per endpoint), which removes all scatter
    races and the need for per-thread privatized accumulators
    (reference PreProcess.jl:198-215, SPHCellList.jl:367-381) entirely,
  * the particle axis is processed in static blocks via ``lax.map`` to bound
    the transient gather footprint in HBM/VMEM.

All physics per pair matches ``ComputeInteractions!``
(SPHCellList.jl:268-317) including the density-diffusion role-order quirk
(see models/density_diffusion.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import (
    DensityDiffusionModel,
    KernelOutputMode,
    ShiftingMode,
    SimulationConstants,
    SPHKernelInstance,
    ViscosityModel,
)
from ..models import density_diffusion as dd
from ..models import kernels as K
from ..models import viscosity as visc
from .cell_list import Grid, linearize, row_segments


@dataclass(frozen=True)
class PhysicsSpec:
    """Static bundle of everything the pair kernel needs at trace time."""

    constants: SimulationConstants
    kernel: SPHKernelInstance
    viscosity: ViscosityModel
    diffusion: DensityDiffusionModel
    shifting: ShiftingMode = ShiftingMode.NONE
    kernel_output: KernelOutputMode = KernelOutputMode.NONE


def particles_field(local, global_):
    """Default the local view to the global array (single-chip case)."""
    return global_ if local is None else local


class SweepOut(NamedTuple):
    """Per-particle accumulators produced by one neighbor sweep.  Optional
    outputs are ``None`` when their mode is off - the trace never emits them
    (zero-cost-when-off, like the reference's no-op dispatches)."""

    drhodt: jax.Array
    acceleration: jax.Array
    kernel_w: Optional[jax.Array]
    kernel_grad: Optional[jax.Array]
    grad_c: Optional[jax.Array]       # shifting concentration gradient
    div_r: Optional[jax.Array]        # shifting divergence (free-surface detector)


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def pair_sweep(
    spec: PhysicsSpec,
    grid: Grid,
    cseg: int,
    block_size: int,
    particles,              # LOCAL sorted Particles (cell / motion_limiter / active)
    cell_start,             # [ncells+2] int32 - built from GLOBAL sorted keys
    position,               # [Ng, D] GLOBAL sweep field set (state or half-step)
    density,                # [Ng]
    pressure,               # [Ng]
    velocity,               # [Ng, D]
    global_ml=None,         # [Ng] - defaults to particles.motion_limiter
    local_position=None,    # [Nl, D] - the local rows of `position`
    local_density=None,
    local_pressure=None,
    local_velocity=None,
    idx_base=0,             # global sorted index of local row 0 (sharded runs)
) -> SweepOut:
    """One full neighbor sweep over the local particle rows.

    Single-chip: local == global and ``idx_base`` is 0.  Under ``shard_map``
    each device passes its slab as the ``particles``/``local_*`` arguments and
    the all-gathered arrays as the global ones; ``cell_start`` indexes into
    global sorted order and ``idx_base`` offsets self-indices into it.

    ``cseg`` is the static per-row candidate capacity (>= 3 * max cell
    occupancy); ``block_size`` chunks the particle axis.
    """
    kern = spec.kernel
    c = spec.constants
    n = position.shape[0]

    ml = particles.motion_limiter if global_ml is None else global_ml
    local_position = particles_field(local_position, position)
    local_density = particles_field(local_density, density)
    local_pressure = particles_field(local_pressure, pressure)
    local_velocity = particles_field(local_velocity, velocity)
    want_kernel = spec.kernel_output is KernelOutputMode.STORE
    want_shift = spec.shifting is ShiftingMode.PLANAR

    def particle_fn(xs):
        # Written per particle; lax.map vmaps this over `block_size`-sized
        # chunks, so every array here grows a leading block axis at trace time.
        idx_i, coords_i, pos_i, rho_i, p_i, vel_i, ml_i, act_i = xs

        start, end = row_segments(coords_i, grid, cell_start)      # [S]
        offs = jnp.arange(cseg, dtype=jnp.int32)
        j = start[:, None] + offs                                  # [S, C]
        valid = j < end[:, None]
        j = jnp.clip(j, 0, n - 1).reshape(-1)                      # [K]
        valid = valid.reshape(-1)

        pos_j = position[j]                                        # [K, D]
        rho_j = density[j]
        p_j = pressure[j]
        vel_j = velocity[j]
        ml_j = ml[j]

        xij = pos_i[None, :] - pos_j
        d2 = _dot(xij, xij)
        within = valid & (d2 <= kern.H2) & (j != idx_i) & act_i

        # Masked lanes may gather inactive padding rows (density 0), and an
        # inactive *self* row has density 0 as well; divisions there produce
        # inf, and inf * 0-mask = NaN poisons the sums (and, downstream, the
        # rebuild-trigger displacement max).  Substituting a benign density on
        # masked lanes / inactive selves changes nothing valid.
        rho_j = jnp.where(within, rho_j, jnp.ones_like(rho_j))
        rho_i = jnp.where(act_i, rho_i, jnp.ones_like(rho_i))

        d = jnp.sqrt(d2)
        q = jnp.clip(d * kern.h_inv, 0.0, 2.0)
        grad_w = K.grad_W(kern, q, xij)                            # [K, D]

        vij = vel_i[None, :] - vel_j

        # Continuity (reference SPHCellList.jl:289-291): symmetric term.
        sym = _dot(-vij, grad_w)
        drho = -rho_i * (c.m0 / rho_j) * sym

        # Density diffusion (reference :293-296) with the cell-centric
        # role-order quirk: intra-cell pairs give the i role to the lower
        # sorted index, cross-cell pairs to the particle in the *later* cell
        # (the reference's half stencil keeps only earlier-sorting neighbor
        # cells; see models/density_diffusion.py).  Particles are key-sorted,
        # so cross-cell "later cell" == higher global sorted index.
        key_i = linearize(coords_i, grid)
        s_i = cell_start[key_i]
        e_i = cell_start[key_i + 1]
        same_cell = (j >= s_i) & (j < e_i)
        i_is_role_i = jnp.where(same_cell, idx_i < j, idx_i > j)
        drho = drho + dd.compute_density_diffusion(
            spec.diffusion, kern, c, xij, grad_w, d2,
            rho_i, rho_j, ml_i, ml_j, i_is_role_i,
        )

        # Momentum (reference :299-303) + tensile correction + viscosity.
        pfac = (p_i + p_j) / (rho_i * rho_j)
        f_ab = K.tensile_correction(kern, p_i, rho_i, p_j, rho_j, q, c.dx)
        dvdt = (-c.m0 * (pfac + f_ab))[..., None] * grad_w
        dvdt = dvdt + visc.compute_viscosity(
            spec.viscosity, kern, c, xij, vij, grad_w, d2, rho_i, rho_j
        )

        mf = within.astype(drho.dtype)
        out = {
            "drhodt": jnp.sum(drho * mf),
            "acc": jnp.sum(dvdt * mf[:, None], axis=0),
        }
        if want_kernel:
            # KernelOutput! (reference SPHCellList.jl:106-116)
            w = K.W(kern, q)
            out["kernel_w"] = jnp.sum(w * mf)
            out["kernel_grad"] = jnp.sum(grad_w * mf[:, None], axis=0)
        if want_shift:
            # add_shifting_terms! (reference SPHCellList.jl:73-88); both terms
            # are role-swap invariant: grad_C uses the *self* density, div_r
            # the neighbor's.
            mlcond = ml_i * ml_j
            gc = (c.m0 / rho_i) * grad_w
            dr = (c.m0 / rho_j) * _dot(-xij, grad_w) * mlcond
            out["grad_c"] = jnp.sum(gc * mf[:, None], axis=0)
            out["div_r"] = jnp.sum(dr * mf)
        return out

    n_local = local_position.shape[0]
    idx = idx_base + jnp.arange(n_local, dtype=jnp.int32)
    xs = (
        idx,
        particles.cell,
        local_position,
        local_density,
        local_pressure,
        local_velocity,
        particles.motion_limiter,
        particles.active,
    )
    bs = min(block_size, n_local)
    out = jax.lax.map(particle_fn, xs, batch_size=bs)

    return SweepOut(
        drhodt=out["drhodt"],
        acceleration=out["acc"],
        kernel_w=out.get("kernel_w"),
        kernel_grad=out.get("kernel_grad"),
        grad_c=out.get("grad_c"),
        div_r=out.get("div_r"),
    )

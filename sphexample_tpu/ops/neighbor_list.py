"""Pruned neighbor lists: fixed [N, K] candidate indices with a skin.

An opt-in alternative to the per-sweep stencil windows (see PERFORMANCE.md):
at each lazy rebuild the stencil candidates within radius H + skin of the
*rebuild* positions are compacted into a static [N, K] index list; force
sweeps then gather exactly those candidates.

Semantics: with skin = h, the reference's displacement-accumulator rule
(rebuild when Dx >= h, Dx accumulating ~2x the per-step displacement max,
reference SPHCellList.jl:706-724) bounds the relative approach of any pair
between rebuilds by ~h, so the list is a superset of every stencil pair that
can come within the H cutoff before the next rebuild.  The per-pair H cutoff
is still applied each sweep, so results match the stencil path up to
floating-point summation order.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .cell_list import Grid, row_segments


def build_neighbor_list(
    kern,
    grid: Grid,
    cseg: int,
    K: int,
    block_size: int,
    particles,            # sorted Particles (cell/active/position)
    cell_start,
):
    """Returns (nbr [N, K] int32 with sentinel N for padding, max_count).

    ``max_count`` is the largest true neighbor-candidate count - if it
    exceeds K the list silently truncated and the caller must retune.
    """
    n = particles.capacity
    skin = kern.h
    r2 = (kern.H + skin) ** 2
    position = particles.position

    def particle_fn(xs):
        idx_i, coords_i, pos_i, act_i = xs
        start, end = row_segments(coords_i, grid, cell_start)   # [S]
        offs = jnp.arange(cseg, dtype=jnp.int32)
        j = (start[:, None] + offs).reshape(-1)
        valid = (j < end[:, None].repeat(cseg, 1).reshape(-1))
        j = jnp.clip(j, 0, n - 1)

        xij = pos_i[None, :] - position[j]
        d2 = jnp.sum(xij * xij, axis=-1)
        sel = valid & (d2 <= r2) & (j != idx_i) & act_i

        count = jnp.sum(sel).astype(jnp.int32)
        keys = jnp.where(sel, j, n)
        # compact the selected indices to the front (ascending j)
        nbr = jnp.sort(keys)[:K].astype(jnp.int32)
        return nbr, count

    idx = jnp.arange(n, dtype=jnp.int32)
    xs = (idx, particles.cell, position, particles.active)
    nbr, counts = jax.lax.map(particle_fn, xs, batch_size=min(block_size, n))
    return nbr, jnp.max(counts)


def pair_sweep_list(
    spec,
    grid: Grid,
    nbr,                   # [N, K] int32 (sentinel n)
    block_size: int,
    particles,
    position,
    density,
    pressure,
    velocity,
):
    """Neighbor sweep over the pruned list (single-chip path).

    Identical physics to ops/interactions.pair_sweep; the candidate source is
    the [N, K] list instead of stencil row segments.
    """
    from ..config import KernelOutputMode, ShiftingMode
    from ..models import density_diffusion as dd
    from ..models import kernels as Km
    from ..models import viscosity as visc
    from .cell_list import linearize
    from .interactions import SweepOut

    kern = spec.kernel
    c = spec.constants
    n = position.shape[0]
    ml = particles.motion_limiter
    keys = linearize(particles.cell, grid)
    want_kernel = spec.kernel_output is KernelOutputMode.STORE
    want_shift = spec.shifting is ShiftingMode.PLANAR

    def particle_fn(xs):
        idx_i, key_i, nbr_i, pos_i, rho_i, p_i, vel_i, ml_i, act_i = xs
        valid = nbr_i < n
        j = jnp.minimum(nbr_i, n - 1)

        pos_j = position[j]
        rho_j = density[j]
        p_j = pressure[j]
        vel_j = velocity[j]
        ml_j = ml[j]

        xij = pos_i[None, :] - pos_j
        d2 = jnp.sum(xij * xij, axis=-1)
        within = valid & (d2 <= kern.H2) & act_i
        rho_j = jnp.where(within, rho_j, jnp.ones_like(rho_j))
        rho_i = jnp.where(act_i, rho_i, jnp.ones_like(rho_i))

        d = jnp.sqrt(d2)
        q = jnp.clip(d * kern.h_inv, 0.0, 2.0)
        grad_w = Km.grad_W(kern, q, xij)
        vij = vel_i[None, :] - vel_j

        sym = jnp.sum(-vij * grad_w, axis=-1)
        drho = -rho_i * (c.m0 / rho_j) * sym
        # cell-centric role quirk (see models/density_diffusion.py)
        same_cell = keys[j] == key_i
        i_is_role_i = jnp.where(same_cell, idx_i < j, idx_i > j)
        drho = drho + dd.compute_density_diffusion(
            spec.diffusion, kern, c, xij, grad_w, d2,
            rho_i, rho_j, ml_i, ml_j, i_is_role_i,
        )

        pfac = (p_i + p_j) / (rho_i * rho_j)
        f_ab = Km.tensile_correction(kern, p_i, rho_i, p_j, rho_j, q, c.dx)
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
            w = Km.W(kern, q)
            out["kernel_w"] = jnp.sum(w * mf)
            out["kernel_grad"] = jnp.sum(grad_w * mf[:, None], axis=0)
        if want_shift:
            mlcond = ml_i * ml_j
            out["grad_c"] = jnp.sum((c.m0 / rho_i) * grad_w * mf[:, None], axis=0)
            out["div_r"] = jnp.sum(
                (c.m0 / rho_j) * jnp.sum(-xij * grad_w, axis=-1) * mlcond * mf
            )
        return out

    idx = jnp.arange(n, dtype=jnp.int32)
    xs = (idx, keys, nbr, position, density, pressure, velocity, ml,
          particles.active)
    out = jax.lax.map(particle_fn, xs, batch_size=min(block_size, n))
    return SweepOut(
        drhodt=out["drhodt"],
        acceleration=out["acc"],
        kernel_w=out.get("kernel_w"),
        kernel_grad=out.get("kernel_grad"),
        grad_c=out.get("grad_c"),
        div_r=out.get("div_r"),
    )

"""mDBC: modified dynamic boundary condition (ghost-node density extrapolation).

TPU-native version of the reference's mDBC path (reference
``src/SPHCellList.jl:219-266`` ghost neighbor loop, ``:319-365`` pair moments,
``:598-622`` correction): instead of per-ghost scalar loops with Bumper
scratch, we

  * compact the (static-count) boundary particles that carry ghost nodes into
    a fixed-size index list,
  * gather fluid neighbors of each ghost point through the same row-segment
    cell-list machinery as the main sweep (full 3^D stencil = S rows x 3
    x-adjacent cells),
  * accumulate the first-order moment system b (D+1) / A (D+1)^2 as batched
    outer products, and
  * solve all (D+1)x(D+1) systems at once with closed-form adjugate solves
    (3x3 / 4x4) - no LAPACK, pure VPU math.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import ParticleType
from ..models import kernels as K
from .cell_list import Grid, cell_coords, clamp_coords, row_segments


def _det_solve(A, b):
    """Batched determinant + adjugate solve for (D+1) in {3, 4}.

    Returns (det, x) with x = adj(A) b / det; caller masks on |det|.
    """
    n = A.shape[-1]
    if n == 3:
        det = (
            A[..., 0, 0] * (A[..., 1, 1] * A[..., 2, 2] - A[..., 1, 2] * A[..., 2, 1])
            - A[..., 0, 1] * (A[..., 1, 0] * A[..., 2, 2] - A[..., 1, 2] * A[..., 2, 0])
            + A[..., 0, 2] * (A[..., 1, 0] * A[..., 2, 1] - A[..., 1, 1] * A[..., 2, 0])
        )
        # Cramer's rule: x_k = det(A with column k replaced by b) / det(A)
        cols = []
        for kcol in range(3):
            Ak = A.at[..., :, kcol].set(b)
            dk = (
                Ak[..., 0, 0] * (Ak[..., 1, 1] * Ak[..., 2, 2] - Ak[..., 1, 2] * Ak[..., 2, 1])
                - Ak[..., 0, 1] * (Ak[..., 1, 0] * Ak[..., 2, 2] - Ak[..., 1, 2] * Ak[..., 2, 0])
                + Ak[..., 0, 2] * (Ak[..., 1, 0] * Ak[..., 2, 1] - Ak[..., 1, 1] * Ak[..., 2, 0])
            )
            cols.append(dk)
        x = jnp.stack(cols, axis=-1) / det[..., None]
        return det, x
    if n == 4:
        def det4(M):
            def det3(m):
                return (
                    m[..., 0, 0] * (m[..., 1, 1] * m[..., 2, 2] - m[..., 1, 2] * m[..., 2, 1])
                    - m[..., 0, 1] * (m[..., 1, 0] * m[..., 2, 2] - m[..., 1, 2] * m[..., 2, 0])
                    + m[..., 0, 2] * (m[..., 1, 0] * m[..., 2, 1] - m[..., 1, 1] * m[..., 2, 0])
                )
            total = 0.0
            cols_idx = [0, 1, 2, 3]
            sign = 1.0
            for kk in range(4):
                rest = [ci for ci in cols_idx if ci != kk]
                minor = M[..., 1:, :][..., :, rest]
                total = total + sign * M[..., 0, kk] * det3(minor)
                sign = -sign
            return total

        det = det4(A)
        cols = []
        for kcol in range(4):
            Ak = A.at[..., :, kcol].set(b)
            cols.append(det4(Ak))
        x = jnp.stack(cols, axis=-1) / det[..., None]
        return det, x
    raise ValueError(f"unsupported system size {n}")


def mdbc_density_correction(
    spec,
    grid: Grid,
    cseg: int,
    particles,
    cell_start,
    boundary_capacity: int,
    global_position=None,
    global_density=None,
    global_ptype=None,
    use_pallas: bool = False,
    mpc: int = 0,
    pallas_interpret: bool = False,
):
    """Return the corrected density array.

    For every boundary particle with a nonzero ghost point: gather fluid
    neighbors of the ghost point, build b / A, then (reference
    SPHCellList.jl:606-621):

      |det A| >= 1e-3 : rho = sol[0] + grad(rho) . (r_b - r_ghost)
      elif A[0,0] > 0 : Shepard fallback rho = b[0] / A[0,0]
      NaN             : rho0
    """
    kern = spec.kernel
    c = spec.constants
    g_pos = particles.position if global_position is None else global_position
    g_rho = particles.density if global_density is None else global_density
    g_typ = particles.ptype if global_ptype is None else global_ptype
    n = g_pos.shape[0]

    ghost = particles.ghost_points
    has_ghost = jnp.any(ghost != 0, axis=-1) & particles.active
    # Static-size compaction of boundary indices (count fixed per run).
    (bidx,) = jnp.nonzero(has_ghost, size=boundary_capacity, fill_value=0)
    bvalid = has_ghost[bidx]

    gpoint = ghost[bidx]                                   # [B, D]
    gcoords = clamp_coords(cell_coords(gpoint, kern.H_inv), grid)

    if use_pallas:
        # fused cell kernel for the moment accumulation (the gather loop
        # below is the mdbc analog of the slow XLA sweep); fluid-only test
        # rides the motion-limiter field (ml == 1 <=> FLUID).
        if global_position is not None or global_density is not None \
                or global_ptype is not None:
            # the kernel reads the LOCAL particle fields: silently dropping
            # gathered global arrays would index a global cell_start into a
            # local slab and clamp into wrong-but-finite boundary densities
            raise ValueError(
                "mdbc_density_correction(use_pallas=True) does not take "
                "global_* overrides; use the gather path or "
                "mdbc_density_correction_sharded"
            )
        from .pallas_mdbc import pallas_mdbc_moments

        bvec, Amat = pallas_mdbc_moments(
            spec, grid, mpc, cseg, gpoint, bvalid,
            particles.position, particles.density, particles.motion_limiter,
            cell_start, interpret=pallas_interpret,
        )
        return _mdbc_apply(spec, particles, bidx, bvalid, gpoint, bvec, Amat)

    def ghost_fn(xs):
        # per-ghost moment accumulation; lax.map batches this, bounding the
        # transient gather footprint (a 20k-ghost 3D case would otherwise
        # materialize GB-scale [B, S*CSEG, (D+1)^2] intermediates).
        gp_i, coords_i, valid_i = xs
        start, end = row_segments(coords_i, grid, cell_start)      # [S]
        offs = jnp.arange(cseg, dtype=jnp.int32)
        j = start[:, None] + offs
        valid = j < end[:, None]
        j = jnp.clip(j, 0, n - 1).reshape(-1)
        valid = valid.reshape(-1)

        pos_j = g_pos[j]
        rho_j = g_rho[j]
        is_fluid = g_typ[j] == int(ParticleType.FLUID)

        xij = gp_i[None, :] - pos_j                        # ghost -> fluid
        d2 = jnp.sum(xij * xij, axis=-1)
        within = valid & is_fluid & (d2 <= kern.H2) & valid_i

        d = jnp.sqrt(d2)
        q = jnp.clip(d * kern.h_inv, 0.0, 2.0)
        w = K.W(kern, q)
        grad_w = K.grad_W(kern, q, xij)

        # guard masked lanes against inactive-padding densities
        rho_j = jnp.where(within, rho_j, jnp.ones_like(rho_j))
        mf = within.astype(w.dtype)
        # b = sum m0 [W, gradW]  (reference SPHCellList.jl:351)
        bv = jnp.sum(
            jnp.concatenate([(c.m0 * w)[:, None], c.m0 * grad_w], axis=-1)
            * mf[:, None],
            axis=0,
        )                                                  # [D+1]
        # A = sum outer([Vj W, Vj gradW], [1, x_ji])  (reference :353-359)
        vj = c.m0 / rho_j
        fc = jnp.concatenate([(vj * w)[:, None], vj[:, None] * grad_w], axis=-1)
        e = jnp.concatenate([jnp.ones_like(w)[:, None], -xij], axis=-1)
        Am = jnp.sum((fc[:, :, None] * e[:, None, :]) * mf[:, None, None], axis=0)
        return bv, Am

    bs = min(1024, bidx.shape[0])
    bvec, Amat = jax.lax.map(ghost_fn, (gpoint, gcoords, bvalid), batch_size=bs)
    return _mdbc_apply(spec, particles, bidx, bvalid, gpoint, bvec, Amat)


def mdbc_density_correction_sharded(
    spec,
    grid: Grid,
    cseg: int,
    particles,            # LOCAL slab Particles
    cell_start,           # [ncells+2] GLOBAL sorted rows (replicated)
    boundary_capacity: int,
    ctx,                  # sharded CommContext (inside shard_map)
    halo: int,
    mpc: int,
    pallas_interpret: bool = False,
):
    """Per-device fused mDBC on the halo path - no per-step all-gather.

    Ghost-carrying boundary particles are slab-resident and their ghost
    points sit within ~one cell of the particle, so every candidate window
    of a ghost stencil lives inside the same 1-hop halo the sweeps already
    exchange (the rebuild telemetry includes the ghost-window reach, see
    core/step.py).  Each device: ppermutes the 1-hop halos of the three
    mDBC fields (position, density, motion limiter), rebases ``cell_start``
    to extended-local coordinates, and runs the unchanged fused moment
    kernel (``ops/pallas_mdbc.py``) on its local ghosts.  Replaces the
    all-gathered ghost loop for the reference path
    ``src/SPHCellList.jl:219-266``.
    """
    from .pallas_mdbc import pallas_mdbc_moments

    C = particles.capacity
    H = halo
    dims = particles.position.shape[1]
    if C % 128 != 0 or H % 128 != 0:
        raise ValueError(f"local capacity {C} and halo {H} must be multiples of 128")

    ghost = particles.ghost_points
    has_ghost = jnp.any(ghost != 0, axis=-1) & particles.active
    (bidx,) = jnp.nonzero(has_ghost, size=boundary_capacity, fill_value=0)
    bvalid = has_ghost[bidx]
    gpoint = ghost[bidx]

    f32 = jnp.float32
    rows = [particles.position[:, d].astype(f32) for d in range(dims)]
    rows += [
        particles.density.astype(f32),
        particles.motion_limiter.astype(f32),
    ]
    pk = jnp.stack(rows, axis=0)                            # [D+2, C]
    ndev = ctx.num_devices
    fwd = [(i, i + 1) for i in range(ndev - 1)]
    bwd = [(i + 1, i) for i in range(ndev - 1)]
    left = jax.lax.ppermute(pk[:, C - H:], ctx.axis, fwd)
    right = jax.lax.ppermute(pk[:, :H], ctx.axis, bwd)
    ext = jnp.concatenate([left, pk, right], axis=1)        # [D+2, C+2H]

    base = ctx.rank() * C
    cs_ext = jnp.clip(cell_start - (base - H), 0, C + 2 * H).astype(jnp.int32)

    bvec, Amat = pallas_mdbc_moments(
        spec, grid, mpc, cseg, gpoint, bvalid,
        ext[:dims].T, ext[dims], ext[dims + 1], cs_ext,
        interpret=pallas_interpret,
    )
    bvec = bvec.astype(particles.density.dtype)
    Amat = Amat.astype(particles.density.dtype)
    return _mdbc_apply(spec, particles, bidx, bvalid, gpoint, bvec, Amat)


def _mdbc_apply(spec, particles, bidx, bvalid, gpoint, bvec, Amat):
    """Det-solve + Shepard/NaN decision tree (reference SPHCellList.jl:606-621),
    shared by the gather and Pallas moment paths."""
    c = spec.constants
    det, sol = _det_solve(Amat, bvec)
    diff = particles.position[bidx] - gpoint
    rho_solve = sol[..., 0] + jnp.sum(sol[..., 1:] * diff, axis=-1)
    rho_shepard = bvec[..., 0] / Amat[..., 0, 0]

    rho_old = particles.density[bidx]
    use_solve = jnp.abs(det) >= 1e-3
    use_shepard = (~use_solve) & (Amat[..., 0, 0] > 0.0)

    new_rho = jnp.where(use_solve, rho_solve, jnp.where(use_shepard, rho_shepard, rho_old))
    # NaN scrub (reference :615, :618)
    new_rho = jnp.where(jnp.isnan(new_rho), jnp.full_like(new_rho, c.rho0), new_rho)
    new_rho = jnp.where(bvalid, new_rho, rho_old)

    return particles.density.at[bidx].set(new_rho)

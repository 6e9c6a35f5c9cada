"""mDBC ghost-node density extrapolation vs a brute-force transcription of
the reference path (NeighborLoopMDBC!/ComputeInteractionsMDBC!/
ApplyMDBCCorrection, SPHCellList.jl:219-266, 319-365, 598-622)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sphexample_tpu.config import (
    DensityDiffusionModel,
    KernelFamily,
    SimulationConstants,
    ViscosityModel,
    make_kernel,
)
from sphexample_tpu.ops import cell_list as cl
from sphexample_tpu.ops.interactions import PhysicsSpec
from sphexample_tpu.ops.mdbc import mdbc_density_correction
from sphexample_tpu.state import allocate_particles

from reference_impl import brute_force_mdbc


@pytest.mark.parametrize("dims", [2, pytest.param(3, marks=pytest.mark.slow)])
@pytest.mark.parametrize("use_pallas", [False, True])
def test_mdbc_matches_brute_force(dims, use_pallas):
    rng = np.random.default_rng(7)
    const = SimulationConstants(dx=0.05)
    kern = make_kernel(KernelFamily.WENDLAND_C2, dims, dx=const.dx)

    n_b, n_f = 40, 160
    n = n_b + n_f
    # boundary slab at x<0 with ghosts pointing into the fluid, fluid at x>0
    pos_b = rng.uniform(-0.15, 0.0, size=(n_b, dims))
    pos_f = rng.uniform(0.0, 0.4, size=(n_f, dims))
    pos = np.concatenate([pos_b, pos_f])
    ghost = np.zeros_like(pos)
    ghost[:n_b] = pos_b + np.array([0.1] + [0.0] * (dims - 1))
    dens = rng.uniform(995, 1040, size=n)
    ptype = np.concatenate([np.full(n_b, 2), np.full(n_f, 1)]).astype(np.int32)

    # the Pallas moment kernel needs 128-multiple capacity >= cseg + 128
    parts = allocate_particles(
        pos, dens, ptype, np.ones(n, np.int32), np.arange(1, n + 1),
        dtype=jnp.float64, capacity=512 if use_pallas else None,
    )
    parts = parts.replace(ghost_points=parts.ghost_points.at[:n].set(jnp.asarray(ghost)))

    grid = cl.grid_from_positions(pos, kern.H_inv, margin_cells=3)
    sorted_p, cell_start, _ = cl.rebuild(parts, kern.H_inv, grid)

    spec = PhysicsSpec(
        constants=const, kernel=kern,
        viscosity=ViscosityModel.ZERO, diffusion=DensityDiffusionModel.ZERO,
    )
    new_dens = mdbc_density_correction(
        spec, grid, cseg=256 if use_pallas else 3 * 64, particles=sorted_p,
        cell_start=cell_start, boundary_capacity=n_b,
        use_pallas=use_pallas, mpc=64, pallas_interpret=True,
    )

    ref = brute_force_mdbc(
        kern, const,
        np.asarray(sorted_p.cell), np.asarray(sorted_p.position),
        np.asarray(sorted_p.density), np.asarray(sorted_p.ptype),
        np.asarray(sorted_p.ghost_points), kern.H_inv,
    )
    # the Pallas moment kernel accumulates in f32 (TPU VPU); the solve
    # amplifies to ~1e-5 relative on the corrected densities
    rtol = 3e-5 if use_pallas else 1e-8
    np.testing.assert_allclose(np.asarray(new_dens), ref, rtol=rtol, atol=1e-8)
    # fluid densities untouched
    is_fluid = np.asarray(sorted_p.ptype) == 1
    np.testing.assert_array_equal(
        np.asarray(new_dens)[is_fluid], np.asarray(sorted_p.density)[is_fluid]
    )


def test_mdbc_no_neighbors_keeps_density():
    const = SimulationConstants(dx=0.05)
    kern = make_kernel(KernelFamily.WENDLAND_C2, 2, dx=const.dx)
    pos = np.array([[0.0, 0.0]])
    ghost = np.array([[5.0, 5.0]])  # far away: zero moments
    parts = allocate_particles(
        pos, np.array([990.0]), np.array([2], np.int32), np.array([1], np.int32),
        np.array([1]), dtype=jnp.float64,
    )
    parts = parts.replace(ghost_points=jnp.asarray(ghost))
    grid = cl.Grid(cmin=(-2, -2), shape=(40, 40))
    sorted_p, cell_start, _ = cl.rebuild(parts, kern.H_inv, grid)
    spec = PhysicsSpec(
        constants=const, kernel=kern,
        viscosity=ViscosityModel.ZERO, diffusion=DensityDiffusionModel.ZERO,
    )
    out = mdbc_density_correction(spec, grid, 12, sorted_p, cell_start, 1)
    assert float(out[0]) == pytest.approx(990.0)


@pytest.mark.slow
def test_mdbc_pallas_step_plumbing():
    """A full sph_step with use_pallas (interpret) must route the mDBC
    correction through the fused moment kernel and match the gather-path
    step to f32-kernel tolerance."""
    import dataclasses

    import jax.numpy as _jnp

    from sphexample_tpu import (
        DensityDiffusionModel as DD,
        KernelFamily as KF,
        MDBCMode,
        SimulationConstants as SC,
        SimulationMetaData as SM,
        ViscosityModel as VM,
        assemble_simulation,
        make_kernel,
    )
    from sphexample_tpu.core.step import sph_step

    const = SC(dx=0.02, c0=40.0, cfl=0.3)
    kern = make_kernel(KF.WENDLAND_C2, 2, dx=const.dx)
    dx = const.dx
    xs, zs = np.meshgrid(np.arange(10), np.arange(10), indexing="ij")
    fluid = np.stack([xs.ravel() * dx, zs.ravel() * dx + dx], axis=-1)
    floor_x = np.arange(-4, 14) * dx
    floor = np.stack([floor_x, np.zeros_like(floor_x)], axis=-1)
    pos = np.concatenate([floor, fluid])
    nb = len(floor)
    ptype = np.concatenate([np.full(nb, 2), np.full(len(fluid), 1)]).astype(np.int32)
    ghost = floor + np.array([0.0, dx])
    ghostn = np.tile(np.array([[0.0, dx]]), (nb, 1))

    def build(use_pallas):
        meta = SM(
            simulation_name="mp", save_location=".", dims=2, dtype="float64",
            simulation_time=0.01, output_times=0.002, grid_margin_cells=4,
            mdbc=MDBCMode.SIMPLE, use_pallas=use_pallas,
        )
        sim = assemble_simulation(
            pos, np.full(len(pos), const.rho0), ptype,
            np.ones(len(pos), np.int32), np.arange(1, len(pos) + 1),
            meta, const, kern, VM.ARTIFICIAL, DD.LINEAR,
            ghost_points=ghost, ghost_normals=ghostn,
        )
        if use_pallas:
            sim.cfg = dataclasses.replace(sim.cfg, pallas_interpret=True)
        return sim

    sim_p = build(True)
    sim_g = build(False)
    assert sim_p.cfg.use_pallas and sim_p.cfg.meta.mdbc is MDBCMode.SIMPLE

    dx0 = _jnp.asarray(1.0 + kern.h, dtype=_jnp.float64)
    sp, _ = sph_step(sim_p.cfg, sim_p.state, dx0)
    sg, _ = sph_step(sim_g.cfg, sim_g.state, dx0)

    # compare live particles in ID order (capacities differ: the Pallas
    # path pads to a 128 multiple)
    def by_id(state):
        ids = np.asarray(state.particles.id)
        order = np.argsort(ids)
        return order[ids[order] > 0]

    op, og = by_id(sp), by_id(sg)
    dens_p = np.asarray(sp.particles.density)[op]
    dens_g = np.asarray(sg.particles.density)[og]
    # both paths corrected boundary densities (mdbc active)
    assert (np.abs(dens_g - const.rho0) > 1e-12).any()
    # f32 Pallas moment kernel vs f64 gather path
    np.testing.assert_allclose(dens_p, dens_g, rtol=5e-5, atol=1e-6)
    # the whole Pallas sweep runs f32 while the gather sim is f64: the
    # acceleration check only guards gross plumbing errors (|a| ~ g)
    np.testing.assert_allclose(
        np.asarray(sp.particles.acceleration)[op],
        np.asarray(sg.particles.acceleration)[og], rtol=1e-3, atol=0.05,
    )


@pytest.mark.slow
@pytest.mark.parametrize("edge", [False, True])
def test_mdbc_pallas_crowded_chunk_boundaries(edge):
    """Stress the fused moment kernel exactly where hardware found its one
    bug (rank aliasing past mpc, PERFORMANCE.md): a single ghost cell
    crowded far beyond one R-chunk (multiple chunk programs per cell),
    candidate row segments straddling several 128-lane chunks, and - with
    ``edge`` - the ghost cell pinned at the grid corner so stencil rows
    clamp."""
    rng = np.random.default_rng(11)
    dims = 2
    const = SimulationConstants(dx=0.05)
    kern = make_kernel(KernelFamily.WENDLAND_C2, dims, dx=const.dx)
    pitch = kern.H  # cell pitch

    # the crowded cell: center at the grid edge or the interior
    ccell = np.array([0, 0]) if edge else np.array([3, 3])
    center = ccell * pitch

    # 90 ghosts inside ONE cell -> ceil(90/32) = 3 chunk programs
    n_b = 90
    gpts = center + rng.uniform(-0.45, 0.45, size=(n_b, dims)) * pitch
    # boundary particles themselves live in a far-away cell
    pos_b = rng.uniform(0, 0.4, size=(n_b, dims)) + np.array([12 * pitch, 0.0])

    # dense fluid: ~240 particles packed into the 3-cell x-row of the ghost
    # cell -> candidate segments cross the 128- and 256-lane chunk edges
    n_f = 240
    fx = rng.uniform(-1.45, 1.45, size=n_f) * pitch + center[0]
    fz = rng.uniform(-0.49, 0.49, size=n_f) * pitch + center[1]
    pos_f = np.stack([fx, fz], axis=-1)

    pos = np.concatenate([pos_b, pos_f])
    n = n_b + n_f
    dens = rng.uniform(995, 1040, size=n)
    ptype = np.concatenate([np.full(n_b, 2), np.full(n_f, 1)]).astype(np.int32)
    ghost = np.zeros_like(pos)
    ghost[:n_b] = gpts

    parts = allocate_particles(
        pos, dens, ptype, np.ones(n, np.int32), np.arange(1, n + 1),
        dtype=jnp.float64, capacity=1024,
    )
    parts = parts.replace(
        ghost_points=parts.ghost_points.at[:n].set(jnp.asarray(ghost))
    )
    if edge:
        # grid whose corner IS the crowded cell
        grid = cl.Grid(cmin=(0, 0), shape=(16, 16))
    else:
        grid = cl.grid_from_positions(pos, kern.H_inv, margin_cells=3)
    sorted_p, cell_start, _ = cl.rebuild(parts, kern.H_inv, grid)

    spec = PhysicsSpec(
        constants=const, kernel=kern,
        viscosity=ViscosityModel.ZERO, diffusion=DensityDiffusionModel.ZERO,
    )
    new_dens = mdbc_density_correction(
        spec, grid, cseg=384, particles=sorted_p, cell_start=cell_start,
        boundary_capacity=n_b, use_pallas=True, mpc=64, pallas_interpret=True,
    )
    ref = brute_force_mdbc(
        kern, const,
        np.asarray(sorted_p.cell), np.asarray(sorted_p.position),
        np.asarray(sorted_p.density), np.asarray(sorted_p.ptype),
        np.asarray(sorted_p.ghost_points), kern.H_inv,
    )
    np.testing.assert_allclose(np.asarray(new_dens), ref, rtol=3e-5, atol=1e-8)
    # every crowded ghost actually got a correction (dense fluid all around)
    is_b = np.asarray(sorted_p.ptype) == 2
    changed = np.abs(np.asarray(new_dens) - np.asarray(sorted_p.density)) > 1e-12
    if not edge:
        assert changed[is_b].mean() > 0.9

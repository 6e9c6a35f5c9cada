"""Full-step tests: the isolated-particle physics-invariant regression from the
reference suite (test/runtests.jl:18-75) plus hydrostatic sanity on a tiny
still-water column."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sphexample_tpu import (
    DensityDiffusionModel,
    KernelFamily,
    SimulationConstants,
    SimulationMetaData,
    ViscosityModel,
    assemble_simulation,
    make_kernel,
)
from sphexample_tpu.core.step import make_fixed_steps_fn


def test_isolated_particle_free_fall():
    """A single fluid particle in free fall for 500 steps: density stays rho0,
    pressure stays 0, x unchanged, vertical velocity negative
    (reference test/runtests.jl:18-75)."""
    const = SimulationConstants()
    kern = make_kernel(KernelFamily.WENDLAND_C2, 2, dx=const.dx)
    meta = SimulationMetaData(
        simulation_name="iso",
        save_location=".",
        dims=2,
        dtype="float64",
        block_size=8,
        grid_margin_cells=3,
    )
    sim = assemble_simulation(
        np.zeros((1, 2)),
        np.array([const.rho0]),
        np.array([1], dtype=np.int32),
        np.array([1], dtype=np.int32),
        np.array([1]),
        meta, const, kern,
        ViscosityModel.ZERO, DensityDiffusionModel.ZERO,
    )
    run = make_fixed_steps_fn(sim.cfg, 500)
    final = run(sim.state)

    dens = float(final.particles.density[0])
    pres = float(final.particles.pressure[0])
    pos = np.asarray(final.particles.position[0])
    vel = np.asarray(final.particles.velocity[0])

    assert dens == pytest.approx(const.rho0, abs=1e-10)
    # pressure amplifies ulp-level density drift by Cb ~ 1e6; 1e-9 here is the
    # same physical zero as the reference's 1e-10 on its exactly-zero path
    assert pres == pytest.approx(0.0, abs=1e-9)
    assert pos[0] == pytest.approx(0.0, abs=1e-12)
    assert vel[0] == pytest.approx(0.0, abs=1e-12)
    assert vel[1] < 0
    # kinematics: v = -g * t
    t = float(final.total_time)
    assert vel[1] == pytest.approx(-const.g * t, rel=1e-9)


def test_fixed_particle_never_moves():
    """Boundary (Fixed) particles must not move and their density is clamped
    at >= rho0."""
    const = SimulationConstants()
    kern = make_kernel(KernelFamily.WENDLAND_C2, 2, dx=const.dx)
    meta = SimulationMetaData(
        simulation_name="fixed", save_location=".", dims=2, dtype="float64",
        block_size=8, grid_margin_cells=3,
    )
    pos = np.array([[0.0, 0.0], [const.dx, 0.0]])
    sim = assemble_simulation(
        pos,
        np.array([990.0, const.rho0]),
        np.array([2, 2], dtype=np.int32),
        np.array([1, 1], dtype=np.int32),
        np.array([1, 2]),
        meta, const, kern,
        ViscosityModel.ZERO, DensityDiffusionModel.ZERO,
    )
    run = make_fixed_steps_fn(sim.cfg, 50)
    final = run(sim.state)
    # fixed particles do not move (ID order is preserved here: both fixed)
    order = np.argsort(np.asarray(final.particles.id))
    np.testing.assert_allclose(np.asarray(final.particles.position)[order], pos, atol=1e-14)
    assert np.all(np.asarray(final.particles.density) >= const.rho0 - 1e-12)


def test_two_symmetric_particles_repel_symmetrically():
    """Two close fluid particles at rest, no gravity: pressure forces are
    equal and opposite along the separation axis."""
    const = SimulationConstants(g=0.0, c0=30.0)
    kern = make_kernel(KernelFamily.WENDLAND_C2, 2, dx=const.dx)
    meta = SimulationMetaData(
        simulation_name="pair", save_location=".", dims=2, dtype="float64",
        block_size=8, grid_margin_cells=3,
    )
    pos = np.array([[-const.dx / 2, 0.0], [const.dx / 2, 0.0]])
    sim = assemble_simulation(
        pos,
        np.array([1010.0, 1010.0]),  # compressed -> positive pressure
        np.array([1, 1], dtype=np.int32),
        np.array([1, 1], dtype=np.int32),
        np.array([1, 2]),
        meta, const, kern,
        ViscosityModel.ZERO, DensityDiffusionModel.ZERO,
    )
    run = make_fixed_steps_fn(sim.cfg, 5)
    final = run(sim.state)
    order = np.argsort(np.asarray(final.particles.id))
    v = np.asarray(final.particles.velocity)[order]
    p = np.asarray(final.particles.position)[order]
    # mirror symmetry about x=0
    assert v[0, 0] == pytest.approx(-v[1, 0], rel=1e-10)
    assert p[0, 0] == pytest.approx(-p[1, 0], rel=1e-10)
    # repulsion: moving apart
    assert v[1, 0] > 0
    # no vertical motion
    assert abs(v[0, 1]) < 1e-12 and abs(v[1, 1]) < 1e-12


def test_interval_runs_to_output_time():
    from sphexample_tpu.core.step import make_interval_fn

    const = SimulationConstants()
    kern = make_kernel(KernelFamily.WENDLAND_C2, 2, dx=const.dx)
    meta = SimulationMetaData(
        simulation_name="interval", save_location=".", dims=2, dtype="float64",
        block_size=8, grid_margin_cells=3,
    )
    sim = assemble_simulation(
        np.zeros((1, 2)),
        np.array([const.rho0]),
        np.array([1], dtype=np.int32),
        np.array([1], dtype=np.int32),
        np.array([1]),
        meta, const, kern,
        ViscosityModel.ZERO, DensityDiffusionModel.ZERO,
    )
    interval = make_interval_fn(sim.cfg)
    t_out = 0.005
    final = interval(sim.state, jnp.asarray(t_out, dtype=jnp.float64))
    # loop runs while total_time <= t_out (reference SPHCellList.jl:742)
    assert float(final.total_time) > t_out
    assert float(final.total_time) - float(final.current_dt) <= t_out
    assert int(final.iteration) > 0

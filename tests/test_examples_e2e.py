"""End-to-end mini-runs of the real example decks: Duckling Dp0.01 (3D
mDBC, ~13k ghosts - the case the fused moment kernel was built for,
reference ``example/DucklingMDBC.jl``), MovingSquare Dp0.04
(PlanarShifting + LaminarSPS + prescribed rigid-body motion, reference
``example/MovingSquare2d.jl``), and StillWedgeMiddleSquare Dp0.02
(multi-object mDBC, reference ``example/StillWedgeMiddleSquareMDBC.jl``).
Reduced t_end on the CPU lane; the full t_end chip runs are recorded in
PERFORMANCE.md.  Assertions in the style of
``test_still_wedge_pressure_profile``: finite fields, density band, body
motion exact, mDBC correction active."""

import math
import os

import numpy as np
import pytest

from sphexample_tpu import (
    DensityDiffusionModel,
    Geometry,
    KernelFamily,
    MDBCMode,
    MotionDetails,
    ParticleType,
    ShiftingMode,
    SimulationConstants,
    SimulationMetaData,
    ViscosityModel,
    build_simulation,
    make_kernel,
    run_simulation,
)

BASE = "/root/reference/input"


@pytest.mark.slow
def test_still_wedge_middle_square_mini_run(tmp_path):
    """The real StillWedgeMiddleSquare Dp0.02 deck (multi-object mDBC: wedge
    walls + a submerged square in one boundary set, reference
    ``example/StillWedgeMiddleSquareMDBC.jl:7-61``) to t=0.1 s: the water
    stays STILL around the obstacle, the hydrostatic profile holds, and the
    mDBC extrapolation fires on the combined boundary.  Bands carry ~3x
    headroom over the measured run (dens [1000.10, 1002.52], hydro err
    mean 0.75% / max 2.3%, |v|max 0.073 m/s)."""
    deck = f"{BASE}/still_wedge_middle_square_mdbc/StillWedge_MiddleSquare_Dp0.02"
    if not os.path.exists(f"{deck}_Fluid.csv"):
        pytest.skip("reference input CSVs unavailable")
    const = SimulationConstants(dx=0.02, c0=42.48576250492629,
                                delta_sph=0.1, cfl=0.5)
    kern = make_kernel(KernelFamily.WENDLAND_C2, 2, dx=const.dx)
    geoms = [
        Geometry(csv_file=f"{deck}_Bound.csv", group_marker=1,
                 type=ParticleType.FIXED),
        Geometry(csv_file=f"{deck}_Fluid.csv", group_marker=2,
                 type=ParticleType.FLUID),
    ]
    meta = SimulationMetaData(
        simulation_name="MiddleSquareMini", save_location=str(tmp_path),
        dims=2, simulation_time=0.1, output_times=0.05, dtype="float32",
        mdbc=MDBCMode.SIMPLE, block_size=256,
    )
    sim = build_simulation(
        geoms, meta, const, kern,
        ViscosityModel.ARTIFICIAL, DensityDiffusionModel.LINEAR,
        particle_normals_path=f"{deck}_GhostNodes.csv",
    )
    p0 = sim.state.particles
    bound0 = np.asarray(p0.ptype) == int(ParticleType.FIXED)
    rho_b0 = np.asarray(p0.density)[bound0].copy()

    sim = run_simulation(sim)
    p = sim.state.particles
    act = np.asarray(p.active)
    fluid = (np.asarray(p.ptype) == int(ParticleType.FLUID)) & act
    bound = (np.asarray(p.ptype) == int(ParticleType.FIXED)) & act

    assert int(sim.state.iteration) > 100
    pos = np.asarray(p.position)
    dens = np.asarray(p.density)
    pres = np.asarray(p.pressure)
    vel = np.asarray(p.velocity)
    assert np.isfinite(pos[act]).all() and np.isfinite(dens[act]).all()
    # still water: the submerged square must not stir the tank
    assert np.abs(vel[fluid]).max() < 0.25
    assert dens[fluid].min() > 998.0 and dens[fluid].max() < 1006.0, (
        dens[fluid].min(), dens[fluid].max())
    # hydrostatic profile holds around the obstacle (wedge-test style)
    z = pos[fluid, -1]
    ph = 1000.0 * 9.81 * (z.max() - z)
    deep = ph > 0.05 * ph.max()
    err = np.abs(pres[fluid][deep] - ph[deep]) / ph.max()
    assert err.mean() < 0.02 and err.max() < 0.05, (
        f"hydrostatic err mean {err.mean():.4f} max {err.max():.4f}")
    # the mDBC correction fired on the multi-object boundary set
    assert np.abs(dens[bound] - rho_b0.mean()).max() > 1e-3


@pytest.mark.slow
def test_duckling_mdbc_mini_run(tmp_path):
    """The real Duckling Dp0.01 deck (34k particles, 13k ghost nodes) for
    ~2 output intervals: mDBC holds the floor, density stays weakly
    compressible, nothing NaNs."""
    deck = f"{BASE}/case_duckling_mdbc/CaseDuckling_Dp0.01"
    if not os.path.exists(f"{deck}_Fluid_MDBC.csv"):
        pytest.skip("reference input CSVs unavailable")
    const = SimulationConstants(
        dx=0.01, c0=23.43842998154953, delta_sph=0.1, cfl=0.2, alpha=0.02,
        m0=0.001,
    )
    kern = make_kernel(KernelFamily.WENDLAND_C2, 3, dx=const.dx, k=1.5)
    geoms = [
        Geometry(csv_file=f"{deck}_Bound_MDBC.csv", group_marker=1,
                 type=ParticleType.FIXED),
        Geometry(csv_file=f"{deck}_Fluid_MDBC.csv", group_marker=2,
                 type=ParticleType.FLUID),
    ]
    meta = SimulationMetaData(
        simulation_name="DucklingMini", save_location=str(tmp_path), dims=3,
        simulation_time=0.004, output_times=0.002, dtype="float32",
        mdbc=MDBCMode.SIMPLE, block_size=256,
    )
    sim = build_simulation(
        geoms, meta, const, kern,
        ViscosityModel.ARTIFICIAL, DensityDiffusionModel.LINEAR,
        particle_normals_path=f"{deck}_GhostNodes.csv",
    )
    assert sim.cfg.boundary_capacity > 10_000  # the ghost set actually loaded
    rho_b0 = None
    p = sim.state.particles
    bound0 = np.asarray(p.ptype) == int(ParticleType.FIXED)
    rho_b0 = np.asarray(p.density)[bound0].copy()
    z_floor = np.asarray(p.position)[bound0, -1].min()

    sim = run_simulation(sim)
    p = sim.state.particles
    act = np.asarray(p.active)
    fluid = (np.asarray(p.ptype) == int(ParticleType.FLUID)) & act
    bound = (np.asarray(p.ptype) == int(ParticleType.FIXED)) & act

    pos = np.asarray(p.position)
    dens = np.asarray(p.density)
    assert np.isfinite(pos[act]).all() and np.isfinite(dens[act]).all()
    assert int(sim.state.iteration) > 10
    # weakly compressible band around rho0 during early settling
    assert dens[fluid].min() > 985 and dens[fluid].max() < 1030, (
        dens[fluid].min(), dens[fluid].max())
    # the mDBC correction actually fired: boundary densities moved off their
    # initial values (the ghost-node hydrostatic extrapolation)
    assert np.abs(dens[bound] - rho_b0.mean()).max() > 1e-3
    # mDBC floor holds: no fluid particle below the lowest boundary layer
    assert pos[fluid, -1].min() > z_floor - 2 * const.dx


@pytest.mark.slow
def test_moving_square_mini_run(tmp_path):
    """The real MovingSquare Dp0.04 deck (28k particles, LaminarSPS +
    PlanarShifting + MOVING body) for ~2 output intervals: the square
    translates at exactly the prescribed 2.8 m/s, the fluid stays finite and
    weakly compressible."""
    deck = f"{BASE}/moving_square_2d/MovingSquare_Dp0.04"
    if not os.path.exists(f"{deck}_Fluid.csv"):
        pytest.skip("reference input CSVs unavailable")
    const = SimulationConstants(
        dx=0.04, c0=28.0, delta_sph=0.1, g=0.0, Cb=112000.0, alpha=1e-6,
        cfl=0.2,
    )
    kern = make_kernel(KernelFamily.WENDLAND_C2, 2, dx=const.dx,
                       k=math.sqrt(2))
    geoms = [
        Geometry(csv_file=f"{deck}_Fixed.csv", group_marker=1,
                 type=ParticleType.FIXED),
        Geometry(csv_file=f"{deck}_Fluid.csv", group_marker=2,
                 type=ParticleType.FLUID),
        Geometry(csv_file=f"{deck}_Square.csv", group_marker=3,
                 type=ParticleType.MOVING,
                 motion=MotionDetails(velocity=2.8, start_time=0.0,
                                      duration=3.0, direction=(1.0, 0.0))),
    ]
    meta = SimulationMetaData(
        simulation_name="MovingSquareMini", save_location=str(tmp_path),
        dims=2, simulation_time=0.016, output_times=0.008, dtype="float32",
        shifting=ShiftingMode.PLANAR, block_size=256,
    )
    sim = build_simulation(
        geoms, meta, const, kern,
        ViscosityModel.LAMINAR_SPS, DensityDiffusionModel.LINEAR,
    )
    p = sim.state.particles
    sq0 = np.asarray(p.group_marker) == 3
    x_sq0 = np.asarray(p.position)[sq0, 0].mean()

    sim = run_simulation(sim)
    p = sim.state.particles
    act = np.asarray(p.active)
    fluid = (np.asarray(p.ptype) == int(ParticleType.FLUID)) & act
    sq = (np.asarray(p.group_marker) == 3) & act

    t = float(sim.state.total_time)
    assert t > 0.016 and int(sim.state.iteration) > 10
    pos = np.asarray(p.position)
    dens = np.asarray(p.density)
    vel = np.asarray(p.velocity)
    assert np.isfinite(pos[act]).all() and np.isfinite(dens[act]).all()
    # prescribed kinematics are exact: mean square x advanced by 2.8 t
    adv = pos[sq, 0].mean() - x_sq0
    np.testing.assert_allclose(adv, 2.8 * t, rtol=1e-4)
    # square particles carry the prescribed velocity during the motion
    np.testing.assert_allclose(vel[sq, 0], 2.8, rtol=1e-5)
    # the impulsive start (v jumps 0 -> 2.8 at t=0) water-hammers the front
    # face: the acoustic transient is delta_rho = rho v / c0 = 100 on top of
    # rho0 (measured 1109.3 at t=0.016) - physical, so the band admits it;
    # the bulk stays at rho0
    assert dens[fluid].min() > 950 and dens[fluid].max() < 1150, (
        dens[fluid].min(), dens[fluid].max())
    assert abs(np.median(dens[fluid]) - 1000.0) < 5.0
    # g=0: fluid momentum comes only from the body - speeds bounded by a
    # few x the body speed even at the stagnation point
    assert np.abs(vel[fluid]).max() < 3 * 2.8

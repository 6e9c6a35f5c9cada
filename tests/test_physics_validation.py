"""Physics validation beyond unit parity: dam-break front propagation and
hydrostatic equilibrium (SURVEY.md section 4 calls for exactly these)."""

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
    run_simulation,
    make_kernel,
)
from sphexample_tpu.io.casegen import dam_break_2d


@pytest.mark.slow
def test_dam_break_front_speed():
    """The collapsing 2D column's leading edge must propagate at the order of
    the shallow-water (Ritter) speed 2 sqrt(g h0): between 0.8x and 1.2x of
    the ideal front position growth at t=0.15 s (WCSPH fronts run slightly
    slow due to wall friction and viscosity)."""
    dx = 0.02
    const = SimulationConstants(dx=dx, c0=34.0, cfl=0.3, alpha=0.02)
    kern = make_kernel(KernelFamily.WENDLAND_C2, 2, dx=dx)
    meta = SimulationMetaData(
        simulation_name="front", save_location="out/front", dims=2,
        simulation_time=0.15, output_times=0.05, dtype="float32",
        block_size=256,
    )
    pos, dens, ptype, grp, idp = dam_break_2d(dx)
    sim = assemble_simulation(
        pos, dens, ptype, grp, idp, meta, const, kern,
        ViscosityModel.ARTIFICIAL, DensityDiffusionModel.LINEAR,
    )
    fluid0 = pos[ptype == 1]
    x_front0 = fluid0[:, 0].max()
    h0 = fluid0[:, 1].max()

    sim = run_simulation(sim)
    p = sim.state.particles
    is_fluid = np.asarray(p.ptype) == 1
    x = np.asarray(p.position)[is_fluid, 0]
    z = np.asarray(p.position)[is_fluid, 1]
    # ignore stray splashes: front = 99th percentile of x
    x_front = np.quantile(x, 0.99)

    t = float(sim.state.total_time)
    advance = x_front - x_front0
    # Early-time dam-break fronts follow the Martin-Moyce experiments, not
    # Ritter's asymptotic 2 sqrt(g h0): at T* = t sqrt(2g/L) ~ 1 the measured
    # front speed is ~0.5-0.8 sqrt(g h0).  This run lands at 0.61 (observed
    # 0.159 m) - assert a band wide enough to be a regression guard while
    # catching sign errors / frozen fluid / explosions.
    speed_ratio = advance / (np.sqrt(9.81 * h0) * t)
    print(f"front speed ratio {speed_ratio:.4f} (pinned 0.61)")
    # measured 0.61 on the pinned configuration (r2/r4/r5); +-0.10 band
    # catches a ~16% physics regression while tolerating fp32 run-to-run
    # summation-order noise (observed << 0.01 on this case)
    assert 0.51 < speed_ratio < 0.71, (
        f"front advanced {advance:.3f} m (ratio {speed_ratio:.2f} of sqrt(g h0) t)"
    )
    # no particle escapes the tank (walls hold)
    assert x.max() < 1.65 and z.min() > -0.05
    # mass conservation proxy: densities stay weakly compressible
    rho = np.asarray(p.density)[is_fluid]
    assert rho.min() > 850 and rho.max() < 1150


@pytest.mark.slow
def test_hydrostatic_settling():
    """A resting fluid column over a floor settles to the hydrostatic
    pressure profile within a few percent."""
    dx = 0.02
    const = SimulationConstants(dx=dx, c0=40.0, cfl=0.4)
    kern = make_kernel(KernelFamily.WENDLAND_C2, 2, dx=dx)
    # narrow column: floor + walls from casegen's tank
    pos, dens, ptype, grp, idp = dam_break_2d(dx)
    meta = SimulationMetaData(
        simulation_name="hydro", save_location="out/hydro", dims=2,
        simulation_time=0.4, output_times=0.1, dtype="float32", block_size=256,
    )
    sim = assemble_simulation(
        pos, dens, ptype, grp, idp, meta, const, kern,
        ViscosityModel.ARTIFICIAL, DensityDiffusionModel.LINEAR,
    )
    sim = run_simulation(sim)
    p = sim.state.particles
    is_fluid = np.asarray(p.ptype) == 1
    z = np.asarray(p.position)[is_fluid, 1]
    pres = np.asarray(p.pressure)[is_fluid]
    # the column is still collapsing at t=0.4 but the *deepest* region near
    # the left wall approaches rho g h; use a loose band on deep particles
    deep = z < np.quantile(z, 0.1)
    p_deep = np.median(pres[deep])
    h_eff = np.quantile(z, 0.95) - np.median(z[deep])
    expected = 1000 * 9.81 * h_eff
    print(f"deep pressure ratio {p_deep / expected:.4f} (expect ~1)")
    # +-15% band around rho g h (VERDICT r4: the old +-30% would miss a
    # ~25% physics error; the medians are stable run-to-run)
    assert 0.85 * expected < p_deep < 1.15 * expected


@pytest.mark.slow
def test_still_wedge_pressure_profile(tmp_path):
    """The real StillWedgeMDBC case (reference example/StillWedgeMDBC.jl, its
    input CSVs + ghost normals) run to t=0.1 s must match the hydrostatic
    profile rho0 g (z_surf - z) to a few percent - the pytest version of
    ``tools/analyze_wedge.py`` (mean err ~1.2% measured, bands 3%/5%)."""
    import os

    from sphexample_tpu import Geometry, MDBCMode, ParticleType, build_simulation, run_simulation

    base = "/root/reference/input"
    bound = f"{base}/still_wedge/StillWedge_Dp0.02_Bound.csv"
    if not os.path.exists(bound):
        pytest.skip("reference input CSVs unavailable")
    const = SimulationConstants(dx=0.02, c0=42.48576250492629, delta_sph=0.1, cfl=0.5)
    kern = make_kernel(KernelFamily.WENDLAND_C2, 2, dx=const.dx)
    geoms = [
        Geometry(csv_file=bound, group_marker=1, type=ParticleType.FIXED),
        Geometry(csv_file=f"{base}/still_wedge/StillWedge_Dp0.02_Fluid.csv",
                 group_marker=2, type=ParticleType.FLUID),
    ]
    meta = SimulationMetaData(
        simulation_name="WedgeProfile", save_location=str(tmp_path), dims=2,
        simulation_time=0.1, output_times=0.05, dtype="float32",
        mdbc=MDBCMode.SIMPLE, block_size=256,
    )
    sim = build_simulation(
        geoms, meta, const, kern,
        ViscosityModel.ARTIFICIAL, DensityDiffusionModel.LINEAR,
        particle_normals_path=(
            f"{base}/still_wedge_mdbc/StillWedge_Dp0.02_GhostNodes_Correct.csv"
        ),
    )
    sim = run_simulation(sim)
    p = sim.state.particles
    fluid = np.asarray(p.ptype) == 1
    z = np.asarray(p.position)[fluid, -1]
    pres = np.asarray(p.pressure)[fluid]
    dens = np.asarray(p.density)[fluid]
    ph = 1000.0 * 9.81 * (z.max() - z)
    deep = ph > 0.05 * ph.max()  # skip the noisy free surface
    err = np.abs(pres[deep] - ph[deep]) / ph.max()
    assert np.isfinite(dens).all() and np.isfinite(pres).all()
    assert dens.min() > 1000 * 0.98 and dens.max() < 1000 * 1.05
    assert err.mean() < 0.03 and err.max() < 0.05, (
        f"hydrostatic err mean {err.mean():.4f} max {err.max():.4f}"
    )

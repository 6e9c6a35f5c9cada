"""Gather-sweep correctness: bit-level comparison against a brute-force O(N^2)
transcription of the reference pair loop, across all viscosity / diffusion /
kernel / mode combinations."""

import jax.numpy as jnp
import numpy as np
import pytest

from sphexample_tpu.config import (
    DensityDiffusionModel,
    KernelFamily,
    KernelOutputMode,
    ShiftingMode,
    SimulationConstants,
    ViscosityModel,
    make_kernel,
)
from sphexample_tpu.models import equations as eq
from sphexample_tpu.ops import cell_list as cl
from sphexample_tpu.ops.interactions import PhysicsSpec, pair_sweep
from sphexample_tpu.state import allocate_particles

from reference_impl import brute_force_sweep


def _setup(dims, n=250, seed=0, family=KernelFamily.WENDLAND_C2):
    rng = np.random.default_rng(seed)
    const = SimulationConstants(dx=0.05, cfl=0.5)
    kern = make_kernel(family, dims, dx=const.dx)
    # particles on a jittered lattice spanning a few cells
    side = int(np.ceil(n ** (1 / dims)))
    coords = np.stack(
        np.meshgrid(*([np.arange(side) * const.dx] * dims), indexing="ij"), axis=-1
    ).reshape(-1, dims)[:n]
    pos = coords + rng.uniform(-0.4, 0.4, size=(n, dims)) * const.dx
    pos -= pos.mean(axis=0)  # cover negative coords too
    dens = rng.uniform(990, 1040, size=n)
    vel = rng.normal(0, 0.5, size=(n, dims))
    ptype = rng.choice([1, 2], size=n, p=[0.8, 0.2]).astype(np.int32)
    parts = allocate_particles(
        pos, dens, ptype, np.ones(n, np.int32), np.arange(1, n + 1), dtype=jnp.float64
    )
    parts = parts.replace(velocity=jnp.asarray(vel))
    parts = parts.replace(pressure=eq.pressure(parts.density, const))
    grid = cl.grid_from_positions(pos, kern.H_inv, margin_cells=3)
    sorted_p, cell_start, _occ = cl.rebuild(parts, kern.H_inv, grid)
    return const, kern, grid, sorted_p, cell_start


VISC = [
    ViscosityModel.ZERO,
    ViscosityModel.ARTIFICIAL,
    ViscosityModel.LAMINAR,
    ViscosityModel.LAMINAR_SPS,
]
DIFF = [
    DensityDiffusionModel.ZERO,
    DensityDiffusionModel.ZERO_GRAVITY_LINEAR,
    DensityDiffusionModel.LINEAR,
    DensityDiffusionModel.COMPLEX,
]


@pytest.mark.parametrize("dims", [2, 3])
@pytest.mark.parametrize("visc", VISC)
@pytest.mark.parametrize("diff", DIFF)
def test_sweep_matches_brute_force(dims, visc, diff):
    const, kern, grid, p, cell_start = _setup(dims, n=200 if dims == 2 else 250)
    spec = PhysicsSpec(
        constants=const,
        kernel=kern,
        viscosity=visc,
        diffusion=diff,
        shifting=ShiftingMode.PLANAR,
        kernel_output=KernelOutputMode.STORE,
    )
    out = pair_sweep(
        spec, grid, cseg=3 * 64, block_size=64,
        particles=p, cell_start=cell_start,
        position=p.position, density=p.density,
        pressure=p.pressure, velocity=p.velocity,
    )
    ref = brute_force_sweep(
        kernel_family="wendland",
        kern=kern,
        const=const,
        viscosity=visc.value,
        diffusion=diff.value,
        shifting=True,
        kernel_output=True,
        cells=np.asarray(p.cell),
        pos=np.asarray(p.position),
        dens=np.asarray(p.density),
        pres=np.asarray(p.pressure),
        vel=np.asarray(p.velocity),
        ml=np.asarray(p.motion_limiter),
        active=np.asarray(p.active),
    )
    # XLA's pow differs from numpy's at ~1e-9 relative in the 7th root of the
    # COMPLEX hydrostatic term, amplified by the 1/d^2 factor (values here
    # reach ~5e3, so 0.05 absolute is ~1e-5 relative at scale).
    if diff is DensityDiffusionModel.COMPLEX:
        rtol, atol = 1e-5, 2e-6 * float(np.abs(ref["drhodt"]).max())
    else:
        rtol, atol = 1e-10, 1e-8
    np.testing.assert_allclose(np.asarray(out.drhodt), ref["drhodt"], rtol=rtol, atol=atol)
    np.testing.assert_allclose(np.asarray(out.acceleration), ref["acc"], rtol=1e-10, atol=1e-8)
    np.testing.assert_allclose(np.asarray(out.kernel_w), ref["kernel_w"], rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(out.kernel_grad), ref["kernel_grad"], rtol=1e-10, atol=1e-8
    )
    np.testing.assert_allclose(np.asarray(out.grad_c), ref["grad_c"], rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(np.asarray(out.div_r), ref["div_r"], rtol=1e-10, atol=1e-10)


@pytest.mark.slow
def test_sweep_cubic_spline_kernel():
    const, kern, grid, p, cell_start = _setup(2, n=150, family=KernelFamily.CUBIC_SPLINE)
    spec = PhysicsSpec(
        constants=const,
        kernel=kern,
        viscosity=ViscosityModel.ARTIFICIAL,
        diffusion=DensityDiffusionModel.LINEAR,
    )
    out = pair_sweep(
        spec, grid, cseg=3 * 64, block_size=64,
        particles=p, cell_start=cell_start,
        position=p.position, density=p.density,
        pressure=p.pressure, velocity=p.velocity,
    )
    ref = brute_force_sweep(
        kernel_family="cubic",
        kern=kern,
        const=const,
        viscosity="artificial",
        diffusion="linear",
        shifting=False,
        kernel_output=False,
        cells=np.asarray(p.cell),
        pos=np.asarray(p.position),
        dens=np.asarray(p.density),
        pres=np.asarray(p.pressure),
        vel=np.asarray(p.velocity),
        ml=np.asarray(p.motion_limiter),
        active=np.asarray(p.active),
    )
    np.testing.assert_allclose(np.asarray(out.drhodt), ref["drhodt"], rtol=1e-9, atol=1e-7)
    np.testing.assert_allclose(np.asarray(out.acceleration), ref["acc"], rtol=1e-9, atol=1e-7)


def test_momentum_conservation():
    """Total momentum change from pair forces must vanish (pairs are
    equal-and-opposite in the gather formulation by symmetry)."""
    const, kern, grid, p, cell_start = _setup(2, n=200)
    spec = PhysicsSpec(
        constants=const,
        kernel=kern,
        viscosity=ViscosityModel.ARTIFICIAL,
        diffusion=DensityDiffusionModel.ZERO,
    )
    out = pair_sweep(
        spec, grid, cseg=3 * 64, block_size=64,
        particles=p, cell_start=cell_start,
        position=p.position, density=p.density,
        pressure=p.pressure, velocity=p.velocity,
    )
    total = np.asarray(out.acceleration).sum(axis=0)
    assert np.allclose(total, 0.0, atol=1e-8)

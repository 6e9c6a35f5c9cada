"""Fused Pallas cell kernel vs the XLA gather sweep (interpreter mode on CPU).

The Pallas path computes in f32; comparisons are at f32 tolerance against the
XLA path run on the same f32 inputs.
"""

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
from sphexample_tpu.ops.pallas_sweep import pallas_pair_sweep
from sphexample_tpu.state import allocate_particles


def _setup(dims, n=220, seed=3, capacity=1024, family=KernelFamily.WENDLAND_C2):
    rng = np.random.default_rng(seed)
    const = SimulationConstants(dx=0.05, cfl=0.5)
    kern = make_kernel(family, dims, dx=const.dx)
    side = int(np.ceil(n ** (1 / dims)))
    coords = np.stack(
        np.meshgrid(*([np.arange(side) * const.dx] * dims), indexing="ij"), axis=-1
    ).reshape(-1, dims)[:n]
    pos = coords + rng.uniform(-0.4, 0.4, size=(n, dims)) * const.dx
    pos -= pos.mean(axis=0)
    dens = rng.uniform(990, 1040, size=n)
    vel = rng.normal(0, 0.5, size=(n, dims))
    parts = allocate_particles(
        pos, dens, rng.choice([1, 2], size=n).astype(np.int32),
        np.ones(n, np.int32), np.arange(1, n + 1),
        dtype=jnp.float32, capacity=capacity,
    )
    vel_full = np.zeros((capacity, dims))
    vel_full[:n] = vel
    parts = parts.replace(velocity=jnp.asarray(vel_full, dtype=jnp.float32))
    parts = parts.replace(pressure=eq.pressure(parts.density, const))
    grid = cl.grid_from_positions(pos, kern.H_inv, margin_cells=3)
    sorted_p, cell_start, occ = cl.rebuild(parts, kern.H_inv, grid)
    assert int(occ) <= 64
    return const, kern, grid, sorted_p, cell_start


@pytest.mark.parametrize("dims", [2, pytest.param(3, marks=pytest.mark.slow)])
@pytest.mark.parametrize(
    "visc,diff,family",
    [
        # headline combo stays in the fast lane; the rest of the matrix is
        # @slow (30s-class interpret runs) and runs in the pre-bench full lane
        (ViscosityModel.ARTIFICIAL, DensityDiffusionModel.LINEAR,
         KernelFamily.WENDLAND_C2),
        pytest.param(
            ViscosityModel.LAMINAR_SPS, DensityDiffusionModel.ZERO_GRAVITY_LINEAR,
            KernelFamily.WENDLAND_C2, marks=pytest.mark.slow),
        pytest.param(
            ViscosityModel.ZERO, DensityDiffusionModel.ZERO,
            KernelFamily.WENDLAND_C2, marks=pytest.mark.slow),
        # COMPLEX exercises the inverse-EOS 7th-root branch; the cubic spline
        # exercises the tensile-correction branch — both are independently
        # re-expressed inside pallas_sweep._pair_math and must be pinned.
        pytest.param(
            ViscosityModel.ARTIFICIAL, DensityDiffusionModel.COMPLEX,
            KernelFamily.WENDLAND_C2, marks=pytest.mark.slow),
        pytest.param(
            ViscosityModel.ARTIFICIAL, DensityDiffusionModel.LINEAR,
            KernelFamily.CUBIC_SPLINE, marks=pytest.mark.slow),
    ],
)
def test_pallas_matches_xla_sweep(dims, visc, diff, family):
    const, kern, grid, p, cell_start = _setup(dims, family=family)
    spec = PhysicsSpec(
        constants=const, kernel=kern, viscosity=visc, diffusion=diff,
        shifting=ShiftingMode.PLANAR, kernel_output=KernelOutputMode.STORE,
    )
    mpc, cseg = 64, 256
    maxc = min(grid.ncells, p.capacity)

    ref = pair_sweep(
        spec, grid, cseg, 64, p, cell_start,
        p.position, p.density, p.pressure, p.velocity,
    )
    out = pallas_pair_sweep(
        spec, grid, mpc, cseg, maxc, p, cell_start,
        p.position, p.density, p.pressure, p.velocity,
        interpret=True,
    )

    scale_d = float(np.abs(np.asarray(ref.drhodt)).max()) + 1e-6
    scale_a = float(np.abs(np.asarray(ref.acceleration)).max()) + 1e-6
    np.testing.assert_allclose(
        np.asarray(out.drhodt), np.asarray(ref.drhodt), rtol=2e-5, atol=2e-5 * scale_d
    )
    np.testing.assert_allclose(
        np.asarray(out.acceleration), np.asarray(ref.acceleration),
        rtol=2e-5, atol=2e-5 * scale_a,
    )
    np.testing.assert_allclose(
        np.asarray(out.kernel_w), np.asarray(ref.kernel_w), rtol=2e-5, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out.kernel_grad), np.asarray(ref.kernel_grad), rtol=2e-5,
        atol=2e-5 * float(np.abs(np.asarray(ref.kernel_grad)).max() + 1e-6),
    )
    np.testing.assert_allclose(
        np.asarray(out.grad_c), np.asarray(ref.grad_c), rtol=2e-5,
        atol=2e-5 * float(np.abs(np.asarray(ref.grad_c)).max() + 1e-6),
    )
    np.testing.assert_allclose(
        np.asarray(out.div_r), np.asarray(ref.div_r), rtol=2e-5, atol=1e-4
    )

"""Pruned neighbor-list infrastructure: parity with the stencil sweep.

(The list path measured 58x slower than the Pallas cell kernel on TPU - see
PERFORMANCE.md - but its parity independently validates the sweep physics and
the skin bound.)"""

import jax.numpy as jnp
import numpy as np
import pytest

from sphexample_tpu.config import (
    DensityDiffusionModel,
    KernelOutputMode,
    ShiftingMode,
    ViscosityModel,
)
from sphexample_tpu.ops.interactions import PhysicsSpec, pair_sweep
from sphexample_tpu.ops.neighbor_list import build_neighbor_list, pair_sweep_list

import sys, os
sys.path.insert(0, os.path.dirname(__file__))
from test_sweep import _setup


@pytest.mark.slow
@pytest.mark.parametrize("dims", [2, 3])
def test_list_sweep_matches_stencil_sweep(dims):
    const, kern, grid, p, cell_start = _setup(dims, n=220)
    spec = PhysicsSpec(
        constants=const, kernel=kern,
        viscosity=ViscosityModel.ARTIFICIAL, diffusion=DensityDiffusionModel.LINEAR,
        shifting=ShiftingMode.PLANAR, kernel_output=KernelOutputMode.STORE,
    )
    ref = pair_sweep(spec, grid, 192, 64, p, cell_start,
                     p.position, p.density, p.pressure, p.velocity)
    nbr, max_count = build_neighbor_list(
        kern, grid, 192, K=256, block_size=64, particles=p, cell_start=cell_start
    )
    assert int(max_count) <= 256
    out = pair_sweep_list(spec, grid, nbr, 64, p, p.position, p.density,
                          p.pressure, p.velocity)
    for field in ("drhodt", "acceleration", "kernel_w", "kernel_grad", "grad_c", "div_r"):
        a = np.asarray(getattr(ref, field))
        b = np.asarray(getattr(out, field))
        scale = np.abs(a).max() + 1e-30
        np.testing.assert_allclose(b, a, rtol=1e-9, atol=1e-9 * scale, err_msg=field)


def test_list_superset_under_skin():
    """Particles moved by up to h/2 after the build: the skinned list still
    contains every pair within the H cutoff at the moved positions."""
    const, kern, grid, p, cell_start = _setup(2, n=200, seed=9)
    nbr, _ = build_neighbor_list(
        kern, grid, 192, K=256, block_size=64, particles=p, cell_start=cell_start
    )
    rng = np.random.default_rng(1)
    n = p.capacity
    moved = np.asarray(p.position) + rng.uniform(
        -1, 1, size=(n, 2)
    ) * (kern.h / 2 / np.sqrt(2))
    nbr_np = np.asarray(nbr)
    cells = np.asarray(p.cell)
    for i in range(0, n, 5):
        in_list = set(nbr_np[i][nbr_np[i] < n])
        for j in range(n):
            if j == i or np.max(np.abs(cells[j] - cells[i])) > 1:
                continue  # the reference's stencil gate
            d = np.linalg.norm(moved[i] - moved[j])
            if d * d <= kern.H2:
                assert j in in_list, f"pair ({i},{j}) missing from skinned list"

"""Neighbor-engine tests: cell assignment, rebuild, row-segment coverage."""

import jax.numpy as jnp
import numpy as np
import pytest

from sphexample_tpu.config import KernelFamily, make_kernel
from sphexample_tpu.ops import cell_list as cl
from sphexample_tpu.state import allocate_particles


def test_map_floor_round_half_away_from_zero():
    # reference SPHCellList.jl:56-61: e.g. -1.7 with pitch 1 must give -2
    x = jnp.array([1.2, 1.7, -1.2, -1.7, 0.4, -0.4, 0.6, -0.6, 0.0])
    out = np.asarray(cl.map_floor(x, 1.0))
    assert list(out) == [1, 2, -1, -2, 0, 0, 1, -1, 0]


def test_map_floor_with_pitch():
    H_inv = 1 / 0.08
    x = jnp.array([0.0, 0.039, 0.041, -0.039, -0.041, 0.12, -0.12])
    out = np.asarray(cl.map_floor(x, H_inv))
    assert list(out) == [0, 0, 1, 0, -1, 2, -2]


def _random_particles(n, dims, seed=0, box=1.0):
    rng = np.random.default_rng(seed)
    pos = rng.uniform(-box / 2, box / 2, size=(n, dims))
    dens = rng.uniform(995, 1030, size=n)
    ptype = rng.choice([1, 2], size=n).astype(np.int32)
    grp = np.ones(n, dtype=np.int32)
    idp = np.arange(1, n + 1)
    return allocate_particles(pos, dens, ptype, grp, idp, dtype=jnp.float64)


@pytest.mark.parametrize("dims", [2, 3])
def test_rebuild_sorted_and_consistent(dims):
    kern = make_kernel(KernelFamily.WENDLAND_C2, dims, dx=0.05)
    parts = _random_particles(200, dims, seed=1)
    grid = cl.grid_from_positions(np.asarray(parts.position), kern.H_inv, margin_cells=3)
    sorted_p, cell_start, occ = cl.rebuild(parts, kern.H_inv, grid)

    keys = np.asarray(cl.linearize(sorted_p.cell, grid))
    assert np.all(np.diff(keys) >= 0)

    cs = np.asarray(cell_start)
    # every particle is inside its cell's range
    for k in range(grid.ncells):
        seg = keys[cs[k] : cs[k + 1]]
        assert np.all(seg == k)
    assert int(occ) == int(np.max(cs[1 : grid.ncells + 1] - cs[: grid.ncells]))
    # cell coords match recomputed assignment
    recomputed = np.asarray(cl.cell_coords(sorted_p.position, kern.H_inv))
    assert np.array_equal(recomputed, np.asarray(sorted_p.cell))


@pytest.mark.parametrize("dims", [2, 3])
def test_row_segments_cover_stencil(dims):
    """Union of row segments == the set of particles whose cell is within
    Chebyshev distance 1 (the full 3^D stencil)."""
    kern = make_kernel(KernelFamily.WENDLAND_C2, dims, dx=0.05)
    parts = _random_particles(300, dims, seed=2)
    grid = cl.grid_from_positions(np.asarray(parts.position), kern.H_inv, margin_cells=3)
    sorted_p, cell_start, _ = cl.rebuild(parts, kern.H_inv, grid)

    coords = np.asarray(sorted_p.cell)
    start, end = cl.row_segments(sorted_p.cell, grid, cell_start)
    start, end = np.asarray(start), np.asarray(end)

    n = coords.shape[0]
    for i in range(0, n, 7):
        got = set()
        for s in range(start.shape[1]):
            got.update(range(start[i, s], end[i, s]))
        expected = {
            j for j in range(n) if np.max(np.abs(coords[j] - coords[i])) <= 1
        }
        assert got == expected, f"particle {i}"


def test_inactive_particles_park_out_of_reach():
    dims = 2
    kern = make_kernel(KernelFamily.WENDLAND_C2, dims, dx=0.05)
    parts = _random_particles(50, dims, seed=3)
    # pad to capacity 64 with inactive slots
    parts_padded = _random_particles(50, dims, seed=3)
    import sphexample_tpu.state as st

    rng = np.random.default_rng(3)
    pos = rng.uniform(-0.5, 0.5, size=(50, dims))
    dens = rng.uniform(995, 1030, size=50)
    parts_padded = st.allocate_particles(
        pos, dens, np.ones(50, np.int32), np.ones(50, np.int32),
        np.arange(1, 51), dtype=jnp.float64, capacity=64,
    )
    grid = cl.grid_from_positions(pos, kern.H_inv, margin_cells=3)
    sorted_p, cell_start, _ = cl.rebuild(parts_padded, kern.H_inv, grid)
    # inactive sort to the tail
    act = np.asarray(sorted_p.active)
    assert np.all(act[:50]) and not np.any(act[50:])
    # no row segment ever reaches into the parked tail
    start, end = cl.row_segments(sorted_p.cell[:50], grid, cell_start)
    assert int(np.max(np.asarray(end))) <= 50

"""Driver entry points: entry() compile check + dense-cluster Pallas chunking."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_entry_compiles_and_steps():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    state, dx_acc = jax.block_until_ready(out)
    assert int(state.iteration) == 1
    assert bool(jnp.isfinite(state.total_time))


def test_pallas_multi_chunk_dense_cluster():
    """A cell packed with ~100 particles exercises CH > 1 row chunks."""
    from sphexample_tpu.config import (
        DensityDiffusionModel,
        KernelFamily,
        SimulationConstants,
        ViscosityModel,
        make_kernel,
    )
    from sphexample_tpu.models import equations as eq
    from sphexample_tpu.ops import cell_list as cl
    from sphexample_tpu.ops.interactions import PhysicsSpec, pair_sweep
    from sphexample_tpu.ops.pallas_sweep import pallas_pair_sweep
    from sphexample_tpu.state import allocate_particles

    rng = np.random.default_rng(11)
    const = SimulationConstants(dx=0.05)
    kern = make_kernel(KernelFamily.WENDLAND_C2, 2, dx=const.dx)
    # dense blob: ~120 particles inside one cell (pitch H = 0.2)
    n = 160
    pos = np.concatenate([
        rng.uniform(-0.05, 0.05, size=(120, 2)),
        rng.uniform(-0.3, 0.3, size=(40, 2)),
    ])
    parts = allocate_particles(
        pos, rng.uniform(990, 1040, n), np.ones(n, np.int32),
        np.ones(n, np.int32), np.arange(1, n + 1),
        dtype=jnp.float32, capacity=1024,
    )
    parts = parts.replace(pressure=eq.pressure(parts.density, const))
    grid = cl.grid_from_positions(pos, kern.H_inv, margin_cells=3)
    p, cs, occ = cl.rebuild(parts, kern.H_inv, grid)
    assert int(occ) > 64, "test needs a dense cell"

    spec = PhysicsSpec(
        constants=const, kernel=kern,
        viscosity=ViscosityModel.ARTIFICIAL, diffusion=DensityDiffusionModel.LINEAR,
    )
    mpc = -(-int(occ) // 8) * 8
    cseg = -(-3 * int(occ) // 128) * 128
    ref = pair_sweep(spec, grid, cseg, 64, p, cs, p.position, p.density,
                     p.pressure, p.velocity)
    out = pallas_pair_sweep(spec, grid, mpc, cseg, min(grid.ncells, 512),
                            p, cs, p.position, p.density, p.pressure, p.velocity,
                            interpret=True)
    sd = float(np.abs(np.asarray(ref.drhodt)).max()) + 1e-6
    sa = float(np.abs(np.asarray(ref.acceleration)).max()) + 1e-6
    np.testing.assert_allclose(np.asarray(out.drhodt), np.asarray(ref.drhodt),
                               rtol=3e-5, atol=3e-5 * sd)
    np.testing.assert_allclose(np.asarray(out.acceleration), np.asarray(ref.acceleration),
                               rtol=3e-5, atol=3e-5 * sa)

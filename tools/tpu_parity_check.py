"""Compiled-TPU parity check for the Pallas pair sweep.

The CI test suite runs the Pallas kernel in INTERPRET mode on CPU, which
executes the kernel's logical semantics - it cannot catch Mosaic
compilation bugs.  This script runs the real compiled kernel on the attached
TPU against the XLA gather sweep on the same state and fails loudly on
disagreement.  Run it after any kernel change, before trusting physics.

History: a Mosaic mis-lowering of ``pltpu.roll`` with dynamic negative lane
shifts (off by exactly -128) silently corrupted the sweep for any candidate
segment not starting 128-aligned - every interpret-mode parity test passed
while simulated fluid fell through the tank floor.  This check is the guard.

Usage: python tools/tpu_parity_check.py [--dx 0.02]
"""

from __future__ import annotations

import argparse
import dataclasses
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dx", type=float, default=0.02)
    ap.add_argument("--atol", type=float, default=1e-2,
                    help="max |pallas - xla| on drhodt (fp32 order noise)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from sphexample_tpu import (DensityDiffusionModel, KernelFamily,
                                SimulationConstants, SimulationMetaData,
                                ViscosityModel, assemble_simulation,
                                make_kernel)
    from sphexample_tpu.core.step import _sweep
    from sphexample_tpu.io.casegen import dam_break_3d
    from sphexample_tpu.ops import cell_list as cl

    dx = args.dx
    pos, dens, ptype, grp, idp = dam_break_3d(dx)
    const = SimulationConstants(dx=dx, c0=33.14, alpha=0.1, m0=1000 * dx**3, cfl=0.2)
    kern = make_kernel(KernelFamily.WENDLAND_C2, 3, h=float(np.sqrt(3 * dx**2)))
    meta = SimulationMetaData(
        simulation_name="Parity", save_location="/tmp/parity", dims=3,
        simulation_time=0.1, output_times=0.01, use_pallas=True,
    )
    sim = assemble_simulation(pos, dens, ptype, grp, idp, meta, const, kern,
                              ViscosityModel.ARTIFICIAL, DensityDiffusionModel.LINEAR)
    p = sim.state.particles
    # uniform downward fluid velocity: continuity terms appear only at the
    # fluid-boundary interface, diffusion everywhere - a sharp discriminator
    # for dropped pair interactions.
    vel = jnp.where((p.ptype == 1)[:, None],
                    jnp.array([0.0, 0.0, -0.1], dtype=p.velocity.dtype), 0.0)
    p = p.replace(velocity=jnp.broadcast_to(vel, p.velocity.shape),
                  pressure=jnp.zeros_like(p.pressure))
    p2, cs, _ = jax.jit(lambda pp: cl.rebuild(pp, kern.H_inv, sim.cfg.grid))(p)

    # block kernel (single-chip hot path) AND the cell-pair kernel (still
    # the sharded-halo path) - both compiled, both against the XLA sweep
    o_b = _sweep(sim.cfg, p2, cs, p2.position, p2.density, p2.pressure,
                 p2.velocity, 0)
    o_p = _sweep(dataclasses.replace(sim.cfg, ct_cap=0),
                 p2, cs, p2.position, p2.density, p2.pressure, p2.velocity, 0)
    o_x = _sweep(dataclasses.replace(sim.cfg, use_pallas=False),
                 p2, cs, p2.position, p2.density, p2.pressure, p2.velocity, 0)

    ok = True
    for tag, o_k in (("block", o_b), ("cellpair", o_p)):
        for name, a, b in (("drhodt", o_k.drhodt, o_x.drhodt),
                           ("acceleration", o_k.acceleration, o_x.acceleration)):
            d = float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
            nz_p = int((np.abs(np.asarray(a)) > 1e-12).sum())
            nz_x = int((np.abs(np.asarray(b)) > 1e-12).sum())
            line_ok = d <= args.atol and abs(nz_p - nz_x) < 0.05 * max(nz_x, 1)
            ok &= line_ok
            print(f"{tag} {name}: maxdiff={d:.3e} nonzero pallas/xla="
                  f"{nz_p}/{nz_x} {'OK' if line_ok else 'FAIL'}")

    ok &= _mdbc_parity()
    print("PARITY OK" if ok else "PARITY FAIL", file=sys.stderr)
    return 0 if ok else 1


def _mdbc_parity():
    """Compiled Pallas mDBC moment kernel vs the gather path on the chip."""
    import jax
    import jax.numpy as jnp

    from sphexample_tpu.config import (DensityDiffusionModel, KernelFamily,
                                       SimulationConstants, ViscosityModel,
                                       make_kernel)
    from sphexample_tpu.ops import cell_list as cl
    from sphexample_tpu.ops.interactions import PhysicsSpec
    from sphexample_tpu.ops.mdbc import mdbc_density_correction
    from sphexample_tpu.state import allocate_particles

    rng = np.random.default_rng(11)
    const = SimulationConstants(dx=0.05)
    kern = make_kernel(KernelFamily.WENDLAND_C2, 3, dx=const.dx)
    n_b, n_f = 600, 4000
    n = n_b + n_f
    pos_b = rng.uniform(-0.15, 0.0, size=(n_b, 3))
    pos_f = rng.uniform(0.0, 0.6, size=(n_f, 3))
    pos = np.concatenate([pos_b, pos_f])
    ghost = np.zeros_like(pos)
    ghost[:n_b] = pos_b + np.array([0.1, 0.0, 0.0])
    dens = rng.uniform(995, 1040, size=n)
    ptype = np.concatenate([np.full(n_b, 2), np.full(n_f, 1)]).astype(np.int32)

    cap = -(-max(n, 512) // 128) * 128
    parts = allocate_particles(
        pos, dens, ptype, np.ones(n, np.int32), np.arange(1, n + 1),
        dtype=jnp.float32, capacity=cap,
    )
    parts = parts.replace(
        ghost_points=parts.ghost_points.at[:n].set(jnp.asarray(ghost, jnp.float32))
    )
    grid = cl.grid_from_positions(pos, kern.H_inv, margin_cells=3)
    sorted_p, cell_start, _ = jax.jit(
        lambda pp: cl.rebuild(pp, kern.H_inv, grid)
    )(parts)
    spec = PhysicsSpec(
        constants=const, kernel=kern,
        viscosity=ViscosityModel.ZERO, diffusion=DensityDiffusionModel.ZERO,
    )

    def run(use_pallas):
        return mdbc_density_correction(
            spec, grid, cseg=384, particles=sorted_p, cell_start=cell_start,
            boundary_capacity=n_b, use_pallas=use_pallas, mpc=64,
        )

    a = np.asarray(run(True))
    b = np.asarray(run(False))
    rel = np.max(np.abs(a - b) / np.maximum(np.abs(b), 1.0))
    line_ok = rel < 1e-4
    print(f"mdbc: max rel diff pallas vs gather = {rel:.3e} "
          f"{'OK' if line_ok else 'FAIL'}")
    return bool(line_ok)


if __name__ == "__main__":
    raise SystemExit(main())

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

    o_p = _sweep(sim.cfg, p2, cs, p2.position, p2.density, p2.pressure,
                 p2.velocity, 0)
    o_x = _sweep(dataclasses.replace(sim.cfg, use_pallas=False),
                 p2, cs, p2.position, p2.density, p2.pressure, p2.velocity, 0)

    ok = True
    for name, a, b in (("drhodt", o_p.drhodt, o_x.drhodt),
                       ("acceleration", o_p.acceleration, o_x.acceleration)):
        d = float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
        nz_p = int((np.abs(np.asarray(a)) > 1e-12).sum())
        nz_x = int((np.abs(np.asarray(b)) > 1e-12).sum())
        line_ok = d <= args.atol and abs(nz_p - nz_x) < 0.05 * max(nz_x, 1)
        ok &= line_ok
        print(f"{name}: maxdiff={d:.3e} nonzero pallas/xla={nz_p}/{nz_x} "
              f"{'OK' if line_ok else 'FAIL'}")
    print("PARITY OK" if ok else "PARITY FAIL", file=sys.stderr)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())

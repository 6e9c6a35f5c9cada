"""Is the lazy rebuild pessimized when it lives inside lax.cond?

Round-4 trace evidence: one rebuild inside the step's ``lax.cond`` costs
~30 ms (while.27/28 sort loops) while the standalone jitted rebuild costs
~0.9 ms.  This probe isolates the effect: the same rebuild+tables branch is
timed (a) unconditionally in a fori_loop, (b) inside lax.cond with a
traced predicate that is True once per K iterations, (c) inside lax.cond
with predicate always False (branch never taken).

Usage: python tools/cond_rebuild_probe.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from sphexample_tpu import (DensityDiffusionModel, KernelFamily,
                                SimulationConstants, SimulationMetaData,
                                ViscosityModel, assemble_simulation,
                                make_kernel)
    from sphexample_tpu.io.casegen import dam_break_3d
    from sphexample_tpu.ops import cell_list as cl
    from sphexample_tpu.ops import pallas_block_sweep as pbs

    dx = 0.0085
    pos, dens, ptype, grp, idp = dam_break_3d(dx)
    const = SimulationConstants(dx=dx, c0=33.14, alpha=0.1, m0=1000 * dx**3,
                                cfl=0.2)
    kern = make_kernel(KernelFamily.WENDLAND_C2, 3, h=float(np.sqrt(3 * dx**2)))
    meta = SimulationMetaData(
        simulation_name="CondProbe", save_location="/tmp/condprobe", dims=3,
        use_pallas=True,
    )
    sim = assemble_simulation(pos, dens, ptype, grp, idp, meta, const, kern,
                              ViscosityModel.ARTIFICIAL,
                              DensityDiffusionModel.LINEAR)
    cfg = sim.cfg
    state = sim.state
    p0 = state.particles

    def rebuild_branch(p_in):
        sorted_p, cell_start, occ = cl.rebuild(p_in, kern.H_inv, cfg.grid)
        bt = pbs.make_block_tables(cell_start, sorted_p.cell, sorted_p.active,
                                   cfg.grid, sorted_p.capacity, cfg.ct_cap)
        return sorted_p, cell_start, bt

    reps = 60

    def sync(out):
        # block_until_ready returns early on the tunneled (axon) backend;
        # a scalar device->host fetch is the reliable completion barrier
        return float(jax.tree.leaves(out)[0].reshape(-1)[0])

    def timeit(name, fn, *a, iters=1):
        sync(fn(*a))
        sync(fn(*a))
        t0 = time.perf_counter()
        sync(fn(*a))
        dt = time.perf_counter() - t0
        print(f"{name:>26}: {dt*1e3:9.3f} ms/call  ({dt*1e3/iters:8.3f} ms/iter)")
        return dt

    # (a) unconditional rebuild, small loop
    @jax.jit
    def uncond(p_in):
        def body(i, carry):
            p_, acc = carry
            sp, cs, bt = rebuild_branch(p_)
            return (p_.replace(position=sp.position * 1.0),
                    acc + cs[0] + bt.chunk_total)
        return jax.lax.fori_loop(0, 4, body, (p_in, jnp.int32(0)))[1]

    timeit("uncond rebuild x4", uncond, p0, iters=4)

    # (b) cond rebuild, taken once per reps iterations.  NB the predicate
    # ``i % period == 0`` fires at i=0, so the 1/reps lane takes the branch
    # exactly once; the never-taken lane needs a predicate that is false at
    # EVERY i (i<0) or the baseline would hide one full rebuild too.
    def make_cond_loop(period):
        @jax.jit
        def run(p_in):
            def body(i, carry):
                p_, acc = carry
                def do(p):
                    sp, cs, bt = rebuild_branch(p)
                    return (p.replace(position=sp.position * 1.0),
                            cs[0] + bt.chunk_total)
                def dont(p):
                    return (p, jnp.int32(0))
                pred = (i % period == 0) if period > 0 else (i < 0)
                p2, v = jax.lax.cond(pred, do, dont, p_)
                return (p2, acc + v)
            return jax.lax.fori_loop(0, reps, body, (p_in, jnp.int32(0)))[1]
        return run

    timeit(f"cond taken 1/{reps}", make_cond_loop(reps), p0, iters=reps)
    timeit("cond never taken", make_cond_loop(0), p0, iters=reps)
    timeit("cond taken every iter", make_cond_loop(1), p0, iters=reps)


if __name__ == "__main__":
    main()

"""Component-level timing of the SPH step on the attached TPU.

Measures, on the headline dam-break state (after one rebuild):

  step        full sph_step (fixed-steps loop)                [particle-steps/s]
  nostep      sph_step with both sweeps stubbed to zeros      [everything else]
  intonly     nostep with adaptive dt also stubbed            [integrator alone]
  dtonly      the adaptive-dt chain in an isolated loop       [dt reductions]
  sweep       one pallas_pair_sweep in a fori_loop            [the hot kernel]
  sweepstub   same, _pair_math stubbed to one mul             [DMA + overhead]
  xsweep      the XLA gather sweep in a fori_loop             [comparison]

Usage: python tools/sweep_bench.py [--dx 0.0085] [--reps 30] [--which all]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dx", type=float, default=0.0085)
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--which", default="step,sweep,sweepstub,nostep")
    ap.add_argument("--no-chunk-pred", action="store_true",
                    help="compute trailing candidate chunks masked instead "
                         "of predicated (branch-vs-lanes experiment)")
    ap.add_argument("--unroll", type=int, default=1,
                    help="block-kernel chunk-loop unroll factor (ILP A/B)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the env var is not honored "
                         "on this image - must be set programmatically); "
                         "numbers are then smoke-tests, not measurements")
    args = ap.parse_args()
    which = set(args.which.split(","))

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from sphexample_tpu import (DensityDiffusionModel, KernelFamily,
                                SimulationConstants, SimulationMetaData,
                                ViscosityModel, assemble_simulation,
                                make_kernel)
    from sphexample_tpu.core import step as step_mod
    from sphexample_tpu.core.step import make_fixed_steps_fn
    from sphexample_tpu.io.casegen import dam_break_3d
    from sphexample_tpu.ops import cell_list as cl
    from sphexample_tpu.ops import pallas_sweep as ps

    if args.no_chunk_pred:
        ps.PREDICATE_CHUNKS = False

    dx = args.dx
    pos, dens, ptype, grp, idp = dam_break_3d(dx)
    const = SimulationConstants(dx=dx, c0=33.14, alpha=0.1, m0=1000 * dx**3, cfl=0.2)
    kern = make_kernel(KernelFamily.WENDLAND_C2, 3, h=float(np.sqrt(3 * dx**2)))
    meta = SimulationMetaData(
        simulation_name="SweepBench", save_location="/tmp/sweepbench", dims=3,
        use_pallas=True,
    )
    sim = assemble_simulation(pos, dens, ptype, grp, idp, meta, const, kern,
                              ViscosityModel.ARTIFICIAL, DensityDiffusionModel.LINEAR)
    cfg = sim.cfg
    n = sim.n_live
    reps = args.reps
    p = sim.state.particles
    p2, cs, _ = jax.jit(lambda pp: cl.rebuild(pp, kern.H_inv, cfg.grid))(p)

    def sync(x):
        return float(jax.tree.leaves(x)[0].reshape(-1)[0])

    def timeit(name, fn, *a):
        out = fn(*a); sync(out)          # compile + warm
        out = fn(*a); sync(out)
        t0 = time.perf_counter()
        out = fn(*a); sync(out)
        dt = time.perf_counter() - t0
        print(f"{name:>10}: {dt*1e3/reps:8.3f} ms/iter  "
              f"({n*reps/dt:.3e} particle-iters/s)")
        return dt / reps

    print(f"# n={n} mpc={cfg.mpc} cseg={cfg.cseg} maxc={cfg.maxc} reps={reps}",
          file=sys.stderr)

    # Per-call transport tax (measured ~28 ms over the axon tunnel, r4):
    # every probe below is ONE device call, so its ms/iter figure includes
    # callfloor/reps (~0.9 ms at reps=30).  Printed so readers can correct.
    @jax.jit
    def _nop(x):
        return x + 1.0

    sync(_nop(jnp.float32(1.0)))
    t0 = time.perf_counter()
    sync(_nop(jnp.float32(2.0)))
    print(f"# callfloor: {(time.perf_counter() - t0) * 1e3:.1f} ms/device-call"
          f" (subtract callfloor/reps from every ms/iter below)",
          file=sys.stderr)

    if "step" in which:
        run = make_fixed_steps_fn(cfg, reps)
        timeit("step", run, sim.state)

    def zero_sweep(cfg_, pp, cs_, pos_, dens_, pres_, vel_, idx_base,
                   tables=None, btables=None):
        from sphexample_tpu.ops.interactions import SweepOut
        z = jnp.zeros_like(dens_)
        return SweepOut(drhodt=z, acceleration=jnp.zeros_like(pos_),
                        kernel_w=None, kernel_grad=None, grad_c=None,
                        div_r=None)

    if "nostep" in which:
        real_sweep = step_mod._sweep
        step_mod._sweep = zero_sweep
        try:
            run0 = make_fixed_steps_fn(cfg, reps)
            timeit("nostep", run0, sim.state)
        finally:
            step_mod._sweep = real_sweep

    if "intonly" in which:
        # nostep with the adaptive-dt chain ALSO stubbed (constant dt):
        # nostep - intonly = the in-situ cost of the dt reductions;
        # intonly itself = integrator elementwise + rebuild cond + motion
        real_sweep = step_mod._sweep
        real_dt = step_mod.adaptive_dt

        def const_dt(position, velocity, acceleration, constants, kernel,
                     ctx=None):
            return jnp.asarray(8.0e-5, position.dtype)

        step_mod._sweep = zero_sweep
        step_mod.adaptive_dt = const_dt
        try:
            runi = make_fixed_steps_fn(cfg, reps)
            timeit("intonly", runi, sim.state)
        finally:
            step_mod._sweep = real_sweep
            step_mod.adaptive_dt = real_dt

    if "dtonly" in which:
        # the adaptive-dt chain in isolation (2 global reductions + a few
        # elementwise passes), serialized through a carried position
        from sphexample_tpu.ops.timestep import adaptive_dt as _adt

        @jax.jit
        def run_dt(pos0):
            def body(i, carry):
                pos_, acc_s = carry
                dtv = _adt(pos_, p2.velocity, p2.acceleration,
                           cfg.spec.constants, kern, cfg.ctx)
                return (pos_ + 0.0 * dtv, acc_s + dtv)
            return jax.lax.fori_loop(
                0, reps, body, (pos0, jnp.zeros((), pos0.dtype)))[1]

        timeit("dtonly", run_dt, p2.position)

    tables = jax.jit(
        lambda cs_: ps.make_program_tables(
            cs_, cfg.grid, cfg.maxc, ps.sweep_rows(cfg.mpc), p2.capacity,
            p2.cell, p2.active, cfg.mpc, pair=True)
    )(cs)

    def sweep_loop():
        # pallas_pair_sweep is itself jitted: identical static args would hit
        # the trace cache and silently reuse the previously-built kernel,
        # defeating the monkeypatched probes.
        ps.pallas_pair_sweep.clear_cache()

        @jax.jit
        def run(dens0):
            def body(i, dens_):
                out = ps.pallas_pair_sweep(
                    cfg.spec, cfg.grid, cfg.mpc, cfg.cseg, cfg.maxc,
                    p2, cs, p2.position, dens_, p2.pressure, p2.velocity,
                    tables=tables)
                return dens_ + 0.0 * out.drhodt + 0.0 * out.acceleration[:, 0]
            return jax.lax.fori_loop(0, reps, body, dens0)
        return run

    if "sweep" in which:
        timeit("sweep", sweep_loop(), p2.density)

    if "sweepstub" in which:
        real = ps._pair_math

        def stub(spec, dims, self_f, cand_f, i_is_role_i, within):
            d = self_f[0] - cand_f[0]
            mf = within.astype(d.dtype)
            out = {"drho": d * mf}
            for r in range(dims):
                out[f"dvdt{r}"] = d * mf
            return out

        ps._pair_math = stub
        try:
            timeit("sweepstub", sweep_loop(), p2.density)
        finally:
            ps._pair_math = real

    def probe_kernel(mode):
        """Replacement _make_kernel measuring subsets of the real kernel:
        'launch'   = scalar prologue only (grid pipeline + XLA glue floor);
        'gridzero' = + zero outputs (adds output-block writes);
        'dma'      = + self/segment DMAs and waits (adds DMA cost)."""
        import jax.numpy as _jnp
        from jax.experimental import pallas as _pl
        from jax.experimental.pallas import tpu as _pltpu
        from sphexample_tpu.ops.cell_list import stencil_rows as _srows

        def factory(spec, grid, dims, nfields, mpc, cseg, S, n, R):
            ncells = grid.ncells
            gshape = grid.shape
            gstrides = grid.strides
            rows_np = _srows(dims)

            R2 = 2 * R

            def kernel(occ_keys_ref, cell_start_ref, prog_slot_ref,
                       prog_base_ref, packed_hbm, packedT_hbm,
                       mom_out, selfT_buf, cand_buf, acc_ref, sem):
                b = _pl.program_id(0)
                slot = prog_slot_ref[b]
                key_enc = occ_keys_ref[slot]
                key = key_enc >> 1
                pairflag = key_enc & 1
                is_live = key < ncells
                keyc = _jnp.minimum(key, ncells - 1)
                chunk = b - prog_base_ref[slot]
                csA = cell_start_ref[keyc]
                ceB = cell_start_ref[keyc + 1 + pairflag]
                cnt_unit = _jnp.where(is_live, ceB - csA, 0)
                s0 = csA + chunk * R2
                cnt = _jnp.clip(cnt_unit - chunk * R2, 0, R2)
                is_live = is_live & (cnt > 0)

                if mode == "launch":
                    return
                mom_out[...] = _jnp.zeros_like(mom_out)
                if mode == "gridzero":
                    return

                rel = []
                rem_k = keyc
                for d_i in range(dims):
                    rel.append(rem_k % gshape[d_i])
                    rem_k = rem_k // gshape[d_i]
                x_lo = _jnp.clip(rel[0] - 1, 0, gshape[0] - 1)
                x_hi = _jnp.clip(rel[0] + 1 + pairflag, 0, gshape[0] - 1)
                # DMA width (pair window); buffer tail zeroed by real kernel
                cwin = -(-(cseg + mpc) // 128) * 128 + 128

                @_pl.when(is_live)
                def _body():
                    s08 = _pl.multiple_of(_jnp.maximum(
                        _jnp.minimum((s0 // 8) * 8, n - (R2 + 8)), 0), 8)
                    cp = _pltpu.make_async_copy(
                        packedT_hbm.at[_pl.ds(s08, R2 + 8)], selfT_buf,
                        sem.at[0])
                    cp.start()
                    seg_rs, seg_re, seg_al = [], [], []
                    for s in range(S):
                        deltas = rows_np[s]
                        row_ok = True
                        row_base = _jnp.zeros_like(keyc)
                        for d_i in range(1, dims):
                            rc = rel[d_i] + int(deltas[d_i - 1])
                            row_ok = row_ok & (rc >= 0) & (rc < gshape[d_i])
                            row_base = row_base + rc * gstrides[d_i]
                        klo = _jnp.where(row_ok, row_base + x_lo, 0)
                        khi = _jnp.where(row_ok, row_base + x_hi, -1)
                        rs = _jnp.where(row_ok, cell_start_ref[klo], 0)
                        re = _jnp.where(row_ok, cell_start_ref[khi + 1], 0)
                        seg_rs.append(rs)
                        seg_re.append(re)
                        seg_al.append(_pl.multiple_of(_jnp.maximum(
                            _jnp.minimum((rs // 128) * 128, n - cwin), 0),
                            128))
                    for s in range(S):
                        @_pl.when(seg_re[s] > seg_rs[s])
                        def _():
                            _pltpu.make_async_copy(
                                packed_hbm.at[:, _pl.ds(seg_al[s], cwin)],
                                cand_buf.at[s, :, _pl.ds(0, cwin)],
                                sem.at[1 + s]).start()
                    cp.wait()
                    for s in range(S):
                        @_pl.when(seg_re[s] > seg_rs[s])
                        def _w():
                            _pltpu.make_async_copy(
                                packed_hbm.at[:, _pl.ds(seg_al[s], cwin)],
                                cand_buf.at[s, :, _pl.ds(0, cwin)],
                                sem.at[1 + s]).wait()
                            acc_ref[0, :, :] += cand_buf[s][0:1, 0:ps.CHUNK_W]

            return kernel

        return factory

    for mode in ("launch", "gridzero", "dma"):
        if mode in which:
            real_mk = ps._make_kernel
            ps._make_kernel = probe_kernel(mode)
            try:
                timeit(mode, sweep_loop(), p2.density)
            finally:
                ps._make_kernel = real_mk

    # ---- block-sweep probes (the gen-3 single-chip hot path) ----
    from sphexample_tpu.ops import pallas_block_sweep as pbs

    if args.unroll > 1:
        pbs.UNROLL = args.unroll

    if "rebuildcost" in which:
        # amortized cell-list cost: one full rebuild (argsort + 17 gathers +
        # cell_start) and one block-table build, timed standalone.  Divide
        # by the lazy period (~20-80 steps) for the per-step share of
        # `nostep`.  NB: every output must be CONSUMED - an earlier version
        # fed only position back and XLA dead-code-eliminated everything but
        # one gather, reporting 0.8 ms for a 13.7 ms rebuild (r4 postmortem,
        # PERFORMANCE.md).
        rb = jax.jit(lambda pp: cl.rebuild(pp, kern.H_inv, cfg.grid))

        def rb_loop(pp0):
            @jax.jit
            def run(pp):
                def body(i, pp_):
                    p3, cs3, occ3 = rb(pp_)
                    # consume the full sorted pytree + cell_start + occ so
                    # nothing is DCE'd: fold a scalar from every leaf into
                    # a position perturbation that cannot be constant-folded
                    leaves = [a.reshape(-1)[0].astype(jnp.float32)
                              for a in jax.tree.leaves(p3)]
                    s = sum(leaves) + cs3[0] + occ3
                    return pp_.replace(
                        position=p3.position + 0.0 * s.astype(p3.position.dtype)
                    )
                return jax.lax.fori_loop(0, reps, body, pp)
            return run
        timeit("rebuild", rb_loop(p), p)

        if cfg.ct_cap:
            @jax.jit
            def bt_loop(cs0):
                def body(i, c):
                    t = pbs.make_block_tables(cs0 + 0 * c, p2.cell, p2.active,
                                              cfg.grid, p2.capacity, cfg.ct_cap)
                    return (c + 1 + 0 * t.chunk_total + 0 * t.chunk_tab[-1]
                            + 0 * t.prog_start[-1])
                return jax.lax.fori_loop(0, reps, body, jnp.int32(0))
            timeit("btables", bt_loop, cs)

    if cfg.ct_cap and ("bsweep" in which or "bstub" in which
                       or "blaunch" in which):
        btables = jax.jit(
            lambda cs_: pbs.make_block_tables(
                cs_, p2.cell, p2.active, cfg.grid, p2.capacity, cfg.ct_cap)
        )(cs)
        print(f"# block chunks: {int(btables.chunk_total)} / ct_cap "
              f"{cfg.ct_cap} (CH={pbs.CH})", file=sys.stderr)

        def bsweep_loop():
            pbs.pallas_block_sweep.clear_cache()

            @jax.jit
            def run(dens0):
                def body(i, dens_):
                    out = pbs.pallas_block_sweep(
                        cfg.spec, cfg.grid, cfg.ct_cap,
                        p2, cs, p2.position, dens_, p2.pressure, p2.velocity,
                        tables=btables)
                    return dens_ + 0.0 * out.drhodt + 0.0 * out.acceleration[:, 0]
                return jax.lax.fori_loop(0, reps, body, dens0)
            return run

        if "bsweep" in which:
            timeit("bsweep", bsweep_loop(), p2.density)

        if "blaunch" in which:
            # XLA pack/collect glue + grid launch floor: kernel body returns
            # after zeroing the output block (no DMA, no chunk loop)
            real_mk = pbs._make_block_kernel

            def launch_mk(spec, dims, maxb, bpb=1):
                kernel, n_keys, k_pad = real_mk(spec, dims, maxb, bpb)

                def lk(prog_start_ref, prog_mid_ref, chunk_tab_ref, self_blk,
                       packedT_hbm, out_blk, cand_buf, acc_ref, sem):
                    out_blk[...] = jnp.zeros_like(out_blk)

                return lk, n_keys, k_pad

            pbs._make_block_kernel = launch_mk
            try:
                timeit("blaunch", bsweep_loop(), p2.density)
            finally:
                pbs._make_block_kernel = real_mk

        if "bstub" in which:
            # pair math stubbed to one mul: bsweep - bstub = real pair math;
            # bstub itself = launch + DMA + decode/mask/reduce scaffold
            real = pbs._pair_math

            def stub(spec, dims, self_f, cand_f, i_is_role_i, within,
                     rcps=None, **kw):
                d = self_f[0] - cand_f[0]
                mf = within.astype(d.dtype)
                out = {"drho": d * mf}
                for r in range(dims):
                    out[f"dvdt{r}"] = d * mf
                return out

            pbs._pair_math = stub
            try:
                timeit("bstub", bsweep_loop(), p2.density)
            finally:
                pbs._pair_math = real

    if "xsweep" in which:
        import dataclasses
        cfg_x = dataclasses.replace(cfg, use_pallas=False)

        @jax.jit
        def runx(dens0):
            def body(i, dens_):
                out = step_mod._sweep(cfg_x, p2, cs, p2.position, dens_,
                                      p2.pressure, p2.velocity, 0)
                return dens_ + 0.0 * out.drhodt
            return jax.lax.fori_loop(0, reps, body, dens0)
        timeit("xsweep", runx, p2.density)


if __name__ == "__main__":
    main()

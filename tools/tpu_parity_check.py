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

Usage: python tools/tpu_parity_check.py [--dx 0.02] [--full]

``--full`` extends the gate beyond the headline ARTIFICIAL+LINEAR config to
every distinct pair-math code path family - LaminarSPS (SPHViscosityModels.
jl:90-126) with PlanarShifting (SPHCellList.jl:654-677) and kernel STORE,
COMPLEX diffusion (SPHDensityDiffusionModels.jl:148-188), cubic spline +
tensile correction (SPHKernels.jl:89-126), and Zero/Zero - each compiled on
hardware for BOTH Pallas kernels.  The cell-pair kernel costs minutes of
Mosaic compile per config, so the full matrix is opt-in; run it whenever
``_pair_math`` or the kernel scaffolds change.
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
    ap.add_argument("--full", action="store_true",
                    help="cover every visc/diff/shifting/kernel family "
                         "(minutes of extra Mosaic compile time)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from sphexample_tpu import (DensityDiffusionModel, KernelFamily,
                                KernelOutputMode, ShiftingMode,
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

    ok = _config_parity(sim.cfg, p2, cs, args.atol, tag="headline")

    if args.full:
        from sphexample_tpu.models import equations as eq

        # richer operands so every term is exercised: jittered velocities and
        # EOS pressures from perturbed densities (tensile + diffusion need
        # nonzero P and rho != rho0)
        rng = np.random.default_rng(3)
        dtype = p2.velocity.dtype
        vel_r = jnp.asarray(
            rng.normal(0, 0.2, size=p2.velocity.shape), dtype=dtype)
        dens_r = jnp.asarray(
            np.asarray(p2.density) * rng.uniform(0.995, 1.01, size=p2.density.shape),
            dtype=dtype)
        p3 = p2.replace(
            velocity=jnp.where(p2.active[:, None], vel_r, 0.0),
            density=jnp.where(p2.active, dens_r, p2.density),
        )
        p3 = p3.replace(pressure=jnp.where(
            p3.active, eq.pressure(p3.density, const), 0.0))
        spec0 = sim.cfg.spec
        kern_cubic = make_kernel(KernelFamily.CUBIC_SPLINE, 3, h=kern.h)
        FAMILIES = [
            ("sps_shift_store", dataclasses.replace(
                spec0, viscosity=ViscosityModel.LAMINAR_SPS,
                diffusion=DensityDiffusionModel.COMPLEX,
                shifting=ShiftingMode.PLANAR,
                kernel_output=KernelOutputMode.STORE)),
            ("cubic_tensile", dataclasses.replace(
                spec0, kernel=kern_cubic,
                viscosity=ViscosityModel.LAMINAR,
                diffusion=DensityDiffusionModel.ZERO_GRAVITY_LINEAR)),
            ("zero_zero", dataclasses.replace(
                spec0, viscosity=ViscosityModel.ZERO,
                diffusion=DensityDiffusionModel.ZERO)),
        ]
        for tag, spec in FAMILIES:
            cfg_f = dataclasses.replace(sim.cfg, spec=spec)
            ok &= _config_parity(cfg_f, p3, cs, args.atol, tag=tag)

    ok &= _mdbc_parity()
    ok &= _sharded_parity(full=args.full)
    print("PARITY OK" if ok else "PARITY FAIL", file=sys.stderr)
    return 0 if ok else 1


def _config_parity(cfg, p2, cs, atol, tag):
    """Both compiled Pallas kernels vs the XLA sweep for one physics spec."""
    from sphexample_tpu.core.step import _sweep

    # block kernel (single-chip hot path) AND the cell-pair kernel (still
    # the sharded-halo path) - both compiled, both against the XLA sweep
    o_b = _sweep(cfg, p2, cs, p2.position, p2.density, p2.pressure,
                 p2.velocity, 0)
    o_p = _sweep(dataclasses.replace(cfg, ct_cap=0),
                 p2, cs, p2.position, p2.density, p2.pressure, p2.velocity, 0)
    o_x = _sweep(dataclasses.replace(cfg, use_pallas=False),
                 p2, cs, p2.position, p2.density, p2.pressure, p2.velocity, 0)

    fields = [("drhodt", lambda o: o.drhodt),
              ("acceleration", lambda o: o.acceleration)]
    if o_x.kernel_w is not None:
        fields += [("kernel_w", lambda o: o.kernel_w),
                   ("kernel_grad", lambda o: o.kernel_grad)]
    if o_x.grad_c is not None:
        fields += [("grad_c", lambda o: o.grad_c),
                   ("div_r", lambda o: o.div_r)]

    ok = True
    for kname, o_k in (("block", o_b), ("cellpair", o_p)):
        for name, get in fields:
            a = np.asarray(get(o_k))
            b = np.asarray(get(o_x))
            d = float(np.max(np.abs(a - b)))
            # fp32 summation-order noise scales with the field magnitude
            # (EOS pressures push |acc| to ~1e2 in the full-matrix configs)
            tol = max(atol, 2e-4 * float(np.max(np.abs(b))))
            nz_p = int((np.abs(a) > 1e-12).sum())
            nz_x = int((np.abs(b) > 1e-12).sum())
            line_ok = d <= tol and abs(nz_p - nz_x) < 0.05 * max(nz_x, 1)
            ok &= line_ok
            print(f"{tag} {kname} {name}: maxdiff={d:.3e} nonzero pallas/xla="
                  f"{nz_p}/{nz_x} {'OK' if line_ok else 'FAIL'}")
    return ok


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


def _sharded_column_sim(mdbc: bool, block: bool):
    """The tall-column geometry of tests/test_sharded.py, compiled (no
    interpret) in f32 for the chip: thin in x, long in z, so slabs exceed
    one stencil reach and ``shard_simulation`` engages the halo path."""
    import jax.numpy as jnp

    from sphexample_tpu import (DensityDiffusionModel, KernelFamily, MDBCMode,
                                SimulationConstants, SimulationMetaData,
                                ViscosityModel, assemble_simulation,
                                make_kernel)

    const = SimulationConstants(dx=0.02, c0=40.0, cfl=0.3)
    kern = make_kernel(KernelFamily.WENDLAND_C2, 2, dx=const.dx)
    dx = const.dx
    nx, nz = 6, 220
    xs, zs = np.meshgrid(np.arange(nx), np.arange(nz), indexing="ij")
    fluid = np.stack([xs.ravel() * dx, zs.ravel() * dx + dx], axis=-1)
    floor_x = np.arange(-3, nx + 3) * dx
    floor = np.stack([floor_x, np.full_like(floor_x, 0.0)], axis=-1)
    wall_z = np.arange(0, nz + 6) * dx
    lw = np.stack([np.full_like(wall_z, -dx), wall_z], axis=-1)
    rw = np.stack([np.full_like(wall_z, nx * dx), wall_z], axis=-1)
    bound = np.concatenate([floor, lw, rw])
    pos = np.concatenate([bound, fluid])
    nb, nf = len(bound), len(fluid)
    ptype = np.concatenate([np.full(nb, 2), np.full(nf, 1)]).astype(np.int32)
    ghost = ghostn = None
    if mdbc:
        gn = np.concatenate([
            np.tile([[0.0, dx]], (len(floor), 1)),
            np.tile([[dx, 0.0]], (len(lw), 1)),
            np.tile([[-dx, 0.0]], (len(rw), 1)),
        ])
        ghost = bound + gn
        ghostn = gn
    meta = SimulationMetaData(
        simulation_name="shparity", save_location="/tmp/shparity", dims=2,
        dtype="float32", simulation_time=0.02, output_times=0.005,
        block_size=32, grid_margin_cells=4, use_pallas=True,
        block_sweep=block,
        mdbc=MDBCMode.SIMPLE if mdbc else MDBCMode.NONE,
    )
    return assemble_simulation(
        pos, np.full(len(pos), const.rho0), ptype,
        np.ones(len(pos), np.int32), np.arange(1, len(pos) + 1),
        meta, const, kern,
        ViscosityModel.ARTIFICIAL, DensityDiffusionModel.LINEAR,
        ghost_points=ghost, ghost_normals=ghostn,
    )


def _sharded_parity(full: bool = False):
    """Compile the SHARDED kernel variants on the real chip and pin them
    against the single-chip trajectory.

    The sharded kernels (``pallas_block_sweep_sharded``, the sharded mDBC
    moment kernel, the distributed rebuild) are CI-covered only in interpret
    mode on virtual CPU devices - exactly the blind spot where the
    ``pltpu.roll`` mis-lowering hid (see module docstring).  A 1-device mesh
    executes the exact ext-coordinate/packed-global-index code path compiled
    by Mosaic (the ppermutes degenerate to zero-fills; everything else is
    the multi-chip kernel), so hardware parity here kills that blind spot
    without multi-chip hardware.

    ``full`` adds the cell-pair halo kernel variant (minutes of Mosaic
    compile)."""
    import jax.numpy as jnp

    from sphexample_tpu.parallel.mesh import make_mesh, shard_simulation

    configs = [("block+mdbc", True, True)]
    if full:
        configs.append(("cellpair", False, False))

    ok = True
    for tag, mdbc, block in configs:
        sim_single = _sharded_column_sim(mdbc=mdbc, block=block)
        sim_shard = shard_simulation(
            _sharded_column_sim(mdbc=mdbc, block=block), make_mesh(1)
        )
        assert sim_shard.cfg.halo > 0, "halo path not engaged"
        if block:
            assert sim_shard.cfg.ct_cap > 0, "sharded block path not engaged"
        else:
            assert sim_shard.cfg.ct_cap == 0, "expected the cell-pair path"

        t_out = jnp.asarray(0.004, dtype=jnp.float32)
        f_single = sim_single.interval_fn(sim_single.state, t_out)
        f_shard = sim_shard.interval_fn(sim_shard.state, t_out)

        iters_ok = int(f_shard.iteration) == int(f_single.iteration)

        def by_id(state):
            ids = np.asarray(state.particles.id)
            order = np.argsort(ids)
            return order[ids[order] > 0]

        o1, o2 = by_id(f_single), by_id(f_shard)
        worst = 0.0
        for field in ("position", "velocity", "density", "pressure"):
            a = np.asarray(getattr(f_single.particles, field))[o1]
            b = np.asarray(getattr(f_shard.particles, field))[o2]
            scale = max(float(np.max(np.abs(a))), 1e-30)
            worst = max(worst, float(np.max(np.abs(a - b))) / scale)
        # same pair terms, rigidly shifted chunk windows: f32 trajectories
        # should agree to summation-order noise over ~20 steps
        line_ok = iters_ok and worst < 1e-4
        ok &= line_ok
        print(f"sharded[{tag}] 1-dev mesh vs single-chip: iters "
              f"{int(f_shard.iteration)}/{int(f_single.iteration)} "
              f"max rel diff {worst:.3e} {'OK' if line_ok else 'FAIL'}")
    return bool(ok)


if __name__ == "__main__":
    raise SystemExit(main())

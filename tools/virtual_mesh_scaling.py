"""Structural characterization of the sharded step at 1/2/4/8 devices.

Real multi-chip hardware is unavailable in this environment, so the "~8
chips -> 1e8 particle-steps/s" extrapolation in BASELINE.md needs at least a
structural measurement.  This tool shards a fixed case over an N-device
VIRTUAL CPU mesh (the same shard_map program that would run over ICI) and
reports, per device count:

  * measured per-step wall on the virtual mesh (interpret-mode Pallas -
    compute cost is NOT representative of the chip, but the scaling TREND of
    the framework glue is);
  * the exact collective inventory of the compiled step - op counts and
    bytes per step parsed from the optimized HLO (collective-permute,
    all-gather, all-reduce).  These shapes are backend-independent: the
    identical program would run on TPU, so bytes/step over ICI is a
    structural fact, not a CPU artifact;
  * a modeled ICI time per step at v5e link bandwidth, compared against the
    measured single-chip compute time scaled to the per-device slab - the
    quantitative basis for (or correction of) the 1e8 extrapolation.

Usage: python tools/virtual_mesh_scaling.py [--steps 20] [--ndev 1,2,4,8]
"""

from __future__ import annotations

import argparse
import os
import re
import sys
import time

sys.path.insert(0, ".")

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

# v5e: 4 ICI links/chip at ~50 GB/s each direction; a 1D ring ppermute uses
# one link -> ~4.5e10 B/s effective, ~1 us launch latency per collective
ICI_BYTES_PER_S = 4.5e10
ICI_LATENCY_S = 1.5e-6

_DT_RE = re.compile(r"(f32|f64|s32|u32|s8|u8|pred|bf16)\[([\d,]*)\]")
_BYTES = {"f32": 4, "f64": 8, "s32": 4, "u32": 4, "s8": 1, "u8": 1,
          "pred": 1, "bf16": 2}


def _shape_bytes(text: str) -> int:
    total = 0
    for m in _DT_RE.finditer(text):
        n = 1
        dims = m.group(2)
        if dims:
            for d in dims.split(","):
                n *= int(d)
        total += n * _BYTES[m.group(1)]
    return total


def collective_inventory(hlo_text: str):
    """(op_kind -> [bytes, count]) for every collective in the module.

    HLO line shape: ``%name = f32[128,4]{1,0} collective-permute(%arg), ...``
    - the result shape sits between ``=`` and the op name.  ``-start`` forms
    count once; ``-done`` (which repeats the shape) is skipped."""
    inv = {}
    for line in hlo_text.splitlines():
        s = line.strip()
        for kind in ("collective-permute", "all-gather", "all-reduce",
                     "reduce-scatter", "all-to-all"):
            idx = s.find(f" {kind}(")
            if idx < 0:
                idx = s.find(f" {kind}-start(")
            if idx < 0 or "=" not in s[:idx]:
                continue
            b = _shape_bytes(s[:idx])
            e = inv.setdefault(kind, [0, 0])
            e[0] += b
            e[1] += 1
    return inv


def build_sim(n_side: int):
    from sphexample_tpu import (DensityDiffusionModel, KernelFamily,
                                SimulationConstants, SimulationMetaData,
                                ViscosityModel, assemble_simulation,
                                make_kernel)

    const = SimulationConstants(dx=0.02, c0=40.0, cfl=0.3)
    kern = make_kernel(KernelFamily.WENDLAND_C2, 2, dx=const.dx)
    dx = const.dx
    nx, nz = 6, n_side
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
    meta = SimulationMetaData(
        simulation_name="vscale", save_location="/tmp/vscale", dims=2,
        dtype="float32", simulation_time=1.0, output_times=0.005,
        block_size=32, grid_margin_cells=4, use_pallas=True, block_sweep=True,
        max_steps_per_call=None,
    )
    import dataclasses

    sim = assemble_simulation(
        pos, np.full(len(pos), const.rho0), ptype,
        np.ones(len(pos), np.int32), np.arange(1, len(pos) + 1),
        meta, const, kern,
        ViscosityModel.ARTIFICIAL, DensityDiffusionModel.LINEAR,
    )
    sim.cfg = dataclasses.replace(sim.cfg, pallas_interpret=True)
    return sim


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--ndev", default="1,2,4,8")
    ap.add_argument("--n-side", type=int, default=440,
                    help="fluid column height in particles (6 wide)")
    args = ap.parse_args()

    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax import shard_map

    from sphexample_tpu.core.step import make_chunk_body
    from sphexample_tpu.parallel.mesh import (AXIS, make_mesh,
                                              shard_simulation, state_specs)

    rows = []
    for ndev in [int(x) for x in args.ndev.split(",")]:
        sim = build_sim(args.n_side)
        n = sim.n_live
        sh = shard_simulation(sim, make_mesh(ndev))
        assert sh.cfg.halo > 0 or ndev == 1, f"halo path off at ndev={ndev}"
        import dataclasses

        cfg = dataclasses.replace(sh.cfg, meta=dataclasses.replace(
            sh.cfg.meta, max_steps_per_call=args.steps))
        specs = state_specs(AXIS)
        mesh = make_mesh(ndev)
        chunk = jax.jit(shard_map(
            make_chunk_body(cfg), mesh=mesh,
            in_specs=(specs, P(), P()), out_specs=(specs, P()),
            check_vma=False,
        ))
        t_far = jnp.asarray(1e9, jnp.float32)
        dx0 = jnp.asarray(1.0, jnp.float32)

        lowered = chunk.lower(sh.state, t_far, dx0)
        hlo = lowered.compile().as_text()
        inv = collective_inventory(hlo)

        st, _ = chunk(sh.state, t_far, dx0)  # compile+warm (includes rebuilds)
        jax.block_until_ready(st.particles.position)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out, _ = chunk(sh.state, t_far, dx0)
            jax.block_until_ready(out.particles.position)
            best = min(best, time.perf_counter() - t0)
        wall_step = best / args.steps

        # bytes per STEP: the HLO while-body executes once per step; rebuild
        # collectives are inside the lax.cond and show up in the inventory
        # but only run at the lazy cadence (~1/20-40) - report both
        total_b = sum(b for b, _ in inv.values())
        total_c = sum(c for _, c in inv.values())
        rows.append((ndev, n, sh.cfg.halo, wall_step, inv, total_b, total_c))
        det = ", ".join(f"{k}: {c} ops/{b/1e3:.1f} kB" for k, (b, c) in inv.items())
        print(f"ndev={ndev} n={n} halo={sh.cfg.halo} "
              f"wall/step={wall_step*1e3:.2f} ms  [{det}]")

    print("\n| ndev | halo | wall/step (virt. CPU) | collectives/step "
          "| bytes/step | modeled ICI t/step |")
    print("|---|---|---|---|---|---|")
    for ndev, n, halo, w, inv, tb, tc in rows:
        ici = tc * ICI_LATENCY_S + tb / ICI_BYTES_PER_S
        print(f"| {ndev} | {halo} | {w*1e3:.2f} ms | {tc} | {tb/1e3:.1f} kB "
              f"| {ici*1e6:.1f} us |")
    print("\nNB: wall/step is interpret-mode Pallas on virtual CPU devices - "
          "use the TREND, not the magnitude.  bytes/step and op counts are "
          "structural (same program on TPU).")


if __name__ == "__main__":
    main()

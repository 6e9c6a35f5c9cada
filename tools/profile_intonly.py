"""Capture a jax-profiler trace of the integrator-only step loop (sweeps and
adaptive dt stubbed) and print the per-op time breakdown from the trace.

The round-4 probes put `intonly` at ~1.37 ms/step (transport-corrected) vs
~0.15 ms of theoretical HBM traffic - this tool shows which XLA ops eat it.

Usage: python tools/profile_intonly.py [--reps 60] [--outdir /tmp/intonly_prof]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=60)
    ap.add_argument("--outdir", default="/tmp/intonly_prof")
    ap.add_argument("--dx", type=float, default=0.0085)
    ap.add_argument("--mode", default="intonly",
                    choices=["intonly", "nostep", "step"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from sphexample_tpu import (DensityDiffusionModel, KernelFamily,
                                SimulationConstants, SimulationMetaData,
                                ViscosityModel, assemble_simulation,
                                make_kernel)
    from sphexample_tpu.core import step as step_mod
    from sphexample_tpu.core.step import make_fixed_steps_fn
    from sphexample_tpu.io.casegen import dam_break_3d
    from sphexample_tpu.ops.interactions import SweepOut

    dx = args.dx
    pos, dens, ptype, grp, idp = dam_break_3d(dx)
    const = SimulationConstants(dx=dx, c0=33.14, alpha=0.1, m0=1000 * dx**3,
                                cfl=0.2)
    kern = make_kernel(KernelFamily.WENDLAND_C2, 3, h=float(np.sqrt(3 * dx**2)))
    meta = SimulationMetaData(
        simulation_name="IntProf", save_location="/tmp/intprof", dims=3,
        use_pallas=True,
    )
    sim = assemble_simulation(pos, dens, ptype, grp, idp, meta, const, kern,
                              ViscosityModel.ARTIFICIAL,
                              DensityDiffusionModel.LINEAR)

    def zero_sweep(cfg_, pp, cs_, pos_, dens_, pres_, vel_, idx_base,
                   tables=None, btables=None):
        z = jnp.zeros_like(dens_)
        return SweepOut(drhodt=z, acceleration=jnp.zeros_like(pos_),
                        kernel_w=None, kernel_grad=None, grad_c=None,
                        div_r=None)

    def const_dt(position, velocity, acceleration, constants, kernel, ctx=None):
        return jnp.asarray(8.0e-5, position.dtype)

    if args.mode in ("intonly", "nostep"):
        step_mod._sweep = zero_sweep
    if args.mode == "intonly":
        step_mod.adaptive_dt = const_dt

    run = make_fixed_steps_fn(sim.cfg, args.reps)
    s = run(sim.state); float(s.total_time)   # compile + settle
    s = run(s); float(s.total_time)

    os.makedirs(args.outdir, exist_ok=True)
    with jax.profiler.trace(args.outdir):
        s2 = run(s)
        float(s2.total_time)

    # ---- parse the trace: per-op device time ----
    files = glob.glob(os.path.join(args.outdir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not files:
        print("no trace file found under", args.outdir)
        return
    path = max(files, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # device-lane complete events: pid/tid vary; use events with 'dur' and
    # args containing 'run_id' or names that look like XLA ops
    by_name = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        cat = str(e.get("cat", ""))
        name = e.get("name", "")
        # keep device op events only (XLA ops land on TensorCore lanes)
        pid_name = ""
        dur = float(e.get("dur", 0.0))
        if dur <= 0:
            continue
        a = e.get("args", {}) or {}
        if "tf_op" in a or "hlo_category" in a or cat in ("tpu", "device"):
            by_name[a.get("hlo_category", name)] += dur
            total += dur
    if not by_name:
        # fallback: aggregate every X event by name prefix
        for e in events:
            if e.get("ph") == "X" and e.get("dur"):
                by_name[e["name"].split(".")[0][:60]] += float(e["dur"])
                total += float(e["dur"])
    print(f"# trace: {path}")
    print(f"# total accounted device time: {total/1e3:.3f} ms over "
          f"{args.reps} steps -> {total/1e3/args.reps:.4f} ms/step")
    for name, us in sorted(by_name.items(), key=lambda kv: -kv[1])[:30]:
        print(f"{us/1e3:10.3f} ms  {us/1e3/args.reps:8.4f} ms/step  {name}")


if __name__ == "__main__":
    main()

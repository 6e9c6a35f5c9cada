"""Timing / profiling: hierarchical host timers + per-stage device profiling.

TPU-native equivalent of the reference's TimerOutputs instrumentation
(reference ``src/SPHCellList.jl:748-800`` wraps every stage in
``@timeit SimMetaData.HourGlass "NN label"``; tables printed at exit,
SimulationLoggerConfiguration.jl:204-217):

* :class:`HourGlass` - a hierarchical wall-clock accumulator for the host
  loop (interval compute, snapshot transfer, file IO), printed as a table.
* :func:`profile_stages` - compiles and times each numbered stage of the
  step separately on the device, reproducing the reference's stage taxonomy
  (01 dt, 02 rebuild, 04 mDBC, 05/08 sweeps, 06/11 integrators).  The
  production path never pays for this - it runs the fused step; this is a
  diagnostic mode.
* ``jax.profiler`` traces remain available for deep dives
  (``jax.profiler.trace(logdir)`` around an interval call).
"""

from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager
from typing import Dict

import jax


class HourGlass:
    """Named wall-clock accumulator (reference TimerOutputs analog)."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)
        self._t0 = time.perf_counter()

    @contextmanager
    def section(self, name: str):
        t = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t
            self.totals[name] += dt
            self.counts[name] += 1

    def report(self, sort_by: str = "time") -> str:
        total = time.perf_counter() - self._t0
        items = sorted(
            self.totals.items(),
            key=(lambda kv: -kv[1]) if sort_by == "time" else (lambda kv: kv[0]),
        )
        lines = [
            f"{'section':<40} {'calls':>8} {'total [s]':>12} {'% wall':>8}",
            "-" * 72,
        ]
        for name, t in items:
            lines.append(
                f"{name:<40} {self.counts[name]:>8d} {t:>12.3f} {100 * t / total:>7.1f}%"
            )
        lines.append("-" * 72)
        lines.append(f"{'wall clock':<40} {'':>8} {total:>12.3f}")
        return "\n".join(lines)


def profile_stages(cfg, state, iters: int = 10) -> Dict[str, float]:
    """Time each step stage separately on the device (ms per call).

    Stage names mirror the reference timer taxonomy (SPHCellList.jl:748-800).
    """
    from ..config import MDBCMode
    from ..core.step import _sweep
    from ..models import equations as eq
    from ..ops import cell_list as cl
    from ..ops.mdbc import mdbc_density_correction
    from ..ops.timestep import adaptive_dt

    spec, kern, c = cfg.spec, cfg.spec.kernel, cfg.spec.constants
    if cfg.ctx.is_sharded:
        # the stage probes run plain jits: a sharded ctx's collectives are
        # unbound outside shard_map and would crash mid-profile
        raise ValueError(
            "profile_stages supports single-chip configs only; profile the "
            "sharded run with --profile (jax-profiler trace) instead"
        )
    p0 = state.particles

    def timed(name, fn, *args):
        f = jax.jit(fn)
        out = f(*args)
        jax.tree.flatten(jax.device_get(jax.tree.map(lambda a: a[..., :1] if hasattr(a, "shape") and a.ndim else a, out)))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*args)
        # force completion with a host fetch
        leaf = jax.tree.leaves(out)[0]
        _ = jax.device_get(leaf if leaf.ndim == 0 else leaf.reshape(-1)[0])
        return (time.perf_counter() - t0) / iters * 1e3

    results = {}
    results["01 Update TimeStep"] = timed(
        "dt", lambda pp: adaptive_dt(pp.position, pp.velocity, pp.acceleration, c, kern), p0
    )
    results["02 Update Neighbors (sort)"] = timed(
        "rebuild", lambda pp: cl.rebuild(pp, kern.H_inv, cfg.grid), p0
    )
    p, cell_start, _ = jax.jit(lambda pp: cl.rebuild(pp, kern.H_inv, cfg.grid))(p0)
    results["03 Pressure (EOS)"] = timed(
        "eos", lambda rho: eq.pressure(rho, c), p.density
    )
    if cfg.meta.mdbc is MDBCMode.SIMPLE:
        results["04 mDBC correction"] = timed(
            "mdbc",
            lambda pp, cs: mdbc_density_correction(
                spec, cfg.grid, cfg.cseg, pp, cs, cfg.boundary_capacity
            ),
            p, cell_start,
        )
    results["05/08 Neighbor sweep"] = timed(
        "sweep",
        lambda pp, cs: _sweep(cfg, pp, cs, pp.position, pp.density, pp.pressure,
                              pp.velocity, 0).drhodt,
        p, cell_start,
    )
    return results

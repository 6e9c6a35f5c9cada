"""Performance-as-correctness guards.

The reference asserts ``@allocated == 0`` on the Δt kernel
(/root/reference/test/runtests.jl:14-15) so a silent allocation regression
fails CI.  The TPU analogs here:

1. the jitted interval chunk compiles exactly ONCE and never recompiles
   across output intervals (a shape/dtype leak into the trace - e.g. a
   Python-float t_out - would silently recompile per interval, costing
   minutes on the real chip);
2. a pinned mini case holds a CPU-proxy particle-steps/s floor, so a ~2x
   step-glue regression fails here instead of landing unnoticed until the
   next chip bench.

Both run the XLA gather path: it shares all step glue (integrator, dt
reduction, lazy rebuild, telemetry) with the Pallas paths and is the only
one fast enough for a timing assertion on the CPU test backend.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from sphexample_tpu import (
    DensityDiffusionModel,
    KernelFamily,
    SimulationConstants,
    SimulationMetaData,
    ViscosityModel,
    assemble_simulation,
    make_kernel,
    run_simulation,
)
from sphexample_tpu.core.step import (
    make_chunk_body,
    make_chunk_loop,
    make_fixed_steps_fn,
)

# measured ~15k particle-steps/s on the CI CPU backend (8 virtual devices,
# x64); the floor at ~half that trips on a 2x regression, not on noise
_FLOOR_PSTEPS_PER_SEC = 7_000.0
_N = 300


def _mini_sim(tmp_path):
    rng = np.random.default_rng(11)
    const = SimulationConstants(dx=0.02, c0=40.0, cfl=0.3)
    kern = make_kernel(KernelFamily.WENDLAND_C2, 2, dx=const.dx)
    pos = rng.uniform(0, 0.3, size=(_N, 2))
    meta = SimulationMetaData(
        simulation_name="pg", save_location=str(tmp_path), dims=2,
        simulation_time=0.04, output_times=0.01, block_size=64,
        dtype="float64",
    )
    return assemble_simulation(
        pos, np.full(_N, const.rho0), np.ones(_N, np.int32),
        np.ones(_N, np.int32), np.arange(1, _N + 1),
        meta, const, kern, ViscosityModel.ARTIFICIAL,
        DensityDiffusionModel.LINEAR,
    )


def test_one_compile_across_intervals(tmp_path):
    """The interval chunk is traced+compiled exactly once; every further
    output interval reuses the executable (zero recompiles)."""
    sim = _mini_sim(tmp_path)
    chunk = jax.jit(make_chunk_body(sim.cfg))
    sim.interval_fn = make_chunk_loop(sim.cfg, chunk)

    sim = run_simulation(sim, max_intervals=4)
    assert int(sim.state.iteration) > 50  # the intervals actually stepped
    assert chunk._cache_size() == 1, (
        f"interval chunk recompiled: {chunk._cache_size()} cache entries "
        f"after 4 intervals (expected 1) - a shape or dtype is leaking "
        f"into the trace"
    )


def test_cpu_proxy_steps_per_sec_floor(tmp_path):
    """Pinned mini case must sustain the CPU-proxy throughput floor."""
    sim = _mini_sim(tmp_path)
    n_steps = 50
    fixed = make_fixed_steps_fn(sim.cfg, n_steps)
    out = fixed(sim.state)  # compile + warm-up
    jax.block_until_ready(out.particles.position)
    assert np.isfinite(np.asarray(out.particles.density)).all()

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = fixed(sim.state)
        jax.block_until_ready(out.particles.position)
        best = min(best, time.perf_counter() - t0)

    rate = n_steps * _N / best
    assert rate > _FLOOR_PSTEPS_PER_SEC, (
        f"CPU-proxy throughput regressed: {rate:.0f} particle-steps/s "
        f"(floor {_FLOOR_PSTEPS_PER_SEC:.0f}) - the step glue got ~"
        f"{15000.0 / rate:.1f}x slower than the pinned baseline"
    )

"""Block-structured Pallas sweep vs the XLA gather sweep (interpret mode).

Same parity matrix as test_pallas_sweep.py, plus block-specific edge cases:
tight chunk-table capacity, blocks straddling (y,z)-row boundaries, sparse
sheets (multi-row blocks exercising the coalesced-run cover), and the
inactive tail.  The Pallas path computes in f32; comparisons are at f32
tolerance against the XLA path on the same f32 inputs.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from sphexample_tpu.config import (
    DensityDiffusionModel,
    KernelFamily,
    KernelOutputMode,
    ShiftingMode,
    SimulationConstants,
    ViscosityModel,
    make_kernel,
)
from sphexample_tpu.models import equations as eq
from sphexample_tpu.ops import cell_list as cl
from sphexample_tpu.ops import pallas_block_sweep as pbs
from sphexample_tpu.ops.interactions import PhysicsSpec, pair_sweep
from sphexample_tpu.state import allocate_particles


def _assemble(pos, dens, vel, const, kern, capacity, seed=0):
    n = len(dens)
    rng = np.random.default_rng(seed)
    parts = allocate_particles(
        pos, dens, rng.choice([1, 2], size=n).astype(np.int32),
        np.ones(n, np.int32), np.arange(1, n + 1),
        dtype=jnp.float32, capacity=capacity,
    )
    vel_full = np.zeros((capacity, pos.shape[1]))
    vel_full[:n] = vel
    parts = parts.replace(velocity=jnp.asarray(vel_full, dtype=jnp.float32))
    parts = parts.replace(pressure=eq.pressure(parts.density, const))
    grid = cl.grid_from_positions(pos, kern.H_inv, margin_cells=3)
    sorted_p, cell_start, _ = cl.rebuild(parts, kern.H_inv, grid)
    return grid, sorted_p, cell_start


def _setup(dims, n=220, seed=3, capacity=1024,
           family=KernelFamily.WENDLAND_C2):
    rng = np.random.default_rng(seed)
    const = SimulationConstants(dx=0.05, cfl=0.5)
    kern = make_kernel(family, dims, dx=const.dx)
    side = int(np.ceil(n ** (1 / dims)))
    coords = np.stack(
        np.meshgrid(*([np.arange(side) * const.dx] * dims), indexing="ij"),
        axis=-1,
    ).reshape(-1, dims)[:n]
    pos = coords + rng.uniform(-0.4, 0.4, size=(n, dims)) * const.dx
    pos -= pos.mean(axis=0)
    dens = rng.uniform(990, 1040, size=n)
    vel = rng.normal(0, 0.5, size=(n, dims))
    grid, p, cs = _assemble(pos, dens, vel, const, kern, capacity, seed)
    return const, kern, grid, p, cs


def _compare(out, ref):
    scale_d = float(np.abs(np.asarray(ref.drhodt)).max()) + 1e-6
    scale_a = float(np.abs(np.asarray(ref.acceleration)).max()) + 1e-6
    np.testing.assert_allclose(
        np.asarray(out.drhodt), np.asarray(ref.drhodt),
        rtol=2e-5, atol=2e-5 * scale_d,
    )
    np.testing.assert_allclose(
        np.asarray(out.acceleration), np.asarray(ref.acceleration),
        rtol=2e-5, atol=2e-5 * scale_a,
    )
    if ref.kernel_w is not None:
        np.testing.assert_allclose(
            np.asarray(out.kernel_w), np.asarray(ref.kernel_w),
            rtol=2e-5, atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(out.kernel_grad), np.asarray(ref.kernel_grad),
            rtol=2e-5,
            atol=2e-5 * float(np.abs(np.asarray(ref.kernel_grad)).max() + 1e-6),
        )
    if ref.grad_c is not None:
        np.testing.assert_allclose(
            np.asarray(out.grad_c), np.asarray(ref.grad_c), rtol=2e-5,
            atol=2e-5 * float(np.abs(np.asarray(ref.grad_c)).max() + 1e-6),
        )
        np.testing.assert_allclose(
            np.asarray(out.div_r), np.asarray(ref.div_r),
            rtol=2e-5, atol=1e-4,
        )


@pytest.mark.parametrize("dims", [2, pytest.param(3, marks=pytest.mark.slow)])
@pytest.mark.parametrize(
    "visc,diff,family",
    [
        # headline combo stays in the fast lane; the rest of the matrix is
        # @slow (30s-class interpret runs) and runs in the pre-bench full lane
        (ViscosityModel.ARTIFICIAL, DensityDiffusionModel.LINEAR,
         KernelFamily.WENDLAND_C2),
        pytest.param(
            ViscosityModel.LAMINAR_SPS, DensityDiffusionModel.ZERO_GRAVITY_LINEAR,
            KernelFamily.WENDLAND_C2, marks=pytest.mark.slow),
        pytest.param(
            ViscosityModel.ZERO, DensityDiffusionModel.ZERO,
            KernelFamily.WENDLAND_C2, marks=pytest.mark.slow),
        pytest.param(
            ViscosityModel.ARTIFICIAL, DensityDiffusionModel.COMPLEX,
            KernelFamily.WENDLAND_C2, marks=pytest.mark.slow),
        pytest.param(
            ViscosityModel.ARTIFICIAL, DensityDiffusionModel.LINEAR,
            KernelFamily.CUBIC_SPLINE, marks=pytest.mark.slow),
    ],
)
def test_block_sweep_matches_xla(dims, visc, diff, family):
    const, kern, grid, p, cell_start = _setup(dims, family=family)
    spec = PhysicsSpec(
        constants=const, kernel=kern, viscosity=visc, diffusion=diff,
        shifting=ShiftingMode.PLANAR, kernel_output=KernelOutputMode.STORE,
    )
    ref = pair_sweep(
        spec, grid, 256, 64, p, cell_start,
        p.position, p.density, p.pressure, p.velocity,
    )
    out = pbs.pallas_block_sweep(
        spec, grid, 2048, p, cell_start,
        p.position, p.density, p.pressure, p.velocity,
        interpret=True,
    )
    _compare(out, ref)


def test_block_sweep_sparse_sheet():
    """A thin 1-cell-wide wall sheet: blocks span many (y,z) rows and
    exercise the coalesced multi-row run cover."""
    rng = np.random.default_rng(7)
    const = SimulationConstants(dx=0.05, cfl=0.5)
    kern = make_kernel(KernelFamily.WENDLAND_C2, 3, dx=const.dx)
    # x fixed (one cell column), particles spread in y/z
    n = 300
    pos = np.stack([
        rng.uniform(-0.02, 0.02, n),
        rng.uniform(-0.6, 0.6, n),
        rng.uniform(-0.6, 0.6, n),
    ], axis=1)
    dens = rng.uniform(990, 1040, n)
    vel = rng.normal(0, 0.5, (n, 3))
    grid, p, cs = _assemble(pos, dens, vel, const, kern, 512)
    spec = PhysicsSpec(
        constants=const, kernel=kern, viscosity=ViscosityModel.ARTIFICIAL,
        diffusion=DensityDiffusionModel.LINEAR,
    )
    ref = pair_sweep(spec, grid, 256, 64, p, cs,
                     p.position, p.density, p.pressure, p.velocity)
    out = pbs.pallas_block_sweep(
        spec, grid, 4096, p, cs,
        p.position, p.density, p.pressure, p.velocity, interpret=True,
    )
    _compare(out, ref)


def test_block_sweep_crowded_cells():
    """Many particles piled into few cells: long runs, many chunks per run,
    chunk [vstart, vend) dedup across 8-aligned window overlap."""
    rng = np.random.default_rng(11)
    const = SimulationConstants(dx=0.05, cfl=0.5)
    kern = make_kernel(KernelFamily.WENDLAND_C2, 3, dx=const.dx)
    n = 400
    pos = rng.uniform(-0.13, 0.13, (n, 3))  # ~3 cells across
    dens = rng.uniform(990, 1040, n)
    vel = rng.normal(0, 0.5, (n, 3))
    grid, p, cs = _assemble(pos, dens, vel, const, kern, 512)
    spec = PhysicsSpec(
        constants=const, kernel=kern, viscosity=ViscosityModel.ARTIFICIAL,
        diffusion=DensityDiffusionModel.COMPLEX,
    )
    ref = pair_sweep(spec, grid, 512, 64, p, cs,
                     p.position, p.density, p.pressure, p.velocity)
    out = pbs.pallas_block_sweep(
        spec, grid, 4096, p, cs,
        p.position, p.density, p.pressure, p.velocity, interpret=True,
    )
    _compare(out, ref)


@pytest.mark.slow
def test_block_sweep_partitioned_tables(monkeypatch):
    """Chunk tables beyond TAB_BUDGET words run as a partitioned launch
    (one kernel call per program range, rebased table slices) and must match
    the XLA sweep bitwise-structurally - the >800k-particle SMEM path,
    exercised here by shrinking the budget instead of the particle count."""
    const, kern, grid, p, cell_start = _setup(3, n=400, capacity=1024)
    spec = PhysicsSpec(
        constants=const, kernel=kern, viscosity=ViscosityModel.ARTIFICIAL,
        diffusion=DensityDiffusionModel.LINEAR,
        shifting=ShiftingMode.PLANAR, kernel_output=KernelOutputMode.STORE,
    )
    ref = pair_sweep(spec, grid, 512, 64, p, cell_start,
                     p.position, p.density, p.pressure, p.velocity)
    monkeypatch.setattr(pbs, "TAB_BUDGET", 192)
    pbs.pallas_block_sweep.clear_cache()
    try:
        assert pbs.n_tab_parts(2048) > 1
        out = pbs.pallas_block_sweep(
            spec, grid, 2048, p, cell_start,
            p.position, p.density, p.pressure, p.velocity, interpret=True,
        )
    finally:
        pbs.pallas_block_sweep.clear_cache()
    _compare(out, ref)
    # telemetry folds the per-part budget demand: the partitioned build must
    # report at least the raw chunk need (and more when parts skew)
    bt_part = pbs.make_block_tables(cell_start, p.cell, p.active, grid,
                                    1024, 2048)
    monkeypatch.setattr(pbs, "TAB_BUDGET", 192 * 1024)
    bt_full = pbs.make_block_tables(cell_start, p.cell, p.active, grid,
                                    1024, 2048)
    assert int(bt_part.chunk_total) >= int(bt_full.chunk_total)


def test_partitioned_part_overflow_clamps_and_retunes(monkeypatch):
    """A skewed cover can put more than TAB_BUDGET chunks into ONE part even
    when ct_cap holds globally.  The launch must clamp the rebased chunk
    indices to the table slice (an unclamped index reads past the SMEM slice
    on hardware) and the telemetry must exceed ct_cap so the retune replays
    the interval at a larger table."""
    const, kern, grid, p, cell_start = _setup(3, n=400, capacity=1024)
    spec = PhysicsSpec(
        constants=const, kernel=kern, viscosity=ViscosityModel.ARTIFICIAL,
        diffusion=DensityDiffusionModel.LINEAR,
    )
    # this fixture's per-block chunk need is [12, 15, 12, 4, 0, ...]: with
    # TAB_BUDGET=13 and ct_cap=104 (G=8, one block per part) only block 1
    # overflows its slice
    monkeypatch.setattr(pbs, "TAB_BUDGET", 13)
    pbs.pallas_block_sweep.clear_cache()
    try:
        tabs = pbs.make_block_tables(cell_start, p.cell, p.active, grid,
                                     1024, 104)
        per_block = np.diff(np.asarray(tabs.prog_start) % 16777216)
        assert per_block.max() > 13 and (per_block <= 13).sum() >= 3

        # telemetry: part overflow must inflate chunk_total past ct_cap
        assert int(tabs.chunk_total) > 104

        # every part the kernel receives stays inside its 13-word slice
        maxb = 1024 // pbs.BLOCK
        for _b0, _nb, ps_g, mid_g, _tab in pbs.partition_tables(
                tabs, maxb, pbs.n_tab_parts(104)):
            assert int((np.asarray(ps_g) % 16777216).max()) <= 13
            assert int(np.asarray(mid_g).max()) <= 13

        # execution is safe-truncated: finite everywhere, and blocks whose
        # parts did not overflow are exactly right
        out = pbs.pallas_block_sweep(
            spec, grid, 104, p, cell_start,
            p.position, p.density, p.pressure, p.velocity, interpret=True,
        )
        ref = pair_sweep(spec, grid, 512, 64, p, cell_start,
                         p.position, p.density, p.pressure, p.velocity)
        assert np.isfinite(np.asarray(out.drhodt)).all()
        assert np.isfinite(np.asarray(out.acceleration)).all()
        ok_rows = np.zeros(1024, bool)
        for b in range(maxb):
            if per_block[b] <= 13:
                ok_rows[b * pbs.BLOCK : (b + 1) * pbs.BLOCK] = True
        assert ok_rows.sum() >= 3 * pbs.BLOCK
        np.testing.assert_allclose(
            np.asarray(out.drhodt)[ok_rows], np.asarray(ref.drhodt)[ok_rows],
            rtol=2e-5,
            atol=2e-5 * (float(np.abs(np.asarray(ref.drhodt)).max()) + 1e-6),
        )
    finally:
        pbs.pallas_block_sweep.clear_cache()


def test_block_tables_overflow_telemetry():
    """chunk_total reports the real need even when ct_cap truncates."""
    const, kern, grid, p, cell_start = _setup(3)
    full = pbs.make_block_tables(cell_start, p.cell, p.active, grid,
                                 p.capacity, 4096)
    need = int(full.chunk_total)
    assert 0 < need < 4096
    tight = pbs.make_block_tables(cell_start, p.cell, p.active, grid,
                                  p.capacity, 64)
    assert int(tight.chunk_total) == need  # telemetry unaffected by clamp
    # low 24 bits carry the (clamped) chunk starts; the high byte is the
    # block's lane-group cut
    assert int((tight.prog_start % 16777216).max()) <= 64


def test_block_estimate_covers_initial():
    """Host-side ct_cap estimate matches the jitted builder on the initial
    configuration."""
    const, kern, grid, p, cell_start = _setup(3)
    t = pbs.make_block_tables(cell_start, p.cell, p.active, grid,
                              p.capacity, 8192)
    est = pbs.estimate_chunk_total(
        np.asarray(p.position[np.asarray(p.active)]), kern.H_inv, grid,
        p.capacity,
    )
    assert est == int(t.chunk_total)


def test_block_single_row_blocks_cut128():
    """Blocks entirely inside one (y,z)-row have lane-group cut == 128 - the
    COMMON case in 3D.  cut * 2^24 is exactly 2^31 and silently wrapped the
    packed prog_start negative (int32), decoding into a negative chunk range:
    every interpret test with multi-row blobs missed it while the compiled
    kernel crashed the chip.  The cut is stored as cut-1 now; this pins the
    single-row case."""
    rng = np.random.default_rng(7)
    n = 500
    const = SimulationConstants(dx=0.01, cfl=0.5)
    kern = make_kernel(KernelFamily.WENDLAND_C2, 2, dx=const.dx)
    # dense line along x: whole 128-row blocks live in one y-row
    pos = np.stack([np.arange(n) * const.dx,
                    rng.uniform(-0.004, 0.004, n)], axis=1)
    dens = rng.uniform(990, 1040, size=n)
    vel = rng.normal(0, 0.5, size=(n, 2))
    grid, p, cs = _assemble(pos, dens, vel, const, kern, 512, seed=7)

    # the setup must actually produce cut == 128 blocks
    keys = np.asarray(cl.linearize(p.cell, grid))
    keys = np.where(np.asarray(p.active), keys, grid.ncells)
    nx = grid.shape[0]
    cuts = []
    for b0 in range(0, 512, 128):
        kb, act = keys[b0:b0 + 128], keys[b0:b0 + 128] < grid.ncells
        if act.any():
            cuts.append(int(((kb // nx) == (kb[act] // nx)[0])[act].sum()))
    assert max(cuts) == 128

    spec = PhysicsSpec(constants=const, kernel=kern,
                       viscosity=ViscosityModel.ARTIFICIAL,
                       diffusion=DensityDiffusionModel.LINEAR)
    ref = pair_sweep(spec, grid, 256, 64, p, cs, p.position, p.density,
                     p.pressure, p.velocity)
    out = pbs.pallas_block_sweep(spec, grid, 1024, p, cs, p.position,
                                 p.density, p.pressure, p.velocity,
                                 interpret=True)
    _compare(out, ref)


def _blob_sim(use_pallas, block, tmp_path, *, n=400, max_per_cell=None,
              t_end=0.02):
    """A small 2D random blob wired through the full driver (interpret)."""
    import dataclasses

    from sphexample_tpu import SimulationMetaData, assemble_simulation
    from sphexample_tpu.core.step import make_interval_fn

    rng = np.random.default_rng(5)
    const = SimulationConstants(dx=0.02, c0=40.0, cfl=0.3)
    kern = make_kernel(KernelFamily.WENDLAND_C2, 2, dx=const.dx)
    pos = rng.uniform(0, 0.3, size=(n, 2))
    meta = SimulationMetaData(
        simulation_name="blk", save_location=str(tmp_path), dims=2,
        simulation_time=t_end, output_times=t_end / 2, block_size=64,
        dtype="float64", use_pallas=use_pallas, block_sweep=block,
        grid_margin_cells=4,
        **({"max_per_cell": max_per_cell} if max_per_cell else {}),
    )
    sim = assemble_simulation(
        pos, np.full(n, const.rho0), np.ones(n, np.int32),
        np.ones(n, np.int32), np.arange(1, n + 1),
        meta, const, kern, ViscosityModel.ARTIFICIAL,
        DensityDiffusionModel.LINEAR,
    )
    if use_pallas:
        sim.cfg = dataclasses.replace(sim.cfg, pallas_interpret=True)
        sim.interval_fn = make_interval_fn(sim.cfg)
    return sim


def _live_by_id(state):
    ids = np.asarray(state.particles.id)
    order = np.argsort(ids)
    return order[ids[order] > 0]


@pytest.mark.slow
def test_block_step_trajectory_matches_xla(tmp_path):
    """Full driver intervals on the block path (interpret) vs the XLA step
    path: the trajectory must agree to f32-kernel tolerance (the block
    kernel computes in f32; the XLA sim is f64)."""
    from sphexample_tpu import run_simulation

    sim_b = _blob_sim(True, True, tmp_path)
    assert sim_b.cfg.ct_cap > 0, "block path not active"
    sim_x = _blob_sim(False, True, tmp_path)

    sim_b = run_simulation(sim_b, max_intervals=2)
    sim_x = run_simulation(sim_x, max_intervals=2)

    ob, ox = _live_by_id(sim_b.state), _live_by_id(sim_x.state)
    np.testing.assert_allclose(
        float(sim_b.state.total_time), float(sim_x.state.total_time),
        rtol=1e-5,
    )
    pb = np.asarray(sim_b.state.particles.position)[ob]
    px = np.asarray(sim_x.state.particles.position)[ox]
    np.testing.assert_allclose(pb, px, rtol=1e-4, atol=2e-5 * 0.02)
    db = np.asarray(sim_b.state.particles.density)[ob]
    dxx = np.asarray(sim_x.state.particles.density)[ox]
    np.testing.assert_allclose(db, dxx, rtol=5e-4)
    assert int(sim_b.state.max_chunks) > 0  # telemetry rode the rebuilds


@pytest.mark.slow
def test_block_retune_on_chunk_overflow(tmp_path):
    """An undersized chunk table must be detected by the max_chunks
    telemetry and recovered by a decisive retune + replay (the truncated
    cover sweeps wrong physics, exactly like overflowed windows)."""
    import dataclasses

    from sphexample_tpu import run_simulation
    from sphexample_tpu.core.step import make_interval_fn
    from sphexample_tpu.ops.pallas_block_sweep import init_block_tables

    sim = _blob_sim(True, True, tmp_path)
    assert sim.cfg.ct_cap > 0
    tiny = 16
    sim.cfg = dataclasses.replace(sim.cfg, ct_cap=tiny)
    sim.state = sim.state.replace(
        block_tables=init_block_tables(
            int(sim.state.particles.capacity), tiny
        )
    )
    sim.interval_fn = make_interval_fn(sim.cfg)

    sim = run_simulation(sim, max_intervals=1)
    assert sim.cfg.ct_cap > tiny, "expected a chunk-capacity retune"
    assert int(sim.state.max_chunks) <= sim.cfg.ct_cap
    act = np.asarray(sim.state.particles.active)
    assert np.isfinite(np.asarray(sim.state.particles.density)[act]).all()
    assert float(sim.state.total_time) > 0.0


@pytest.mark.slow
@pytest.mark.parametrize("ch", [192, 256])
def test_block_sweep_ch_override_parity(ch):
    """CH is tunable (env SPH_BLOCK_CH; chunk word supports <= 256): pin the
    non-power-of-two 192 configuration - its tree-reduce tail (24 = 3x8) and
    8-bit validity fields - and the 256 ceiling (the chunk word stores vstart
    and vend-1 in 8 bits each, so CH=256 saturates both) against the XLA
    sweep."""
    import sphexample_tpu.ops.pallas_block_sweep as pbs_mod

    old = pbs_mod.CH
    pbs_mod.CH = ch
    pbs_mod.pallas_block_sweep.clear_cache()
    try:
        # the encoding field widths follow the patched CH at call time
        # (_enc_bits): 8-bit validity fields at CH=192/256 vs the
        # production default's 7 - the builder, mirror and kernel must all
        # agree on the widened layout
        s = pbs_mod._enc_bits()
        assert s == 8
        const, kern, grid, p, cs = _setup(3)
        t = pbs_mod.make_block_tables(cs, p.cell, p.active, grid,
                                      p.capacity, 8192)
        est = pbs_mod.estimate_chunk_total(
            np.asarray(p.position[np.asarray(p.active)]), kern.H_inv, grid,
            p.capacity)
        assert est == int(t.chunk_total)
        spec = PhysicsSpec(constants=const, kernel=kern,
                           viscosity=ViscosityModel.ARTIFICIAL,
                           diffusion=DensityDiffusionModel.LINEAR)
        ref = pair_sweep(spec, grid, 512, 64, p, cs, p.position, p.density,
                         p.pressure, p.velocity)
        out = pbs_mod.pallas_block_sweep(spec, grid, 8192, p, cs, p.position,
                                         p.density, p.pressure, p.velocity,
                                         interpret=True)
        _compare(out, ref)
    finally:
        pbs_mod.CH = old
        pbs_mod.pallas_block_sweep.clear_cache()


@pytest.mark.slow
def test_block_sweep_ch256_vend_saturation():
    """At CH=256 the 8-bit validity fields must actually saturate: a dense
    cluster crowded into ~one cell produces runs longer than 128 rows, so
    chunks carry vend in (128, 256] - the band the 7-bit production encoding
    cannot represent.  The original CH-override fixture never produced
    vend > 128, so a silent 7-bit truncation would have passed (advisor
    finding, round 3)."""
    import sphexample_tpu.ops.pallas_block_sweep as pbs_mod

    old = pbs_mod.CH
    pbs_mod.CH = 256
    pbs_mod.pallas_block_sweep.clear_cache()
    try:
        rng = np.random.default_rng(13)
        const = SimulationConstants(dx=0.05, cfl=0.5)
        kern = make_kernel(KernelFamily.WENDLAND_C2, 3, dx=const.dx)
        n = 420  # one ~H-wide blob: single-cell runs of length ~n
        pos = rng.uniform(-0.05, 0.05, (n, 3))
        dens = rng.uniform(990, 1040, n)
        vel = rng.normal(0, 0.5, (n, 3))
        grid, p, cs = _assemble(pos, dens, vel, const, kern, 512)

        t = pbs_mod.make_block_tables(cs, p.cell, p.active, grid,
                                      p.capacity, 8192)
        total = int(t.chunk_total)
        s = pbs_mod._enc_bits()
        u = np.asarray(t.chunk_tab[:total], dtype=np.int64) & 0xFFFFFFFF
        ve = ((u >> s) & ((1 << s) - 1)) + 1
        assert int(ve.max()) > 128, "fixture failed to force long runs"

        spec = PhysicsSpec(constants=const, kernel=kern,
                           viscosity=ViscosityModel.ARTIFICIAL,
                           diffusion=DensityDiffusionModel.LINEAR)
        ref = pair_sweep(spec, grid, 512, 64, p, cs, p.position, p.density,
                         p.pressure, p.velocity)
        out = pbs_mod.pallas_block_sweep(spec, grid, 8192, p, cs, p.position,
                                         p.density, p.pressure, p.velocity,
                                         interpret=True)
        _compare(out, ref)
    finally:
        pbs_mod.CH = old
        pbs_mod.pallas_block_sweep.clear_cache()


@pytest.mark.parametrize(
    "ch",
    [128,
     pytest.param(64, marks=pytest.mark.slow),
     pytest.param(192, marks=pytest.mark.slow),
     pytest.param(256, marks=pytest.mark.slow)],
)
def test_block_sweep_unaligned_parity(ch):
    """The UNALIGNED window A/B (env SPH_BLOCK_UNALIGNED) drops the 8-row DMA
    alignment: windows start exactly at each run's first row, the packed word
    carries only vend-1 | raw row offset << S_BITS, and validity becomes
    one-sided.  Pin it against the XLA sweep across the CH values the
    hardware A/B matrix probes (64/128/192/256) - the builder, host mirror
    and kernel must agree on the alternate layout at every field width."""
    import sphexample_tpu.ops.pallas_block_sweep as pbs_mod

    old_u, old_ch = pbs_mod.UNALIGNED, pbs_mod.CH
    pbs_mod.UNALIGNED, pbs_mod.CH = 1, ch
    pbs_mod.pallas_block_sweep.clear_cache()
    try:
        const, kern, grid, p, cs = _setup(3)
        t = pbs_mod.make_block_tables(cs, p.cell, p.active, grid,
                                      p.capacity, 8192)
        est = pbs_mod.estimate_chunk_total(
            np.asarray(p.position[np.asarray(p.active)]), kern.H_inv, grid,
            p.capacity)
        assert est == int(t.chunk_total)
        # the unaligned word layout really is in play: every live chunk's
        # validity starts at 0 (vstart has no field; decode asserts below)
        s = pbs_mod._enc_bits()
        total = int(t.chunk_total)
        u = np.asarray(t.chunk_tab[:total], dtype=np.int64) & 0xFFFFFFFF
        ve = (u & ((1 << s) - 1)) + 1
        assert (ve >= 1).all() and (ve <= ch).all()
        spec = PhysicsSpec(constants=const, kernel=kern,
                           viscosity=ViscosityModel.ARTIFICIAL,
                           diffusion=DensityDiffusionModel.LINEAR,
                           shifting=ShiftingMode.PLANAR,
                           kernel_output=KernelOutputMode.STORE)
        ref = pair_sweep(spec, grid, 512, 64, p, cs, p.position, p.density,
                         p.pressure, p.velocity)
        out = pbs_mod.pallas_block_sweep(spec, grid, 8192, p, cs, p.position,
                                         p.density, p.pressure, p.velocity,
                                         interpret=True)
        _compare(out, ref)
    finally:
        pbs_mod.UNALIGNED, pbs_mod.CH = old_u, old_ch
        pbs_mod.pallas_block_sweep.clear_cache()


@pytest.mark.slow
@pytest.mark.parametrize("bpb", [2, 4])
def test_block_sweep_bpb_override_parity(bpb):
    """BPB (blocks per grid program, env SPH_BLOCK_BPB) amortizes the
    per-program grid floor; pin the multi-block-program path - per-block
    scalar decode, lane-sliced selves, per-block acc slots, lane-concatenated
    output - against the XLA sweep.  capacity=1024 -> maxb=8, so bpb=4
    exercises programs whose four blocks span live AND dead chunk ranges."""
    import sphexample_tpu.ops.pallas_block_sweep as pbs_mod

    old = pbs_mod.BPB
    pbs_mod.BPB = bpb
    pbs_mod.pallas_block_sweep.clear_cache()
    try:
        const, kern, grid, p, cs = _setup(3)
        spec = PhysicsSpec(constants=const, kernel=kern,
                           viscosity=ViscosityModel.ARTIFICIAL,
                           diffusion=DensityDiffusionModel.LINEAR,
                           shifting=ShiftingMode.PLANAR,
                           kernel_output=KernelOutputMode.STORE)
        ref = pair_sweep(spec, grid, 512, 64, p, cs, p.position, p.density,
                         p.pressure, p.velocity)
        out = pbs_mod.pallas_block_sweep(spec, grid, 8192, p, cs, p.position,
                                         p.density, p.pressure, p.velocity,
                                         interpret=True)
        _compare(out, ref)
    finally:
        pbs_mod.BPB = old
        pbs_mod.pallas_block_sweep.clear_cache()


@pytest.mark.slow
def test_block_tables_wide_offsets_beyond_2pow19():
    """At the default CH=128 the chunk word packs 7+7+18 bits, raising the
    capacity ceiling from 2^19 to 2^21 rows.  Build tables for a ~729k-row
    lattice (off8 > 2^19: the widened offset field is actually exercised)
    and verify every decoded (off8, vstart, vend) word-for-word against the
    independent numpy mirror of the builder."""
    import sphexample_tpu.ops.pallas_block_sweep as pbs_mod

    if pbs_mod.CH != 128:
        pytest.skip("encoding widths pinned at the default CH=128")
    assert pbs_mod.S_BITS == 7
    assert pbs_mod.BLOCK_CAP_LIMIT == 1 << 21

    dx = 0.05
    n_side = 90                      # 729,000 particles > 2^19 rows
    kern = make_kernel(KernelFamily.WENDLAND_C2, 3, dx=dx)
    g = np.arange(n_side) * dx
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    pos = np.stack([X.ravel(), Y.ravel(), Z.ravel()], axis=-1)
    pos -= pos.mean(axis=0)
    n = len(pos)
    capacity = -(-(n + 256) // 128) * 128
    const = SimulationConstants(dx=dx, cfl=0.5)
    parts = allocate_particles(
        pos, np.full(n, 1000.0), np.ones(n, np.int32), np.ones(n, np.int32),
        np.arange(1, n + 1), dtype=jnp.float32, capacity=capacity,
    )
    grid = cl.grid_from_positions(pos, kern.H_inv, margin_cells=3)
    sorted_p, cell_start, _ = cl.rebuild(parts, kern.H_inv, grid)

    ct_cap = 1 << 18
    t = pbs_mod.make_block_tables(cell_start, sorted_p.cell, sorted_p.active,
                                  grid, capacity, ct_cap)
    total = int(t.chunk_total)
    assert 0 < total <= ct_cap
    u = np.asarray(t.chunk_tab[:total], dtype=np.int64) & 0xFFFFFFFF
    off8 = (u >> 14) * 8
    vs = u & 127
    ve = ((u >> 7) & 127) + 1
    assert int(off8.max()) > (1 << 19), "test state never exercised wide offsets"

    key, cs = pbs_mod._host_sorted_keys(pos, kern.H_inv, grid)
    key = np.concatenate([key, np.full(capacity - n, grid.ncells, key.dtype)])
    wins = []
    for b0 in range(0, capacity, pbs_mod.BLOCK):
        kb = key[b0 : b0 + pbs_mod.BLOCK]
        pbs_mod._host_block_chunks(kb[kb < grid.ncells], cs, grid,
                                   windows=wins, capacity=capacity)
    assert len(wins) == total
    np.testing.assert_array_equal(off8, np.asarray([w[0] for w in wins]))
    np.testing.assert_array_equal(vs, np.asarray([w[1] for w in wins]))
    np.testing.assert_array_equal(ve, np.asarray([w[2] for w in wins]))


@pytest.mark.slow
def test_block_sweep_unroll_override_parity():
    """UNROLL=2 (manual chunk-loop unroll: full groups of 2, rolled
    remainder) must visit exactly the same chunks in the same order - pin it
    against the XLA sweep before the chip A/B."""
    import sphexample_tpu.ops.pallas_block_sweep as pbs_mod

    old = pbs_mod.UNROLL
    pbs_mod.UNROLL = 2
    pbs_mod.pallas_block_sweep.clear_cache()
    try:
        const, kern, grid, p, cs = _setup(3)
        spec = PhysicsSpec(constants=const, kernel=kern,
                           viscosity=ViscosityModel.ARTIFICIAL,
                           diffusion=DensityDiffusionModel.LINEAR)
        ref = pair_sweep(spec, grid, 512, 64, p, cs, p.position, p.density,
                         p.pressure, p.velocity)
        out = pbs_mod.pallas_block_sweep(spec, grid, 8192, p, cs, p.position,
                                         p.density, p.pressure, p.velocity,
                                         interpret=True)
        _compare(out, ref)
    finally:
        pbs_mod.UNROLL = old
        pbs_mod.pallas_block_sweep.clear_cache()


@pytest.mark.slow
def test_block_sweep_bpb_unroll_combined_parity():
    """BPB=2 x UNROLL=2 together (the likely post-A/B production combo):
    per-half manual unroll loops with per-block acc slots."""
    import sphexample_tpu.ops.pallas_block_sweep as pbs_mod

    old_b, old_u = pbs_mod.BPB, pbs_mod.UNROLL
    pbs_mod.BPB, pbs_mod.UNROLL = 2, 2
    pbs_mod.pallas_block_sweep.clear_cache()
    try:
        const, kern, grid, p, cs = _setup(3)
        spec = PhysicsSpec(constants=const, kernel=kern,
                           viscosity=ViscosityModel.ARTIFICIAL,
                           diffusion=DensityDiffusionModel.LINEAR)
        ref = pair_sweep(spec, grid, 512, 64, p, cs, p.position, p.density,
                         p.pressure, p.velocity)
        out = pbs_mod.pallas_block_sweep(spec, grid, 8192, p, cs, p.position,
                                         p.density, p.pressure, p.velocity,
                                         interpret=True)
        _compare(out, ref)
    finally:
        pbs_mod.BPB, pbs_mod.UNROLL = old_b, old_u
        pbs_mod.pallas_block_sweep.clear_cache()


@pytest.mark.parametrize("dims,seed", [(2, 0), (3, 1), (3, 7)])
def test_block_tables_match_host_mirror(dims, seed):
    """Randomized word-for-word comparison of the device table builder vs
    the independent numpy mirror (irregular clouds, both dims) - the mirror
    also sizes ct_cap, so drift between the two is a sizing bug."""
    import sphexample_tpu.ops.pallas_block_sweep as pbs_mod

    const, kern, grid, p, cs = _setup(dims, n=300, seed=seed, capacity=1024)
    ct_cap = 8192
    t = pbs_mod.make_block_tables(cs, p.cell, p.active, grid,
                                  p.capacity, ct_cap)
    total = int(t.chunk_total)
    assert 0 < total < ct_cap
    S = pbs_mod._enc_bits()
    u = np.asarray(t.chunk_tab[:total], dtype=np.int64) & 0xFFFFFFFF
    if pbs_mod.UNALIGNED:
        # A/B word layout: vend-1 | raw row offset << S (vstart == 0)
        off8 = u >> S
        vs = np.zeros_like(u)
        ve = (u & ((1 << S) - 1)) + 1
    else:
        off8 = (u >> (2 * S)) * 8
        vs = u & ((1 << S) - 1)
        ve = ((u >> S) & ((1 << S) - 1)) + 1

    act = np.asarray(p.active)
    key, cs_h = pbs_mod._host_sorted_keys(
        np.asarray(p.position)[act], kern.H_inv, grid)
    cap = p.capacity
    key = np.concatenate([key, np.full(cap - len(key), grid.ncells, key.dtype)])
    wins = []
    for b0 in range(0, cap, pbs_mod.BLOCK):
        kb = key[b0 : b0 + pbs_mod.BLOCK]
        pbs_mod._host_block_chunks(kb[kb < grid.ncells], cs_h, grid,
                                   windows=wins, capacity=cap)
    assert len(wins) == total
    np.testing.assert_array_equal(off8, np.asarray([w[0] for w in wins]))
    np.testing.assert_array_equal(vs, np.asarray([w[1] for w in wins]))
    np.testing.assert_array_equal(ve, np.asarray([w[2] for w in wins]))

"""Aux subsystem tests: checkpoint/resume, determinism, VTKHDF round trip,
ParaView state file, output-time scheduling."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

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
from sphexample_tpu.io.checkpoint import load_checkpoint, save_checkpoint
from sphexample_tpu.io.output import OutputManager
from sphexample_tpu.io.paraview import write_paraview_state
from sphexample_tpu.utils.validation import check_determinism, compare_states


def _small_sim(tmp_path, dtype="float64", t_end=0.05):
    rng = np.random.default_rng(5)
    const = SimulationConstants(dx=0.02, c0=40.0, cfl=0.3)
    kern = make_kernel(KernelFamily.WENDLAND_C2, 2, dx=const.dx)
    n = 120
    pos = np.stack(
        [rng.permutation(n) * const.dx * 0.5, rng.uniform(0, 0.3, n)], axis=-1
    )
    meta = SimulationMetaData(
        simulation_name="aux",
        save_location=str(tmp_path),
        dims=2,
        dtype=dtype,
        simulation_time=t_end,
        output_times=0.01,
        block_size=32,
        grid_margin_cells=4,
        export_grid_cells=True,
    )
    return assemble_simulation(
        pos, np.full(n, const.rho0), np.full(n, 1, np.int32),
        np.ones(n, np.int32), np.arange(1, n + 1),
        meta, const, kern, ViscosityModel.ARTIFICIAL, DensityDiffusionModel.LINEAR,
    ), meta, kern


def test_checkpoint_roundtrip_bitexact(tmp_path):
    sim, meta, kern = _small_sim(tmp_path)
    t_out = jnp.asarray(0.01, dtype=jnp.float64)
    mid = sim.interval_fn(sim.state, t_out)

    path = os.path.join(str(tmp_path), "ck.npz")
    save_checkpoint(path, mid, counter=2)
    restored, counter = load_checkpoint(path, sim.state)
    assert counter == 2

    # continuing from the restored state is bit-identical
    a = sim.interval_fn(mid, jnp.asarray(0.02, dtype=jnp.float64))
    b = sim.interval_fn(restored, jnp.asarray(0.02, dtype=jnp.float64))
    np.testing.assert_array_equal(
        np.asarray(a.particles.position), np.asarray(b.particles.position)
    )
    np.testing.assert_array_equal(
        np.asarray(a.particles.density), np.asarray(b.particles.density)
    )


def test_determinism(tmp_path):
    sim, _, _ = _small_sim(tmp_path)
    assert check_determinism(sim, n_steps=3)


def test_fp32_vs_fp64_drift(tmp_path):
    sim64, _, _ = _small_sim(tmp_path / "a", dtype="float64")
    sim32, _, _ = _small_sim(tmp_path / "b", dtype="float32")
    t64 = jnp.asarray(0.01, dtype=jnp.float64)
    t32 = jnp.asarray(0.01, dtype=jnp.float32)
    f64 = sim64.interval_fn(sim64.state, t64)
    f32 = sim32.interval_fn(sim32.state, t32)
    drift = compare_states(f32, f64, sim64.n_live)
    # short-horizon fp32 drift stays at single-precision level
    assert drift["position"] < 1e-4, drift
    assert drift["density"] < 1e-4, drift


def test_output_manager_and_paraview(tmp_path):
    sim, meta, kern = _small_sim(tmp_path, t_end=0.02)
    out = OutputManager(meta, kern, sim.cfg.grid, sim.n_live)
    run_simulation(sim, save_callback=out.save, max_intervals=2)
    out.close()

    import h5py

    with h5py.File(os.path.join(str(tmp_path), "aux.vtkhdf")) as f:
        r = f["VTKHDF"]
        assert r.attrs["Type"] == b"PolyData"
        assert r["Steps"].attrs["NSteps"] == 3
        assert r["NumberOfPoints"][0] == sim.n_live
        assert set(meta.output_variables) == set(r["PointData"])
    with h5py.File(os.path.join(str(tmp_path), "aux_GridCells.vtkhdf")) as f:
        assert f["VTKHDF"].attrs["Type"] == b"UnstructuredGrid"
        assert f["VTKHDF"]["NumberOfCells"][0] > 0

    path = write_paraview_state(meta)
    content = open(path).read()
    assert "VTKHDFReader" in content and "aux.vtkhdf" in content
    assert "Point Gaussian" in content


def test_make_save_callback_quickstart(tmp_path):
    """The docs/API.md quick-start path: make_save_callback(sim) -> run ->
    close, producing the same transient VTKHDF file as OutputManager."""
    from sphexample_tpu.io.output import make_save_callback

    sim, meta, kern = _small_sim(tmp_path, t_end=0.02)
    save = make_save_callback(sim)
    run_simulation(sim, save_callback=save, max_intervals=2)
    save.close()

    import h5py

    with h5py.File(os.path.join(str(tmp_path), "aux.vtkhdf")) as f:
        r = f["VTKHDF"]
        assert r.attrs["Type"] == b"PolyData"
        assert r["Steps"].attrs["NSteps"] == 3
        assert r["NumberOfPoints"][0] == sim.n_live


def test_output_time_scheduling():
    # scalar interval: counter * interval (reference SPHCellList.jl:689)
    meta = SimulationMetaData(
        simulation_name="s", save_location=".", simulation_time=1.0, output_times=0.25
    )
    assert meta.output_time_for(1) == 0.25
    assert meta.output_time_for(3) == 0.75
    # vector times with the reference's last-entry quirk (:691-698)
    meta = SimulationMetaData(
        simulation_name="s", save_location=".", simulation_time=9.0,
        output_times=(0.1, 0.5, 2.0),
    )
    assert meta.output_time_for(1) == 0.1
    assert meta.output_time_for(2) == 0.5
    assert meta.output_time_for(3) == 9.0  # falls through to SimulationTime


def test_auto_retune_on_overflow(tmp_path):
    """Undersized neighbor windows are grown transparently and the interval
    is replayed from the pre-interval state."""
    import numpy as np

    from sphexample_tpu import run_simulation as run_sim

    rng = np.random.default_rng(0)
    const = SimulationConstants(dx=0.02, c0=40.0, cfl=0.3)
    kern = make_kernel(KernelFamily.WENDLAND_C2, 2, dx=const.dx)
    pos = rng.uniform(0, 0.3, size=(300, 2))
    meta = SimulationMetaData(
        simulation_name="rt", save_location=str(tmp_path), dims=2,
        simulation_time=0.02, output_times=0.01, max_per_cell=2,
        block_size=64, dtype="float64",
    )
    sim = assemble_simulation(
        pos, np.full(300, const.rho0), np.ones(300, np.int32),
        np.ones(300, np.int32), np.arange(1, 301),
        meta, const, kern, ViscosityModel.ARTIFICIAL, DensityDiffusionModel.ZERO,
    )
    assert sim.cfg.cseg == 6  # deliberately undersized
    sim = run_sim(sim, max_intervals=2)
    assert sim.cfg.cseg > 6
    assert float(sim.state.total_time) > 0.02 - 1e-9
    assert np.isfinite(np.asarray(sim.state.particles.density)).all()

    # with auto_retune off the same setup raises
    sim2 = assemble_simulation(
        pos, np.full(300, const.rho0), np.ones(300, np.int32),
        np.ones(300, np.int32), np.arange(1, 301),
        meta, const, kern, ViscosityModel.ARTIFICIAL, DensityDiffusionModel.ZERO,
    )
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="occupancy"):
        run_sim(sim2, max_intervals=2, auto_retune=False)


def test_multi_file_output_mode(tmp_path):
    """ExportSingleVTKHDF=False writes one PolyData file per output."""
    sim, meta, kern = _small_sim(tmp_path, t_end=0.02)
    from sphexample_tpu.config import replace as creplace

    meta2 = creplace(meta, export_single_vtkhdf=False, export_grid_cells=False)
    out = OutputManager(meta2, kern, sim.cfg.grid, sim.n_live)
    run_simulation(sim, save_callback=out.save, max_intervals=2)
    out.close()

    import glob

    import h5py

    files = sorted(glob.glob(os.path.join(str(tmp_path), "aux_0*.vtkhdf")))
    assert len(files) == 3  # initial + 2 outputs
    with h5py.File(files[0]) as f:
        r = f["VTKHDF"]
        assert r.attrs["Type"] == b"PolyData"
        assert r["Vertices"]["NumberOfCells"][0] == sim.n_live


def test_profile_stages_smoke(tmp_path):
    from sphexample_tpu.utils.timers import HourGlass, profile_stages

    sim, _, _ = _small_sim(tmp_path)
    times = profile_stages(sim.cfg, sim.state, iters=2)
    assert "05/08 Neighbor sweep" in times
    assert all(v >= 0 for v in times.values())

    hg = HourGlass()
    with hg.section("demo"):
        pass
    rep = hg.report()
    assert "demo" in rep and "wall clock" in rep


def test_close_hdf_vtk_manually(tmp_path):
    from sphexample_tpu.io.vtkhdf import close_hdf_vtk_manually

    good = os.path.join(str(tmp_path), "ok.vtkhdf")
    import h5py

    with h5py.File(good, "w") as f:
        f.create_group("VTKHDF")
    bad = os.path.join(str(tmp_path), "bad.vtkhdf")
    with open(bad, "wb") as f:
        f.write(b"not hdf5")
    assert close_hdf_vtk_manually(str(tmp_path)) == [bad]


def test_transient_polydata_read_roundtrip(tmp_path):
    """Writer -> reader round-trip, incl. mid-run readability (per-snapshot
    flush) and variable subsetting."""
    import h5py  # noqa: F401
    from sphexample_tpu.io.vtkhdf import (
        TransientPolyDataWriter,
        read_transient_polydata,
    )

    path = os.path.join(str(tmp_path), "rt.vtkhdf")
    w = TransientPolyDataWriter(
        path, {"Density": (np.float64, False), "Velocity": (np.float64, True)}
    )
    rng = np.random.default_rng(0)
    snaps = []
    for k in range(3):
        n = 10 + 5 * k  # varying particle counts per step
        pts = rng.normal(size=(n, 3))
        rho = rng.uniform(990, 1010, size=n)
        vel = rng.normal(size=(n, 3))
        w.append(0.1 * k, pts, {"Density": rho, "Velocity": vel})
        snaps.append((0.1 * k, pts, rho, vel))

    # file is readable BEFORE close thanks to the per-snapshot flush
    got_open = list(read_transient_polydata(path))
    assert len(got_open) == 3
    w.close()

    got = list(read_transient_polydata(path))
    for (t0, p0, r0, v0), (t1, p1, d1) in zip(snaps, got):
        assert t1 == pytest.approx(t0)
        np.testing.assert_allclose(p1, p0)
        np.testing.assert_allclose(d1["Density"], r0)
        np.testing.assert_allclose(d1["Velocity"], v0)

    # variable subset + step subset
    sub = list(read_transient_polydata(path, variables=["Density"], steps=[2]))
    assert len(sub) == 1 and set(sub[0][2]) == {"Density"}
    assert len(sub[0][2]["Density"]) == 20

    with pytest.raises(KeyError):
        next(read_transient_polydata(path, variables=["NoSuchVar"]))


def test_transient_truncate_and_append(tmp_path):
    """truncate_steps + append-mode reopen (the resume path) on both writers."""
    from sphexample_tpu.io.vtkhdf import (
        TransientGridWriter,
        TransientPolyDataWriter,
        read_transient_polydata,
    )

    path = os.path.join(str(tmp_path), "tr.vtkhdf")
    rng = np.random.default_rng(1)
    specs = {"Density": (np.float64, False)}
    snaps = []
    w = TransientPolyDataWriter(path, specs)
    for k in range(4):
        pts = rng.normal(size=(6 + k, 3))
        rho = rng.uniform(size=6 + k)
        w.append(0.1 * k, pts, {"Density": rho})
        snaps.append((pts, rho))
    w.close()

    # reopen in append mode, truncate to 2 steps, append a fresh step 3
    w = TransientPolyDataWriter(path, specs, mode="a")
    w.truncate_steps(2)
    pts3 = rng.normal(size=(11, 3))
    rho3 = rng.uniform(size=11)
    w.append(0.99, pts3, {"Density": rho3})
    w.close()

    got = list(read_transient_polydata(path))
    assert len(got) == 3
    np.testing.assert_allclose(got[0][1], snaps[0][0])
    np.testing.assert_allclose(got[1][2]["Density"], snaps[1][1])
    assert got[2][0] == pytest.approx(0.99)
    np.testing.assert_allclose(got[2][1], pts3)

    # grid writer: varying cells per step, truncate, re-append
    gpath = os.path.join(str(tmp_path), "gr.vtkhdf")
    g = TransientGridWriter(gpath)
    for k in range(3):
        cells = np.argwhere(np.ones((2 + k, 2, 2))).astype(np.int64)
        g.append(0.1 * k, 0.5, cells, np.zeros(len(cells), np.int64))
    g.close()
    g = TransientGridWriter(gpath, mode="a")
    g.truncate_steps(1)
    cells = np.argwhere(np.ones((5, 1, 1))).astype(np.int64)
    g.append(0.77, 0.5, cells, np.zeros(len(cells), np.int64))
    import h5py
    g.close()
    with h5py.File(gpath, "r", locking=False) as f:
        steps = f["VTKHDF"]["Steps"]
        assert int(steps.attrs["NSteps"]) == 2
        np.testing.assert_allclose(np.asarray(steps["Values"]), [0.0, 0.77])
        ncells = np.asarray(f["VTKHDF"]["NumberOfCells"])
        assert list(ncells) == [8, 5]
        # offsets dataset length = sum(ncells_j + 1)
        assert f["VTKHDF"]["Offsets"].shape[0] == 8 + 5 + 2
        assert f["VTKHDF"]["Types"].shape[0] == 13


def test_async_saver_ordering_and_errors():
    """_AsyncSaver preserves snapshot order (single worker) and surfaces
    worker exceptions on the main thread."""
    import time as _time

    from sphexample_tpu.core.driver import _AsyncSaver

    seen = []

    def cb(counter, state):
        _time.sleep(0.01)
        seen.append(counter)

    s = _AsyncSaver(cb)
    for c in range(1, 8):
        s(c, None)
    s.close()
    assert seen == list(range(1, 8))

    def boom(counter, state):
        raise ValueError("disk full")

    s2 = _AsyncSaver(boom)
    s2(1, None)
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="async save failed"):
        s2.close()


def test_async_output_matches_sync(tmp_path):
    """run_simulation with async_output writes the same VTKHDF bytes as the
    synchronous path."""
    import dataclasses

    import h5py

    sim_a = _tiny_sim(str(tmp_path / "a"), async_output=True)
    sim_b = _tiny_sim(str(tmp_path / "b"), async_output=False)

    for sim in (sim_a, sim_b):
        out = OutputManager(sim.meta, sim.cfg.spec.kernel, sim.cfg.grid, sim.n_live)
        run_simulation(sim, save_callback=out.save, max_intervals=3)
        out.close()

    def snap(path):
        with h5py.File(path, "r") as f:
            r = f["VTKHDF"]
            return (int(r["Steps"].attrs["NSteps"]), np.asarray(r["Points"][...]),
                    np.asarray(r["PointData"]["Density"][...]))

    na, pa, da = snap(tmp_path / "a" / "Tiny.vtkhdf")
    nb, pb, db = snap(tmp_path / "b" / "Tiny.vtkhdf")
    assert na == nb
    np.testing.assert_array_equal(pa, pb)
    np.testing.assert_array_equal(da, db)


def _tiny_sim(save_location, async_output=True):
    import dataclasses

    from sphexample_tpu import (DensityDiffusionModel, KernelFamily,
                                SimulationConstants, SimulationMetaData,
                                ViscosityModel, assemble_simulation, make_kernel)

    const = SimulationConstants(dx=0.02, c0=40.0, cfl=0.3)
    kern = make_kernel(KernelFamily.WENDLAND_C2, 2, dx=const.dx)
    dx = const.dx
    xs, zs = np.meshgrid(np.arange(8), np.arange(8), indexing="ij")
    fluid = np.stack([xs.ravel() * dx, zs.ravel() * dx + dx], axis=-1)
    floor_x = np.arange(-3, 11) * dx
    floor = np.stack([floor_x, np.zeros_like(floor_x)], axis=-1)
    pos = np.concatenate([floor, fluid])
    ptype = np.concatenate([np.full(len(floor), 2), np.full(len(fluid), 1)]).astype(np.int32)
    meta = SimulationMetaData(
        simulation_name="Tiny", save_location=save_location, dims=2,
        dtype="float64", simulation_time=0.01, output_times=0.002,
        grid_margin_cells=4, async_output=async_output,
    )
    return assemble_simulation(
        pos, np.full(len(pos), const.rho0), ptype,
        np.ones(len(pos), np.int32), np.arange(1, len(pos) + 1),
        meta, const, kern, ViscosityModel.ARTIFICIAL, DensityDiffusionModel.LINEAR,
    )


def test_auto_retune_pallas_tables(tmp_path):
    """Retune under the Pallas path must re-init the program tables to the
    grown window shapes (they are shaped by maxc/mpc/capacity) and replay."""
    import dataclasses

    import numpy as np

    from sphexample_tpu import run_simulation as run_sim

    rng = np.random.default_rng(3)
    const = SimulationConstants(dx=0.02, c0=40.0, cfl=0.3)
    kern = make_kernel(KernelFamily.WENDLAND_C2, 2, dx=const.dx)
    # a compact blob that compresses under self-gravity-free pressure:
    # undersize the windows so the first interval overflows
    pos = rng.uniform(0, 0.25, size=(400, 2))
    meta = SimulationMetaData(
        simulation_name="rtp", save_location=str(tmp_path), dims=2,
        simulation_time=0.02, output_times=0.01, max_per_cell=8,
        block_size=64, dtype="float64", use_pallas=True,
        block_sweep=False,  # this test targets the cell-pair program tables
    )
    sim = assemble_simulation(
        pos, np.full(400, const.rho0), np.ones(400, np.int32),
        np.ones(400, np.int32), np.arange(1, 401),
        meta, const, kern, ViscosityModel.ARTIFICIAL, DensityDiffusionModel.ZERO,
    )
    sim.cfg = dataclasses.replace(sim.cfg, pallas_interpret=True)
    from sphexample_tpu.core.step import make_interval_fn

    sim.interval_fn = make_interval_fn(sim.cfg)
    mpc0, maxp0 = sim.cfg.mpc, sim.state.pallas_tables.prog_slot.shape[0]

    sim = run_sim(sim, max_intervals=2)
    assert sim.cfg.mpc > mpc0, "expected a retune to fire"
    # tables re-initialized to the grown shapes and refreshed by the replay
    from sphexample_tpu.ops.pallas_sweep import sweep_rows

    expected_maxp = (
        sim.cfg.maxc
        + sim.state.particles.capacity // sweep_rows(sim.cfg.mpc) + 1
    )
    assert sim.state.pallas_tables.prog_slot.shape[0] == expected_maxp
    assert int(sim.state.pallas_tables.nprog) > 0
    assert float(sim.state.total_time) > 0.02 - 1e-9
    assert np.isfinite(np.asarray(sim.state.particles.density)).all()


def test_grid_escape_trips_alarm_and_regrids(tmp_path):
    """A particle crossing the static grid's margin must trip the
    grid-escape telemetry (re-grid + replay under auto_retune; a loud
    RuntimeError without) instead of silently clamping into an edge cell.
    The reference's Dict grid is unbounded (SPHCellList.jl:144-162); the
    static grid must alarm where the reference would just keep going."""
    import numpy as np

    from sphexample_tpu import run_simulation as run_sim

    def build():
        rng = np.random.default_rng(7)
        const = SimulationConstants(dx=0.02, c0=40.0, cfl=0.3)
        kern = make_kernel(KernelFamily.WENDLAND_C2, 2, dx=const.dx)
        pos = rng.uniform(0, 0.3, size=(200, 2))
        meta = SimulationMetaData(
            simulation_name="esc", save_location=str(tmp_path), dims=2,
            simulation_time=0.02, output_times=0.01, block_size=64,
            dtype="float64", grid_margin_cells=2,
        )
        sim = assemble_simulation(
            pos, np.full(200, const.rho0), np.ones(200, np.int32),
            np.ones(200, np.int32), np.arange(1, 201),
            meta, const, kern, ViscosityModel.ARTIFICIAL,
            DensityDiffusionModel.ZERO,
        )
        # launch one ISOLATED particle (outside the blob, so viscosity can't
        # brake it) through the 2-cell margin within the first output
        # interval: grid x-edge is ~0.52 for H=0.08, and 30 m/s covers the
        # remaining ~0.1 m in ~3 ms
        cap = sim.state.particles.capacity
        vel = np.zeros((cap, 2))
        vel[0, 0] = 30.0
        pos2 = np.asarray(sim.state.particles.position).copy()
        pos2[0] = [0.45, 0.15]
        sim.state = sim.state.replace(
            particles=sim.state.particles.replace(
                velocity=jnp.asarray(vel, dtype=jnp.float64),
                position=jnp.asarray(pos2, dtype=jnp.float64),
            )
        )
        return sim

    sim = build()
    ncells0 = sim.cfg.grid.ncells
    sim = run_sim(sim, max_intervals=2)
    assert sim.cfg.grid.ncells > ncells0, "expected a re-grid to fire"
    assert int(sim.state.grid_escapes) == 0  # replay ran clean on the new grid
    assert float(sim.state.total_time) > 0.02 - 1e-9
    act = np.asarray(sim.state.particles.active)
    assert np.isfinite(np.asarray(sim.state.particles.density)[act]).all()
    # the escapee's final position is inside the grown grid
    from sphexample_tpu.ops.cell_list import host_cell_coords

    pos_f = np.asarray(sim.state.particles.position)[act]
    c = host_cell_coords(pos_f, sim.cfg.spec.kernel.H_inv)
    lo = np.asarray(sim.cfg.grid.cmin)
    hi = lo + np.asarray(sim.cfg.grid.shape) - 1
    assert ((c >= lo) & (c <= hi)).all()

    # with auto_retune off the same escape raises loudly
    sim2 = build()
    with pytest.raises(RuntimeError, match="escaped"):
        run_sim(sim2, max_intervals=2, auto_retune=False)


def test_checkpoint_across_retune(tmp_path):
    """A checkpoint written AFTER a retune (grown mpc/cseg/capacity) must
    resume into a freshly assembled simulation with the original sizing:
    resume_simulation grows the windows/capacity from the npz metadata and
    re-jits instead of raising on leaf-shape mismatch (round-2 weak #5)."""
    import dataclasses

    import numpy as np

    from sphexample_tpu import run_simulation as run_sim
    from sphexample_tpu.core.step import make_interval_fn
    from sphexample_tpu.io.checkpoint import resume_simulation, save_checkpoint

    def build():
        rng = np.random.default_rng(3)
        const = SimulationConstants(dx=0.02, c0=40.0, cfl=0.3)
        kern = make_kernel(KernelFamily.WENDLAND_C2, 2, dx=const.dx)
        pos = rng.uniform(0, 0.25, size=(400, 2))
        meta = SimulationMetaData(
            simulation_name="ckrt", save_location=str(tmp_path), dims=2,
            simulation_time=0.03, output_times=0.01, max_per_cell=8,
            block_size=64, dtype="float64", use_pallas=True,
            # the cell-pair path: mpc is a LIVE budget there, so the
            # occupancy overflow fires the retune this test needs (on the
            # block path mpc has no consumer and is deliberately unchecked)
            block_sweep=False,
        )
        sim = assemble_simulation(
            pos, np.full(400, const.rho0), np.ones(400, np.int32),
            np.ones(400, np.int32), np.arange(1, 401),
            meta, const, kern, ViscosityModel.ARTIFICIAL,
            DensityDiffusionModel.ZERO,
        )
        sim.cfg = dataclasses.replace(sim.cfg, pallas_interpret=True)
        sim.interval_fn = make_interval_fn(sim.cfg)
        return sim

    sim = build()
    mpc0 = sim.cfg.mpc
    sim = run_sim(sim, max_intervals=2)
    assert sim.cfg.mpc > mpc0, "expected a retune to fire"

    ck = str(tmp_path / "ck.npz")
    save_checkpoint(ck, sim.state, 3, cfg=sim.cfg)

    # fresh assembly: original (smaller) windows and capacity
    sim2 = build()
    assert sim2.cfg.mpc < sim.cfg.mpc
    sim2, counter = resume_simulation(sim2, ck)
    assert counter == 3
    assert sim2.cfg.mpc >= sim.cfg.mpc
    assert sim2.cfg.cseg >= sim.cfg.cseg
    assert sim2.state.particles.capacity >= sim.state.particles.capacity
    t0 = float(sim2.state.total_time)
    np.testing.assert_allclose(t0, float(sim.state.total_time), rtol=0, atol=0)

    out = run_sim(sim2, max_intervals=1, start_counter=counter)
    assert float(out.state.total_time) > t0
    act = np.asarray(out.state.particles.active)
    assert np.isfinite(np.asarray(out.state.particles.density)[act]).all()


def test_device_watchdog_fires_and_disarms():
    """utils/watchdog.py: an armed period past the timeout fires (soft mode
    warns, keeps running); disarmed periods never fire."""
    import time as _time

    from sphexample_tpu.utils.watchdog import DeviceWatchdog

    wd = DeviceWatchdog(timeout=0.15, hard=False, poll=0.05)
    try:
        # disarmed: never fires
        _time.sleep(0.3)
        assert not wd.fired
        # armed + blocked past the timeout: fires
        wd.arm("test block")
        _time.sleep(0.4)
        assert wd.fired
        wd.disarm()
    finally:
        wd.stop()


def test_interval_with_watchdog_runs_green(tmp_path):
    """The watchdog wiring in make_interval_fn must not perturb a healthy
    run (generous timeout: never fires)."""
    import dataclasses

    from sphexample_tpu.core.step import make_interval_fn

    sim = _tiny_sim(str(tmp_path / "wd"))
    sim.cfg = dataclasses.replace(
        sim.cfg, meta=dataclasses.replace(sim.cfg.meta,
                                          device_call_timeout=300.0)
    )
    interval = make_interval_fn(sim.cfg)
    out = interval(sim.state, sim.meta.output_time_for(1))
    assert float(out.total_time) > 0
    act = np.asarray(out.particles.active)
    assert np.isfinite(np.asarray(out.particles.density)[act]).all()


def test_block_cap_limit_falls_back_to_cell_pair(tmp_path, monkeypatch):
    """Capacities beyond the block kernel's row-offset budget must select
    the cell-pair kernel (ct_cap == 0), not raise at the first sweep."""
    import sphexample_tpu.ops.pallas_block_sweep as pbs

    monkeypatch.setattr(pbs, "BLOCK_CAP_LIMIT", 128)  # force the fallback
    sim = _tiny_sim(str(tmp_path / "fb"))
    # _tiny_sim builds without pallas; rebuild with the pallas block path
    import dataclasses

    meta = dataclasses.replace(sim.meta, use_pallas=True, block_sweep=True)
    from sphexample_tpu import assemble_simulation

    p = sim.state.particles
    act = np.asarray(p.active)
    sim2 = assemble_simulation(
        np.asarray(p.position)[act], np.asarray(p.density)[act],
        np.asarray(p.ptype)[act], np.asarray(p.group_marker)[act],
        np.asarray(p.id)[act], meta, sim.cfg.spec.constants,
        sim.cfg.spec.kernel, sim.cfg.spec.viscosity, sim.cfg.spec.diffusion,
    )
    assert sim2.state.particles.capacity > 128  # the limit really binds
    assert sim2.cfg.ct_cap == 0  # block path disabled -> cell-pair kernel
    assert sim2.state.pallas_tables.prog_slot.shape[0] > 0


def test_overflow_check_ignores_dead_budgets():
    """On the block-sweep path with mDBC off nothing consumes mpc/cseg/maxc;
    an occupancy spike must not invalidate a physically-correct interval
    (each invalidation costs a recompile + replay).  Chunk-table overflow -
    the live budget - must still be detected."""
    import numpy as np

    from sphexample_tpu.core.driver import _overflow_reason

    rng = np.random.default_rng(5)
    const = SimulationConstants(dx=0.02, c0=40.0, cfl=0.3)
    kern = make_kernel(KernelFamily.WENDLAND_C2, 2, dx=const.dx)
    pos = rng.uniform(0, 0.3, size=(300, 2))
    meta = SimulationMetaData(
        simulation_name="deadbudget", save_location=".", dims=2,
        dtype="float64", use_pallas=True, block_sweep=True,
    )
    sim = assemble_simulation(
        pos, np.full(300, const.rho0), np.ones(300, np.int32),
        np.ones(300, np.int32), np.arange(1, 301),
        meta, const, kern, ViscosityModel.ARTIFICIAL,
        DensityDiffusionModel.ZERO,
    )
    assert sim.cfg.ct_cap > 0, "block path not engaged"
    big = jnp.asarray(10 ** 6, jnp.int32)
    spiked = sim.state.replace(
        max_occupancy=big, max_segment=big, occupied_cells=big
    )
    assert _overflow_reason(sim.cfg, spiked) is None
    chunked = spiked.replace(
        max_chunks=jnp.asarray(sim.cfg.ct_cap + 1, jnp.int32)
    )
    assert _overflow_reason(sim.cfg, chunked) is not None


def test_paraview_state_regex_matches_tricky_names(tmp_path):
    """The simulation name is interpolated into a regex inside the generated
    ParaView script: metacharacters ('run(3)', 'v1.2', 'dam+break') must be
    escaped or the state file loads no files (or crashes re.search)."""
    import re

    from sphexample_tpu.io.paraview import write_paraview_state

    for name, single in [("StillWedge", True), ("dam+break", True),
                         ("run(3)", False), ("v1.2", False)]:
        meta = SimulationMetaData(
            simulation_name=name, save_location=str(tmp_path),
            export_single_vtkhdf=single,
        )
        src = open(write_paraview_state(meta)).read()
        rx = eval(re.search(r"regex = (.+)", src).group(1))
        target = f"{name}.vtkhdf" if single else f"{name}_000001.vtk"
        assert re.search(rx, target), (name, rx)
        assert not re.search(rx, f"other_{name}x.notvtk"), (name, rx)

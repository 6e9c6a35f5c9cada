"""Shared CLI runner for the example cases (logger + VTKHDF output wiring)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def standard_argparser(default_save: str) -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser()
    ap.add_argument("--t-end", type=float, default=None)
    ap.add_argument("--save", default=default_save)
    ap.add_argument("--input", default="/root/reference/input")
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--pallas", action="store_true", help="fused Pallas sweep (TPU)")
    ap.add_argument("--max-intervals", type=int, default=None)
    ap.add_argument("--checkpoint-every", type=int, default=None,
                    help="write a resume checkpoint every N outputs")
    ap.add_argument("--resume", default=None, metavar="CHECKPOINT.npz",
                    help="resume from a checkpoint written by "
                         "--checkpoint-every; continues the existing "
                         "transient VTKHDF files in place")
    ap.add_argument("--kernel-output", action="store_true",
                    help="store per-particle kernel sums (StoreKernelOutput mode)")
    ap.add_argument("--output-variables", default=None, metavar="A,B,...",
                    help="comma-separated subset of the output variables "
                         "(default: all 13, reference parity; positions are "
                         "always written).  Long runs over the tunneled link "
                         "are IO-bound; e.g. Velocity,Density,Pressure,Type,"
                         "ID roughly halves the per-snapshot bytes")
    ap.add_argument("--watchdog", type=float, default=None, metavar="SECONDS",
                    help="warn when a single device chunk blocks longer than "
                         "this (stalled transport); combine with "
                         "--watchdog-hard to exit 86 for a supervised "
                         "restart from the last checkpoint")
    ap.add_argument("--watchdog-hard", action="store_true",
                    help="exit with code 86 when the watchdog fires")
    ap.add_argument("--profile", default=None, metavar="DIR",
                    help="capture a jax.profiler trace of one post-compile "
                         "output interval into DIR (TensorBoard/xprof "
                         "format) - the TPU analog of the reference's "
                         "@profview wrapper (example/StillWedgeMDBC.jl:62)")
    ap.add_argument("--shard", type=int, default=None, metavar="NDEV",
                    help="shard the particle axis over NDEV devices "
                         "(jax.sharding mesh over ICI; per-device fused "
                         "sweeps + distributed rebuild with a 1-hop halo "
                         "exchange, all-gather fallback for thin slabs)")
    return ap


def apply_backend_args(args):
    n = getattr(args, "shard", None)
    if args.cpu and n:
        # CPU smoke runs of the sharded path need virtual devices; the flag
        # is read at backend initialization, so setting it here (before the
        # first jax.devices()) still works even though jax is pre-imported
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                f"{flags} --xla_force_host_platform_device_count={n}".strip()
            )
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    if args.dtype == "float64":
        import jax

        jax.config.update("jax_enable_x64", True)


def run_case(args, geoms, meta, const, kern, viscosity, diffusion,
             particle_normals_path=None, arrays=None):
    """``arrays``: optional (position, density, ptype, group_marker, id)
    tuple from a procedural case generator (io/casegen.py), used instead of
    the ``geoms`` CSV list when the reference input CSVs are unavailable."""
    from sphexample_tpu import (assemble_simulation, build_simulation,
                                run_simulation)
    from sphexample_tpu.io.checkpoint import resume_simulation, save_checkpoint
    from sphexample_tpu.io.output import OutputManager
    from sphexample_tpu.io.paraview import write_paraview_state
    from sphexample_tpu.io.vtkhdf import clean_simulation_folder
    from sphexample_tpu.utils.logger import SimulationLogger

    ov = getattr(args, "output_variables", None)
    if ov:
        import dataclasses

        meta = dataclasses.replace(
            meta, output_variables=tuple(v.strip() for v in ov.split(","))
        )
    wd = getattr(args, "watchdog", None)
    if wd:
        import dataclasses

        meta = dataclasses.replace(
            meta, device_call_timeout=wd,
            watchdog_hard=bool(getattr(args, "watchdog_hard", False)),
        )

    resume_path = getattr(args, "resume", None)
    if not resume_path:
        clean_simulation_folder(meta.save_location)
    if arrays is not None:
        sim = assemble_simulation(*arrays, meta, const, kern, viscosity, diffusion)
    else:
        sim = build_simulation(
            geoms, meta, const, kern, viscosity, diffusion,
            particle_normals_path=particle_normals_path,
        )

    start_counter = 1
    if resume_path:
        sim, start_counter = resume_simulation(sim, resume_path)

    ndev = getattr(args, "shard", None)
    if ndev:
        import jax

        from sphexample_tpu.parallel.mesh import make_mesh, shard_simulation

        if len(jax.devices()) < ndev:
            raise SystemExit(
                f"--shard {ndev}: only {len(jax.devices())} devices visible "
                "(for a CPU smoke run set "
                "XLA_FLAGS=--xla_force_host_platform_device_count=N "
                "before any jax import, plus --cpu)"
            )
        sim = shard_simulation(sim, make_mesh(ndev))

    prof_dir = getattr(args, "profile", None)
    if prof_dir:
        # trace the SECOND interval: the first one compiles (minutes on the
        # tunneled chip), which would drown the trace in XLA compile events
        inner_fn = sim.interval_fn
        n_calls = [0]

        def traced_interval(state, t_out, progress=None):
            import jax

            n_calls[0] += 1
            if n_calls[0] == 2:
                with jax.profiler.trace(prof_dir):
                    return inner_fn(state, t_out, progress=progress)
            return inner_fn(state, t_out, progress=progress)

        sim.interval_fn = traced_interval

    # LogMode axis (reference SimulationMetaDataConfiguration.jl:12-33):
    # NONE disables the log file entirely - zero logger work, like the
    # reference's no-op dispatch on NoLog.
    from sphexample_tpu.config import LogMode

    log_on = meta.log is LogMode.STORE
    logger = (
        SimulationLogger(meta.save_location, append=bool(resume_path))
        if log_on
        else None
    )
    if log_on:
        logger.initialize(meta, const, kern, viscosity.value, diffusion.value,
                          geoms, sim.n_live)
        if resume_path:
            logger.logger.info(
                f"resuming from {resume_path} at output counter {start_counter} "
                f"(t = {float(sim.state.total_time):.5f} s)"
            )
    out = OutputManager(meta, kern, sim.cfg.grid, sim.n_live,
                        resume_counter=start_counter if resume_path else None)

    def save(counter, state):
        out.save(counter, state)
        if args.checkpoint_every and counter % args.checkpoint_every == 0:
            save_checkpoint(
                os.path.join(meta.save_location, "checkpoint.npz"), state,
                counter, cfg=sim.cfg,
            )

    timesteps = []

    def log(info):
        timesteps.append(info["dt"])
        if log_on:
            logger.log_step(info, meta.simulation_time)

    sim = run_simulation(
        sim,
        save_callback=save,
        log_callback=log,
        max_intervals=args.max_intervals,
        start_counter=start_counter,
    )
    out.close()
    if log_on:
        if sim.hourglass is not None:
            logger.logger.info(sim.hourglass.report())
        logger.log_final(sim.state, timesteps)
    if meta.visualize_in_paraview:
        # state file only; auto-launch deliberately not replicated
        # (reference OpenExternalPrograms.jl:65-186)
        write_paraview_state(meta)
    if log_on:
        logger.close()
        if meta.open_log_file:
            # AutoOpenLogFile analog (reference OpenExternalPrograms.jl:37-52):
            # print the path instead of launching an editor
            print(f"[sphexample_tpu] log file: {logger.path}")
    return sim

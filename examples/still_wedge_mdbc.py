"""2D hydrostatic still-wedge with mDBC boundaries.

Python analog of the reference driver script ``example/StillWedgeMDBC.jl``:
same constants (dx=0.02, c0=42.48576250492629, delta=0.1, CFL=0.5), same
input CSVs, ArtificialViscosity + LinearDensityDiffusion + SimpleMDBC.

Usage:
    python examples/still_wedge_mdbc.py [--t-end 4.0] [--save out/still_wedge]
                                        [--input /root/reference/input]
                                        [--dtype float32|float64] [--cpu]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t-end", type=float, default=4.0)
    ap.add_argument("--save", default="out/still_wedge")
    ap.add_argument("--input", default="/root/reference/input")
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--output-each", type=float, default=0.01)
    ap.add_argument("--max-intervals", type=int, default=None)
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    if args.dtype == "float64":
        import jax

        jax.config.update("jax_enable_x64", True)

    from sphexample_tpu import (
        DensityDiffusionModel,
        Geometry,
        KernelFamily,
        MDBCMode,
        ParticleType,
        SimulationConstants,
        SimulationMetaData,
        ViscosityModel,
        build_simulation,
        make_kernel,
        run_simulation,
    )
    from sphexample_tpu.io.output import OutputManager
    from sphexample_tpu.io.vtkhdf import clean_simulation_folder
    from sphexample_tpu.utils.logger import SimulationLogger

    # reference example/StillWedgeMDBC.jl:7
    const = SimulationConstants(dx=0.02, c0=42.48576250492629, delta_sph=0.1, cfl=0.5)
    geoms = [
        Geometry(
            csv_file=f"{args.input}/still_wedge/StillWedge_Dp{const.dx}_Bound.csv",
            group_marker=1,
            type=ParticleType.FIXED,
        ),
        Geometry(
            csv_file=f"{args.input}/still_wedge/StillWedge_Dp{const.dx}_Fluid.csv",
            group_marker=2,
            type=ParticleType.FLUID,
        ),
    ]
    meta = SimulationMetaData(
        simulation_name="StillWedge",
        save_location=args.save,
        dims=2,
        simulation_time=args.t_end,
        output_times=args.output_each,
        mdbc=MDBCMode.SIMPLE,
        export_single_vtkhdf=True,
        export_grid_cells=True,
        dtype=args.dtype,
    )
    kern = make_kernel(KernelFamily.WENDLAND_C2, 2, dx=const.dx)

    clean_simulation_folder(meta.save_location)
    sim = build_simulation(
        geoms, meta, const, kern,
        ViscosityModel.ARTIFICIAL, DensityDiffusionModel.LINEAR,
        particle_normals_path=f"{args.input}/still_wedge_mdbc/StillWedge_Dp{const.dx}_GhostNodes_Correct.csv",
    )

    logger = SimulationLogger(meta.save_location)
    logger.initialize(meta, const, kern, "ArtificialViscosity", "LinearDensityDiffusion",
                      geoms, sim.n_live)
    out = OutputManager(meta, kern, sim.cfg.grid, sim.n_live)

    run_simulation(
        sim,
        save_callback=out.save,
        log_callback=lambda info: logger.log_step(info, meta.simulation_time),
        max_intervals=args.max_intervals,
    )
    out.close()
    logger.log_final(sim.state)
    logger.close()


if __name__ == "__main__":
    main()

"""Post-process a dam-break transient VTKHDF file: wave-front position,
density bounds, NaN screen - the validation the reference does by eye in
ParaView (reference example/Dambreak3d.jl output inspection), done
programmatically via :func:`sphexample_tpu.io.vtkhdf.read_transient_polydata`.

Usage: python tools/analyze_dambreak.py out/db3_full/DamBreak3D.vtkhdf [--every N]

Front position is reported both raw and normalized Martin-Moyce style
(X = x_front / L, T = t * sqrt(2 g / L) with L the initial column width),
so it can be compared against the classic experimental data set.
"""

from __future__ import annotations

import argparse
import math
import sys

import numpy as np

sys.path.insert(0, ".")
from sphexample_tpu.io.vtkhdf import read_transient_polydata  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--every", type=int, default=1, help="report every Nth step")
    ap.add_argument("--L", type=float, default=0.4, help="initial column width [m]")
    ap.add_argument("--g", type=float, default=9.81)
    args = ap.parse_args()

    print(f"{'t [s]':>8} {'T=t√(2g/L)':>11} {'x_front':>9} {'X=x/L':>7} "
          f"{'rho_min':>9} {'rho_max':>9} {'|v|_max':>8} {'NaN':>5}")
    bad = 0
    k = 0

    def snapshots():
        # a read racing the writer's in-progress append can transiently fail
        # (non-SWMR); read snapshot-by-snapshot and skip any that raise
        # (only the one being appended can).
        import h5py
        with h5py.File(args.path, "r", locking=False) as f:
            nsteps = int(f["VTKHDF"]["Steps"].attrs["NSteps"])
        for step in range(nsteps):
            try:
                yield from read_transient_polydata(
                    args.path, variables=["Density", "Velocity", "Type"],
                    steps=[step])
            except OSError:
                print(f"(snapshot {step} still being written - skipped)",
                      file=sys.stderr)

    for t, pts, data in snapshots():
        if k % args.every:
            k += 1
            continue
        k += 1
        fluid = data["Type"] == 1
        rho = data["Density"][fluid]
        v = data["Velocity"][fluid]
        nan = int(np.isnan(rho).sum() + np.isnan(pts[fluid]).sum())
        bad += nan
        xf = float(pts[fluid, 0].max())
        vmax = float(np.sqrt((v * v).sum(axis=1)).max())
        print(f"{t:8.4f} {t * math.sqrt(2 * args.g / args.L):11.3f} {xf:9.4f} "
              f"{xf / args.L:7.3f} {rho.min():9.2f} {rho.max():9.2f} "
              f"{vmax:8.3f} {nan:5d}")
    print("OK" if bad == 0 else f"FAIL: {bad} NaNs", file=sys.stderr)
    return 0 if bad == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())

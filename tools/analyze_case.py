"""Generic transient-VTKHDF health check for the example decks: per-snapshot
density bounds (fluid), |v| max, NaN screen, and (optionally) prescribed
rigid-body kinematics tracking - the programmatic version of the by-eye
ParaView inspection the reference does for Duckling / MovingSquare
(reference example/DucklingMDBC.jl, example/MovingSquare2d.jl).

Usage:
  python tools/analyze_case.py out/duckling/CaseDuckling.vtkhdf \
      --band 980 1060
  python tools/analyze_case.py out/msq/MovingSquare2D.vtkhdf \
      --band 950 1150 --track-marker 3 --speed 2.8 --direction 0

Exits 1 on any NaN, density outside the band, or (with --track-marker) a
body-position error beyond --track-tol.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")
from sphexample_tpu.io.vtkhdf import read_transient_polydata  # noqa: E402


def snapshots(path, variables):
    import h5py

    with h5py.File(path, "r", locking=False) as f:
        nsteps = int(f["VTKHDF"]["Steps"].attrs["NSteps"])
    for step in range(nsteps):
        try:
            yield from read_transient_polydata(path, variables=variables,
                                               steps=[step])
        except OSError:
            print(f"(snapshot {step} still being written - skipped)",
                  file=sys.stderr)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--band", nargs=2, type=float, default=[950.0, 1150.0],
                    help="allowed fluid density range")
    ap.add_argument("--allow-outliers", type=int, default=0,
                    help="per snapshot, this many fluid particles may sit "
                         "outside --band (within --hard-band).  WCSPH with "
                         "dynamic boundary particles transiently compresses "
                         "ISOLATED particles 1-2 dx off a driven body's "
                         "faces/corners (measured on the MovingSquare deck: "
                         "2 of 33,020 fluid particles at +17% for ~2 "
                         "snapshots during flow separation, immediate "
                         "recovery); a max-statistic band over 33k "
                         "particles x 250 snapshots flags that physical "
                         "behavior, a quantile gate does not")
    ap.add_argument("--hard-band", nargs=2, type=float, default=None,
                    help="absolute density bounds no particle may ever "
                         "leave (default: --band widened by 2x its "
                         "half-width); only meaningful with --allow-outliers")
    ap.add_argument("--every", type=int, default=1)
    ap.add_argument("--track-marker", type=int, default=None,
                    help="GroupMarker of a prescribed-motion body to track")
    ap.add_argument("--speed", type=float, default=0.0)
    ap.add_argument("--direction", type=int, default=0,
                    help="axis of the prescribed translation")
    ap.add_argument("--duration", type=float, default=1e30,
                    help="motion stops after this time")
    ap.add_argument("--track-tol", type=float, default=1e-3)
    args = ap.parse_args()

    variables = ["Density", "Velocity", "Type"]
    if args.track_marker is not None:
        variables.append("GroupMarker")

    bad = 0
    x0 = t0 = None
    k = 0
    print(f"{'t [s]':>8} {'rho_min':>9} {'rho_max':>9} {'|v|_max':>8} "
          f"{'NaN':>5}" + ("  body_err" if args.track_marker else ""))
    for t, pts, data in snapshots(args.path, variables):
        if k % args.every:
            k += 1
            continue
        k += 1
        fluid = data["Type"] == 1
        rho = data["Density"][fluid]
        vmax = float(np.abs(data["Velocity"]).max()) if len(pts) else 0.0
        n_nan = int(np.isnan(pts).sum() + np.isnan(rho).sum())
        line = (f"{t:8.3f} {rho.min():9.2f} {rho.max():9.2f} {vmax:8.2f} "
                f"{n_nan:5d}")
        if n_nan:
            bad += 1
        out_band = int(((rho < args.band[0]) | (rho > args.band[1])).sum())
        if out_band > args.allow_outliers:
            bad += 1
            line += f"  DENSITY OUT OF BAND ({out_band} particles)"
        elif out_band:
            lo, hi = args.hard_band if args.hard_band is not None else (
                1.5 * args.band[0] - 0.5 * args.band[1],
                1.5 * args.band[1] - 0.5 * args.band[0],
            )
            if rho.min() < lo or rho.max() > hi:
                bad += 1
                line += "  DENSITY BEYOND HARD BAND"
            else:
                line += f"  ({out_band} outlier(s) within hard band)"
        if args.track_marker is not None:
            body = data["GroupMarker"] == args.track_marker
            x = float(pts[body, args.direction].mean())
            if x0 is None:
                x0, t0 = x, t
                err = 0.0
            else:
                adv = args.speed * (min(t, args.duration)
                                    - min(t0, args.duration))
                err = abs(x - (x0 + adv))
                if err > args.track_tol:
                    bad += 1
                    line += "  BODY OFF TRAJECTORY"
            line += f"  {err:9.2e}"
        print(line)
    print("OK" if bad == 0 else f"FAIL ({bad} bad snapshots)")
    return 0 if bad == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())

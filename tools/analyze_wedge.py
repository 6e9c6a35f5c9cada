"""Physics validation of a still-wedge run: hydrostatic pressure readback.

The still wedge (reference example/StillWedge*.jl) settles to hydrostatic
equilibrium: fluid pressure ~ rho0 g (z_surface - z).  This checks the last
snapshot of a VTKHDF output against that profile and screens density bounds
and NaNs - the same analysis the project's verify recipe uses, as a reusable
tool (counterpart of tools/analyze_dambreak.py).

Usage: python tools/analyze_wedge.py out/wedge/StillWedge.vtkhdf
Exit 1 when any check fails.
"""

from __future__ import annotations

import sys

import h5py
import numpy as np


def analyze(path: str, rho0: float = 1000.0, g: float = 9.81,
            max_rel_err: float = 0.05, max_mean_err: float = 0.03) -> bool:
    with h5py.File(path, "r") as f:
        r = f["VTKHDF"]
        n = r["NumberOfPoints"][-1]
        off = r["Steps"]["PointOffsets"][-1]
        pts = r["Points"][off:off + n]
        pres = r["PointData"]["Pressure"][off:off + n]
        typ = r["PointData"]["Type"][off:off + n]
        dens = r["PointData"]["Density"][off:off + n]
    fluid = typ == 1
    z = pts[fluid][:, 1] if pts.shape[1] == 3 else pts[fluid][:, -1]
    # 2D cases store the vertical axis in column 1 (x-z plane convention)
    ph = rho0 * g * (z.max() - z)
    deep = ph > 0.05 * ph.max()  # skip the noisy free surface
    err = np.abs(pres[fluid][deep] - ph[deep]) / ph.max()
    d = dens[fluid]
    ok_nan = np.isfinite(d).all() and np.isfinite(pres[fluid]).all()
    ok_dens = (d.min() > rho0 * 0.98) and (d.max() < rho0 * 1.05)
    ok_err = (err.mean() < max_mean_err) and (err.max() < max_rel_err)
    print(f"snapshots: last of file, fluid n={int(fluid.sum())}")
    print(f"density range: [{d.min():.2f}, {d.max():.2f}]  "
          f"({'OK' if ok_dens else 'FAIL'})")
    print(f"hydrostatic rel err: mean {err.mean():.4f}  max {err.max():.4f}  "
          f"({'OK' if ok_err else 'FAIL'})")
    print(f"finite: {'OK' if ok_nan else 'FAIL'}")
    return bool(ok_nan and ok_dens and ok_err)


if __name__ == "__main__":
    ok = analyze(sys.argv[1], *[float(a) for a in sys.argv[2:]])
    print("OK" if ok else "FAIL")
    sys.exit(0 if ok else 1)

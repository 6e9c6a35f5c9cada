"""Host-side CSV ingestion of DualSPHysics-style particle layouts.

Reference: ``src/PreProcess.jl`` - identical column conventions for numerical
parity: particle files carry ``Idp, Points:0..2, Rhop`` (2D takes Points:0 and
Points:2, i.e. the x-z plane, PreProcess.jl:30-34; Idp is shifted +1 to be
1-based, :28); ghost-node files carry ``Normal:0..2, Points:0..2`` with
ghost_point = point + normal (:217-243).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np
import pandas as pd

from ..config import Geometry


def load_particle_csv(path: str, dims: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Returns (points [n, dims], density [n], idp [n]).

    Uses the native C++ parser (io/native.py) when available, with a pandas
    fallback."""
    pt_cols = ["Points:0", "Points:1", "Points:2"] if dims == 3 else ["Points:0", "Points:2"]
    cols = pt_cols + ["Rhop", "Idp"]

    from .native import read_csv_columns

    arr = read_csv_columns(path, cols)
    if arr is not None:
        pts = arr[:, : len(pt_cols)]
        rho = arr[:, len(pt_cols)]
        idp = arr[:, len(pt_cols) + 1].astype(np.int64) + 1
        return pts, rho, idp

    df = pd.read_csv(path, skipinitialspace=True)
    df.columns = [c.strip().strip('"') for c in df.columns]
    pts = df[pt_cols].to_numpy(dtype=np.float64)
    rho = df["Rhop"].to_numpy(dtype=np.float64)
    idp = df["Idp"].to_numpy(dtype=np.int64) + 1
    return pts, rho, idp


def load_geometries(
    geometries: Sequence[Geometry], dims: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Concatenate all bodies (reference AllocateDataStructures,
    PreProcess.jl:45-73).  Returns (position, density, ptype, group_marker, idp).
    """
    pos_l, rho_l, typ_l, grp_l, idp_l = [], [], [], [], []
    for geom in geometries:
        pts, rho, idp = load_particle_csv(geom.csv_file, dims)
        pos_l.append(pts)
        rho_l.append(rho)
        typ_l.append(np.full(len(rho), int(geom.type), dtype=np.int32))
        grp_l.append(np.full(len(rho), geom.group_marker, dtype=np.int32))
        idp_l.append(idp)
    return (
        np.concatenate(pos_l),
        np.concatenate(rho_l),
        np.concatenate(typ_l),
        np.concatenate(grp_l),
        np.concatenate(idp_l),
    )


def load_boundary_normals(path: str, dims: int):
    """Returns (points, ghost_points, normals), each [n, dims]
    (reference LoadBoundaryNormals, PreProcess.jl:217-243)."""
    df = pd.read_csv(path, skipinitialspace=True)
    df.columns = [c.strip().strip('"') for c in df.columns]
    if dims == 3:
        nrm = df[["Normal:0", "Normal:1", "Normal:2"]].to_numpy(dtype=np.float64)
        pts = df[["Points:0", "Points:1", "Points:2"]].to_numpy(dtype=np.float64)
    else:
        nrm = df[["Normal:0", "Normal:2"]].to_numpy(dtype=np.float64)
        pts = df[["Points:0", "Points:2"]].to_numpy(dtype=np.float64)
    return pts, pts + nrm, nrm

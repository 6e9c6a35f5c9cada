"""Native C++ CSV parser vs the pandas fallback on real reference inputs."""

import time

import numpy as np
import pandas as pd
import pytest

from sphexample_tpu.io.native import get_lib, read_csv_columns

REF = "/root/reference/input/still_wedge/StillWedge_Dp0.02_Fluid.csv"
REF_SPACED = "/root/reference/input/moving_square_2d/MovingSquare_Dp0.04_Fluid.csv"


@pytest.mark.skipif(get_lib() is None, reason="native toolchain unavailable")
def test_native_matches_pandas():
    cols = ["Points:0", "Points:2", "Rhop", "Idp"]
    arr = read_csv_columns(REF, cols)
    assert arr is not None
    df = pd.read_csv(REF)
    expected = df[cols].to_numpy(dtype=np.float64)
    np.testing.assert_allclose(arr, expected, rtol=1e-14)


@pytest.mark.skipif(get_lib() is None, reason="native toolchain unavailable")
def test_native_handles_space_padded_headers():
    cols = ["Points:0", "Points:2", "Rhop", "Idp"]
    arr = read_csv_columns(REF_SPACED, cols)
    assert arr is not None
    df = pd.read_csv(REF_SPACED, skipinitialspace=True)
    df.columns = [c.strip().strip('"') for c in df.columns]
    expected = df[cols].to_numpy(dtype=np.float64)
    np.testing.assert_allclose(arr, expected, rtol=1e-14)


@pytest.mark.skipif(get_lib() is None, reason="native toolchain unavailable")
def test_native_missing_column_falls_back():
    assert read_csv_columns(REF, ["NotAColumn"]) is None


def test_loader_roundtrip():
    from sphexample_tpu.io.csv_io import load_particle_csv

    pts, rho, idp = load_particle_csv(REF, dims=2)
    assert pts.shape[1] == 2 and len(rho) == len(idp) == len(pts)
    assert rho.min() > 900 and idp.min() >= 1


@pytest.mark.skipif(get_lib() is None, reason="native toolchain unavailable")
def test_native_short_row_does_not_inherit_previous(tmp_path):
    # A malformed short row must yield zeros for its missing trailing
    # columns, not the previous row's values.
    p = tmp_path / "short.csv"
    p.write_text("A,B,C\n1,2,3\n4\n7,8,9\n")
    arr = read_csv_columns(str(p), ["A", "B", "C"])
    assert arr is not None
    np.testing.assert_allclose(
        arr, [[1, 2, 3], [4, 0, 0], [7, 8, 9]], rtol=0, atol=0
    )

"""Unit tests for ``tools/analyze_case.py`` — the physics gate every chip
deck artifact goes through (artifacts/r5_chipq*, PERFORMANCE.md).  A bug
here would silently invalidate the end-to-end evidence, so the gate logic
itself is pinned: pass/fail on density bands, the allow-outliers +
hard-band admission, NaN screening, and prescribed-body tracking."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_deck(path, *, speed=0.5, rho_spike=None, nan_at=None,
                n_fluid=50, n_body=8, nsteps=4, dt=0.1):
    """A tiny transient deck: still fluid block + a marker-3 body moving at
    ``speed`` along x.  ``rho_spike``: (step, count, value) sets ``count``
    fluid densities to ``value`` at one step.  ``nan_at``: step index that
    gets one NaN position."""
    from sphexample_tpu.io.vtkhdf import TransientPolyDataWriter

    w = TransientPolyDataWriter(path, {
        "Density": (np.float64, False),
        "Velocity": (np.float64, True),
        "Type": (np.uint8, False),
        "GroupMarker": (np.int32, False),
    })
    rng = np.random.default_rng(7)
    base = rng.uniform(0.0, 1.0, size=(n_fluid + n_body, 3))
    for k in range(nsteps):
        t = dt * k
        pts = base.copy()
        pts[n_fluid:, 0] += speed * t            # body advances along x
        rho = np.full(n_fluid + n_body, 1000.0)
        if rho_spike is not None and rho_spike[0] == k:
            rho[: rho_spike[1]] = rho_spike[2]
        if nan_at == k:
            pts[0, 0] = np.nan
        vel = np.zeros_like(pts)
        ptype = np.concatenate([np.full(n_fluid, 1, np.uint8),
                                np.full(n_body, 3, np.uint8)])
        gm = np.concatenate([np.full(n_fluid, 2, np.int32),
                             np.full(n_body, 3, np.int32)])
        w.append(t, pts, {"Density": rho, "Velocity": vel,
                          "Type": ptype, "GroupMarker": gm})
    w.close()
    return path


def _run(path, *extra):
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "analyze_case.py"),
         str(path), *extra],
        capture_output=True, text=True, cwd=REPO,
    )
    return r.returncode, r.stdout


@pytest.fixture(scope="module")
def clean_deck(tmp_path_factory):
    return _write_deck(
        str(tmp_path_factory.mktemp("ac") / "clean.vtkhdf"))


def test_clean_deck_passes(clean_deck):
    rc, out = _run(clean_deck, "--band", "950", "1050")
    assert rc == 0 and out.strip().endswith("OK")


def test_nan_fails(tmp_path):
    path = _write_deck(str(tmp_path / "nan.vtkhdf"), nan_at=2)
    rc, out = _run(path, "--band", "950", "1050")
    assert rc == 1 and "FAIL" in out


def test_band_violation_fails(tmp_path):
    path = _write_deck(str(tmp_path / "spike.vtkhdf"),
                       rho_spike=(1, 5, 1100.0))
    rc, out = _run(path, "--band", "950", "1050")
    assert rc == 1 and "DENSITY OUT OF BAND" in out


def test_outliers_within_hard_band_admitted(tmp_path):
    # 2 outliers at +6% sit outside the band but inside the default hard
    # band (band widened by 2x its half-width): admitted with a note
    path = _write_deck(str(tmp_path / "out2.vtkhdf"),
                       rho_spike=(1, 2, 1060.0))
    rc, out = _run(path, "--band", "950", "1050", "--allow-outliers", "2")
    assert rc == 0 and "outlier(s) within hard band" in out
    # ... but a third outlier exceeds the allowance
    path3 = _write_deck(str(tmp_path / "out3.vtkhdf"),
                        rho_spike=(1, 3, 1060.0))
    rc3, out3 = _run(path3, "--band", "950", "1050", "--allow-outliers", "2")
    assert rc3 == 1 and "DENSITY OUT OF BAND" in out3
    # ... and an outlier beyond the hard band fails regardless of allowance
    pathh = _write_deck(str(tmp_path / "hard.vtkhdf"),
                        rho_spike=(1, 1, 1300.0))
    rch, outh = _run(pathh, "--band", "950", "1050", "--allow-outliers", "2")
    assert rch == 1 and "BEYOND HARD BAND" in outh


def test_body_tracking(clean_deck, tmp_path):
    # the deck's marker-3 body moves at exactly 0.5 m/s along x
    rc, out = _run(clean_deck, "--band", "950", "1050",
                   "--track-marker", "3", "--speed", "0.5",
                   "--direction", "0", "--track-tol", "1e-6")
    assert rc == 0 and out.strip().endswith("OK")
    # a wrong prescribed speed puts the body off trajectory
    rc2, out2 = _run(clean_deck, "--band", "950", "1050",
                     "--track-marker", "3", "--speed", "0.7",
                     "--direction", "0", "--track-tol", "1e-3")
    assert rc2 == 1 and "BODY OFF TRAJECTORY" in out2

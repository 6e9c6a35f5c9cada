"""Unit tests for the physics model layer (kernels, EOS, dt)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sphexample_tpu.config import (
    KernelFamily,
    SimulationConstants,
    make_kernel,
)
from sphexample_tpu.models import equations as eq
from sphexample_tpu.models import kernels as K
from sphexample_tpu.ops.timestep import adaptive_dt


class TestKernels:
    def test_wendland_value_at_zero(self):
        kern = make_kernel(KernelFamily.WENDLAND_C2, 2, dx=0.02)
        assert np.isclose(float(K.W(kern, jnp.array(0.0))), kern.alpha_d)

    def test_wendland_compact_support(self):
        kern = make_kernel(KernelFamily.WENDLAND_C2, 2, dx=0.02)
        assert float(K.W(kern, jnp.array(2.0))) == pytest.approx(0.0, abs=1e-12)

    @pytest.mark.parametrize("dims", [2, 3])
    def test_wendland_normalization(self, dims):
        # integral of W over R^dims should be ~1
        kern = make_kernel(KernelFamily.WENDLAND_C2, dims, dx=0.5)
        ngrid = 160
        span = np.linspace(-kern.H, kern.H, ngrid)
        dxv = span[1] - span[0]
        grids = np.meshgrid(*([span] * dims), indexing="ij")
        r = np.sqrt(sum(g**2 for g in grids))
        q = np.clip(r * kern.h_inv, 0, 2)
        w = np.asarray(K.W(kern, jnp.asarray(q)))
        integral = w.sum() * dxv**dims
        assert integral == pytest.approx(1.0, rel=2e-3)

    @pytest.mark.parametrize("family", [KernelFamily.WENDLAND_C2, KernelFamily.CUBIC_SPLINE])
    def test_grad_matches_finite_difference(self, family):
        kern = make_kernel(family, 2, dx=0.02)
        rng = np.random.default_rng(0)
        for _ in range(20):
            x = rng.uniform(-kern.H * 0.9, kern.H * 0.9, size=2)
            r = np.linalg.norm(x)
            if r < 1e-3:
                continue
            q = min(r * kern.h_inv, 2.0)
            g = np.asarray(K.grad_W(kern, jnp.asarray(q), jnp.asarray(x)))
            epsv = 1e-7

            def wval(xv):
                qq = min(np.linalg.norm(xv) * kern.h_inv, 2.0)
                return float(K.W(kern, jnp.asarray(qq)))

            fd = np.array(
                [
                    (wval(x + epsv * np.eye(2)[k]) - wval(x - epsv * np.eye(2)[k])) / (2 * epsv)
                    for k in range(2)
                ]
            )
            # cubic spline has the eta^2 regularization in the denominator
            assert np.allclose(g, fd, rtol=2e-3, atol=1e-4)

    def test_cubic_tensile_correction(self):
        kern = make_kernel(KernelFamily.CUBIC_SPLINE, 2, dx=0.02)
        f = K.tensile_correction(
            kern, jnp.array(100.0), jnp.array(1000.0), jnp.array(50.0), jnp.array(990.0),
            jnp.array(0.5), 0.02,
        )
        w_q = float(K.W(kern, jnp.array(0.5)))
        w_dx = float(K.W(kern, jnp.array(0.02)))
        expected = 1.0 * ((100 / 1000**2) + (50 / 990**2)) * (w_q / w_dx) ** 4
        assert float(f) == pytest.approx(expected, rel=1e-12)

    def test_wendland_has_no_1d(self):
        with pytest.raises(ValueError):
            make_kernel(KernelFamily.WENDLAND_C2, 1, dx=0.02)


class TestEquations:
    def test_eos_reference_density_zero_pressure(self):
        c = SimulationConstants()
        assert float(eq.pressure(jnp.array(c.rho0), c)) == pytest.approx(0.0)

    def test_eos_gamma7_formula(self):
        c = SimulationConstants()
        rho = 1050.0
        expected = ((c.c0**2 * c.rho0) / 7) * ((rho / c.rho0) ** 7 - 1)
        assert float(eq.pressure(jnp.array(rho), c)) == pytest.approx(expected, rel=1e-12)

    def test_generic_eos_matches_gamma7(self):
        c = SimulationConstants()
        rho = jnp.array(1020.0)
        # generic pow vs the gamma=7 repeated-multiply fast path
        assert float(eq.equation_of_state(rho, c.c0, 7.0, c.rho0)) == pytest.approx(
            float(eq.equation_of_state_gamma7(rho, c.c0, c.rho0)), rel=1e-6
        )

    def test_density_epsi(self):
        dens = jnp.array([1000.0])
        drho = jnp.array([5.0])
        rho_half = jnp.array([1001.0])
        dt = 1e-4
        epsi = -(5.0 / 1001.0) * dt
        expected = 1000.0 * (2 - epsi) / (2 + epsi)
        out = eq.density_epsi(dens, drho, rho_half, dt)
        assert float(out[0]) == pytest.approx(expected, rel=1e-14)

    def test_limit_density_at_boundary(self):
        dens = jnp.array([995.0, 995.0, 1005.0])
        ml = jnp.array([0.0, 1.0, 0.0])
        out = eq.limit_density_at_boundary(dens, 1000.0, ml)
        assert np.allclose(np.asarray(out), [1000.0, 995.0, 1005.0])

    def test_inverse_hydrostatic_eos(self):
        c = SimulationConstants()
        P = 5000.0
        expected = c.rho0 * ((1 + P * c.Cb_inv) ** (1 / 7) - 1)
        assert float(eq.inverse_hydrostatic_eos(c.rho0, jnp.array(P), c.Cb_inv)) == pytest.approx(
            expected, rel=1e-6  # XLA pow vs numpy pow
        )

    def test_gravity_last_axis(self):
        t = jnp.zeros((4, 3))
        v = jnp.arange(4.0)
        out = eq.gravity_vector_last_axis(t, v)
        assert np.allclose(np.asarray(out)[:, 2], np.arange(4.0))
        assert np.allclose(np.asarray(out)[:, :2], 0)


class TestTimeStepping:
    def test_dt_positive_two_particles(self):
        # mirrors reference test/runtests.jl:6-16
        c = SimulationConstants()
        kern = make_kernel(KernelFamily.WENDLAND_C2, 2, dx=c.dx)
        pos = jnp.array([[0.0, 0.0], [1.0, 0.0]])
        vel = jnp.zeros((2, 2))
        acc = jnp.array([[0.0, 0.0], [0.0, -9.81]])
        dt = adaptive_dt(pos, vel, acc, c, kern)
        assert float(dt) > 0

    def test_dt_exact_value(self):
        c = SimulationConstants()
        kern = make_kernel(KernelFamily.WENDLAND_C2, 2, dx=c.dx)
        pos = jnp.array([[0.5, 0.25], [1.0, 0.0]])
        vel = jnp.array([[0.1, -0.2], [0.0, 0.3]])
        acc = jnp.array([[0.0, -9.81], [1.0, 2.0]])
        visc = max(
            abs(kern.h * (0.1 * 0.5 + -0.2 * 0.25) / (0.5**2 + 0.25**2 + kern.eta2)),
            abs(kern.h * (0.3 * 0.0) / (1.0 + kern.eta2)),
        )
        dt1 = min(np.sqrt(kern.h / 9.81), np.sqrt(kern.h / np.sqrt(5.0)))
        dt2 = kern.h / (c.c0 + visc)
        expected = c.cfl * min(dt1, dt2)
        dt = adaptive_dt(pos, vel, acc, c, kern)
        assert float(dt) == pytest.approx(expected, rel=1e-12)

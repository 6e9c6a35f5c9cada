"""Core WCSPH equations: Tait EOS, symplectic density corrector, boundary clamp.

Reference: ``src/SimulationEquations.jl``.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import SimulationConstants


def equation_of_state_gamma7(rho, c0, rho0):
    """Tait EOS with the gamma=7 fast path (reference SimulationEquations.jl:9-11).

    P = (c0^2 rho0 / 7) ((rho/rho0)^7 - 1).

    Note: like the reference, ``Pressure!`` always calls this gamma=7 form even
    though a generic-gamma EOS exists (SimulationEquations.jl:18-24, line 22) -
    the gamma constant is effectively dead at runtime.
    """
    r = rho / rho0
    r2 = r * r
    r4 = r2 * r2
    return ((c0 * c0 * rho0) / 7.0) * (r4 * r2 * r - 1.0)


def equation_of_state(rho, c0, gamma, rho0):
    """Generic-gamma Tait EOS (reference SimulationEquations.jl:14-16)."""
    return ((c0 * c0 * rho0) / gamma) * ((rho / rho0) ** gamma - 1.0)


def pressure(rho, constants: SimulationConstants):
    """Pressure from density (reference SimulationEquations.jl:18-24)."""
    return equation_of_state_gamma7(rho, constants.c0, constants.rho0)


def density_epsi(density, drhodt, rho_half, dt):
    """Symplectic density corrector (reference SimulationEquations.jl:28-33).

    epsilon = -(drhodt / rho_half) dt;  rho *= (2 - eps) / (2 + eps).

    Inactive padding slots carry rho == 0; guard the division so they stay
    finite (live particles never reach zero density in WCSPH).
    """
    ratio = jnp.where(rho_half != 0, drhodt / jnp.where(rho_half != 0, rho_half, 1.0), 0.0)
    eps = -ratio * dt
    return density * (2.0 - eps) / (2.0 + eps)


def limit_density_at_boundary(density, rho0, motion_limiter):
    """Clamp boundary-particle density to >= rho0
    (reference SimulationEquations.jl:36-42): applied only where the motion
    limiter is zero (Fixed / Moving particles)."""
    is_boundary = motion_limiter == 0
    return jnp.where(is_boundary & (density < rho0), jnp.full_like(density, rho0), density)


def gravity_vector_last_axis(template, value):
    """Gravity acts on the *last* spatial axis
    (reference SimulationEquations.jl:44-46): returns a vector like ``template``
    with ``value`` in the last component, zeros elsewhere.  ``value`` may carry
    leading batch axes."""
    out = jnp.zeros_like(template)
    return out.at[..., -1].set(value)


def inverse_hydrostatic_eos(rho0, P, Cb_inv):
    """rho = rho0 (((1 + P/Cb))^(1/7) - 1) (reference SimulationEquations.jl:63).

    The reference uses a bit-trick 7th root with 2 Newton iterations
    (Estimate7thRoot, SimulationEquations.jl:49-62) purely as a CPU speed hack;
    on TPU a plain power is a single VPU op and numerically tighter, so we use
    it directly (SURVEY.md section 2.7: "bit-trick not needed").
    """
    x = 1.0 + P * Cb_inv
    # x can be slightly negative for strong tension spikes; mirror the
    # copysign behavior of the reference's Estimate7thRoot (odd root).
    root = jnp.sign(x) * jnp.abs(x) ** (1.0 / 7.0)
    return rho0 * (root - 1.0)

"""Pairwise viscosity models: Zero, Artificial (Monaghan), Laminar, Laminar+SPS.

Gather formulation: each function returns the viscous acceleration contribution
to particle *i* only; the symmetric contribution to *j* is produced when the
pair is revisited from *j*'s perspective (every contribution here is invariant
under the role swap, verified analytically against the reference's
(Pi, -Pi) returns).

Reference: ``src/SPHViscosityModels.jl:51-126``.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import SimulationConstants, SPHKernelInstance, ViscosityModel


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def _artificial(kernel, constants, xij, vij, grad_w, d2, rho_i, rho_j):
    """Monaghan artificial viscosity (reference SPHViscosityModels.jl:56-74).

    Active only for approaching pairs (v.x < 0):
    mu_ij = h (v.x) / (d^2 + eta^2);  Pi_i = -m0 (-alpha c0 mu_ij)/rho_bar * gradW.
    """
    v_dot_x = _dot(vij, xij)
    rho_bar = 0.5 * (rho_i + rho_j)
    mu = kernel.h * v_dot_x / (d2 + kernel.eta2)
    pi_fac = -constants.m0 * (-constants.alpha * constants.c0 * mu) / rho_bar
    pi_fac = jnp.where(v_dot_x < 0, pi_fac, jnp.zeros_like(pi_fac))
    return pi_fac[..., None] * grad_w


def _laminar(kernel, constants, xij, vij, grad_w, d2, rho_i, rho_j):
    """Laminar viscosity (reference SPHViscosityModels.jl:77-87).

    term = 4 m0 nu0 (x . gradW) / ((rho_i + rho_j) + (d^2 + eta^2)).
    NB: the `+` between the density sum and the distance term is a DualSPHysics
    form quirk in the reference (SPHViscosityModels.jl:85) - replicated as-is.
    """
    term = (4.0 * constants.m0 * constants.nu0 * _dot(xij, grad_w)) / (
        (rho_i + rho_j) + (d2 + kernel.eta2)
    )
    return term[..., None] * vij


def _laminar_sps(kernel, constants, xij, vij, grad_w, d2, rho_i, rho_j):
    """Laminar + Smagorinsky sub-particle-scale stress
    (reference SPHViscosityModels.jl:90-126).

    Strain-rate tensors (role-swap invariant forms, see the (j-i) rewrite):
      S_i = (m0/rho_j) (v_j - v_i) gradW^T  with tau built from rho_i,
      S_j = (m0/rho_i) (v_j - v_i) gradW^T  with tau built from rho_j.
    dtau/dt_i = (m0/(rho_i rho_j)) (tau_i + tau_j) . gradW.
    """
    t1 = _laminar(kernel, constants, xij, vij, grad_w, d2, rho_i, rho_j)

    m0 = constants.m0
    dx = constants.dx
    cs2_dx2 = (constants.smagorinsky_constant * dx) ** 2
    blin_dx2 = constants.blin_constant * dx * dx

    dv = -vij  # v_j - v_i

    def tau(rho_scale, rho_self):
        # S = (m0/rho_scale) * outer(dv, grad_w), shape [..., D, D]
        S = (m0 / rho_scale)[..., None, None] * (dv[..., :, None] * grad_w[..., None, :])
        norm_S = jnp.sqrt(2.0 * jnp.sum(S * S, axis=(-2, -1)))
        nu_t = cs2_dx2 * norm_S
        trace_S = jnp.trace(S, axis1=-2, axis2=-1)
        eye = jnp.eye(xij.shape[-1], dtype=xij.dtype)
        dev = S - (trace_S / 3.0)[..., None, None] * eye
        return (
            2.0 * (nu_t * rho_self)[..., None, None] * dev
            - (2.0 / 3.0) * (rho_self * blin_dx2 * norm_S * norm_S)[..., None, None] * eye
        )

    tau_i = tau(rho_j, rho_i)
    tau_j = tau(rho_i, rho_j)
    dtau_i = (m0 / (rho_i * rho_j))[..., None] * jnp.einsum(
        "...ab,...b->...a", tau_i + tau_j, grad_w
    )
    return t1 + dtau_i


def compute_viscosity(
    model: ViscosityModel,
    kernel: SPHKernelInstance,
    constants: SimulationConstants,
    xij,
    vij,
    grad_w,
    d2,
    rho_i,
    rho_j,
):
    """Viscous acceleration contribution to particle i (gather form).

    ``model`` is trace-time static: disabled models emit no ops.
    """
    if model is ViscosityModel.ZERO:
        return jnp.zeros_like(xij)
    if model is ViscosityModel.ARTIFICIAL:
        return _artificial(kernel, constants, xij, vij, grad_w, d2, rho_i, rho_j)
    if model is ViscosityModel.LAMINAR:
        return _laminar(kernel, constants, xij, vij, grad_w, d2, rho_i, rho_j)
    if model is ViscosityModel.LAMINAR_SPS:
        return _laminar_sps(kernel, constants, xij, vij, grad_w, d2, rho_i, rho_j)
    raise ValueError(f"unknown viscosity model {model}")

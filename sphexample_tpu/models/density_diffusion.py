"""Density diffusion models (Fourtakas et al. 2019 family).

Gather formulation: returns the diffusion contribution D to particle *i*'s
drho/dt for the pair (i, j).

Role-order quirk: the reference visits each unordered pair once (with i the
lower cell-sorted index) and sets D_j = -D_i, where D_i carries an m0/rho_j
volume factor (e.g. SPHDensityDiffusionModels.jl:132-133).  Rewriting -D_i
from j's perspective shows the factor is m0/rho_(higher-sorted-index particle)
for *both* endpoints.  The gather path reproduces this bit-faithfully via the
``i_is_lower`` flag (self sorted index < neighbor sorted index).

Reference: ``src/SPHDensityDiffusionModels.jl:32-188``.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import DensityDiffusionModel, SimulationConstants, SPHKernelInstance
from .equations import inverse_hydrostatic_eos


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def compute_density_diffusion(
    model: DensityDiffusionModel,
    kernel: SPHKernelInstance,
    constants: SimulationConstants,
    xij,
    grad_w,
    d2,
    rho_i,
    rho_j,
    ml_i,
    ml_j,
    i_is_lower,
):
    """Diffusion contribution to particle i's drho/dt (gather form).

    ``i_is_lower``: boolean, True when self's sorted index is below the
    neighbor's - selects the reference's asymmetric m0/rho volume factor.
    """
    if model is DensityDiffusionModel.ZERO:
        return jnp.zeros_like(rho_i)

    c = constants
    inv_d2 = 1.0 / (d2 + kernel.eta2)
    rho_ji = rho_j - rho_i

    if model is DensityDiffusionModel.ZERO_GRAVITY_LINEAR:
        # psi = 2 (rho_j - rho_i)(-x_ij) / (d^2 + eta^2); no hydrostatic term,
        # no MotionLimiter gate (reference SPHDensityDiffusionModels.jl:56-87).
        psi = (2.0 * rho_ji * inv_d2)[..., None] * (-xij)
        ml_gate = jnp.ones_like(rho_i)
    else:
        # Hydrostatic pressure difference along the (last) gravity axis:
        # P_ij^H = rho0 (-g)(-x_ij[end]) (reference :121, :172).
        P_h = c.rho0 * (-c.g) * (-xij[..., -1])
        if model is DensityDiffusionModel.LINEAR:
            # Linearized inverse EOS: rho_ij^H = P^H rho0/(Cb gamma)
            # (reference SPHDensityDiffusionModels.jl:116-122).
            rho_h = P_h * ((1.0 / (c.Cb * c.gamma)) * c.rho0)
        elif model is DensityDiffusionModel.COMPLEX:
            # Full inverse hydrostatic EOS (reference :172-173).
            rho_h = inverse_hydrostatic_eos(c.rho0, P_h, c.Cb_inv)
        else:
            raise ValueError(f"unknown density diffusion model {model}")
        psi = (2.0 * (rho_ji - rho_h) * inv_d2)[..., None] * (-xij)
        # Gate to fluid-fluid pairs only (reference :130-132).
        ml_gate = ml_i * ml_j

    # Asymmetric volume factor (see module docstring).
    vol = jnp.where(i_is_lower, c.m0 / rho_j, c.m0 / rho_i)
    return c.delta_sph * kernel.h * c.c0 * vol * _dot(psi, grad_w) * ml_gate

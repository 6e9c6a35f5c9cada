"""Density diffusion models (Fourtakas et al. 2019 family).

Gather formulation: returns the diffusion contribution D to particle *i*'s
drho/dt for the pair (i, j).

Role-order quirk: the reference visits each unordered pair once and sets
D_j = -D_i, where D_i carries an m0/rho_j volume factor
(SPHDensityDiffusionModels.jl:132-133).  The (i, j) role assignment is
*cell-centric* (NeighborLoop!, SPHCellList.jl:186-210):

* intra-cell pairs: j is the particle with the *higher* sorted index;
* cross-cell pairs: j is the particle in the stencil-neighbor cell, and
  ConstructStencil (:37-43) keeps only offsets that sort *before* the center
  cell — so j is the *lower* sorted index.

The gather path reproduces this via the ``i_is_role_i`` flag (True when the
self particle takes the reference's i role for this pair).  Rewriting -D_i
from j's perspective: the psi·gradW scalar is role-swap antisymmetric for the
ZeroGravityLinear/Linear models, so only the volume factor depends on the
role (m0/rho_(j-role particle), i.e. m0/rho_self when self is the j role);
for Complex the hydrostatic term uses the non-odd inverse EOS, so it must
additionally be evaluated in the i-role orientation and sign-flipped.

Reference: ``src/SPHDensityDiffusionModels.jl:32-188``.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import DensityDiffusionModel, SimulationConstants, SPHKernelInstance
from .equations import inverse_hydrostatic_eos


def linear_hydrostatic_constant(c) -> float:
    """C_lin with rho_h = C_lin * (z_i - z_j) for the LINEAR model: the
    linearized inverse EOS applied to P^H = rho0 (-g)(-x_ij[end])
    (reference SPHDensityDiffusionModels.jl:116-122).  Shared by the XLA
    path here and the Pallas pack/pair-math re-expressions so the folded
    constant can never drift between them."""
    return c.rho0 * (-c.g) * (-1.0) * ((1.0 / (c.Cb * c.gamma)) * c.rho0)


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
    i_is_role_i,
):
    """Diffusion contribution to particle i's drho/dt (gather form).

    ``i_is_role_i``: boolean, True when the self particle takes the
    reference's i role for this pair (intra-cell: lower sorted index;
    cross-cell: the particle in the *later* cell) - selects the asymmetric
    m0/rho volume factor and, for Complex, the hydrostatic orientation.
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
            # Full inverse hydrostatic EOS (reference :172-173).  The inverse
            # EOS is not odd in P, so the j-role endpoint must evaluate it in
            # the i-role orientation (-P_h) and flip the sign.
            rho_h = jnp.where(
                i_is_role_i,
                inverse_hydrostatic_eos(c.rho0, P_h, c.Cb_inv),
                -inverse_hydrostatic_eos(c.rho0, -P_h, c.Cb_inv),
            )
        else:
            raise ValueError(f"unknown density diffusion model {model}")
        psi = (2.0 * (rho_ji - rho_h) * inv_d2)[..., None] * (-xij)
        # Gate to fluid-fluid pairs only (reference :130-132).
        ml_gate = ml_i * ml_j

    # Asymmetric volume factor (see module docstring): m0 / rho_(j-role).
    vol = jnp.where(i_is_role_i, c.m0 / rho_j, c.m0 / rho_i)
    return c.delta_sph * kernel.h * c.c0 * vol * _dot(psi, grad_w) * ml_gate

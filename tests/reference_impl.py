"""Independent brute-force transcription of the reference pair loop.

Plain numpy/f64, written directly from the Julia sources: the *cell-centric*
visit order of NeighborLoop! (SPHCellList.jl:168-217) driving
ComputeInteractions! (:268-317) and the model modules.

The visit structure matters because the pair math is not fully role-symmetric
(the density-diffusion volume factor is m0/rho_j with D_j = -D_i,
SPHDensityDiffusionModels.jl:132-133).  The reference visits each unordered
pair exactly once:

* intra-cell: ``for i = start:end, j = (i+1):end`` — the j role is the
  *higher* sorted index (:191-196);
* cross-cell: for each half-stencil offset, ``for i in center, j in
  neighbor`` (:199-210), where ConstructStencil (:37-43) keeps the *first*
  half of CartesianIndices(-1:1, ...) — offsets that sort strictly before
  the center cell in Julia's column-major CartesianIndex order.  The j role
  is therefore the particle in the *earlier* cell, i.e. the *lower* sorted
  index.

Cells are visited in Julia CartesianIndex order (lexicographic on the
reversed coordinate tuple); within a cell, particles are taken in the order
of the input arrays (the framework feeds cell-sorted arrays, matching the
reference's stable sort-by-cell).  Used as the ground truth for the
vectorized gather sweep; never imports framework code.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np


def half_stencil(dims):
    """First half of CartesianIndices(ntuple(_->-1:1, d)) in Julia
    column-major enumeration order (first axis fastest) — reference
    ConstructStencil, SPHCellList.jl:37-43."""
    if dims == 2:
        offs = [(i, j) for j in (-1, 0, 1) for i in (-1, 0, 1)]
    elif dims == 3:
        offs = [
            (i, j, k)
            for k in (-1, 0, 1)
            for j in (-1, 0, 1)
            for i in (-1, 0, 1)
        ]
    else:
        raise ValueError(dims)
    return offs[: len(offs) // 2]


def reference_pair_visit(cells, active):
    """Yield (i, j) index pairs with the reference's role assignment
    (NeighborLoop!, SPHCellList.jl:186-210)."""
    cellmap = defaultdict(list)
    for a in range(len(cells)):
        if active[a]:
            cellmap[tuple(int(c) for c in cells[a])].append(a)
    stencil = half_stencil(cells.shape[1])
    # Julia CartesianIndex isless: lexicographic on the reversed tuple.
    for cell in sorted(cellmap, key=lambda t: t[::-1]):
        idxs = cellmap[cell]
        for a in range(len(idxs)):
            for b in range(a + 1, len(idxs)):
                yield idxs[a], idxs[b]
        for off in stencil:
            ncell = tuple(c + o for c, o in zip(cell, off))
            nidxs = cellmap.get(ncell, ())
            for i in idxs:
                for j in nidxs:
                    yield i, j


def wendland_w(alpha_d, q):
    return alpha_d * (1 - q / 2) ** 4 * (2 * q + 1)


def wendland_grad_w(alpha_d, h, q, xij):
    factor = alpha_d * 5 * (q - 2) ** 3 / (8 * h * h)
    return factor * xij


def cubic_w(alpha_d, q):
    inner = (1 - 1.5 * q**2 + 0.75 * q**3) * (0 <= q <= 1)
    outer = 0.25 * (2 - q) ** 3 * (1 < q <= 2)
    return alpha_d * (inner + outer)


def cubic_grad_w(alpha_d, h, eta2, q, xij):
    if 0 <= q <= 1:
        dwdq = alpha_d * (-3 * q + 2.25 * q**2)
    elif 1 < q <= 2:
        dwdq = alpha_d * (-0.75) * (2 - q) ** 2
    else:
        dwdq = 0.0
    r = np.linalg.norm(xij)
    return dwdq * (1 / h) * xij / (r + eta2)


def brute_force_sweep(
    *,
    kernel_family,
    kern,
    const,
    viscosity,
    diffusion,
    shifting,
    kernel_output,
    cells,      # [N, D] stored cell coords (stale allowed)
    pos,
    dens,
    pres,
    vel,
    ml,
    active,
):
    """Returns dict with drhodt, acc, and optional kernel/shifting sums."""
    n, dims = pos.shape
    drho = np.zeros(n)
    acc = np.zeros((n, dims))
    wsum = np.zeros(n)
    gwsum = np.zeros((n, dims))
    gradc = np.zeros((n, dims))
    divr = np.zeros(n)

    h, h_inv, H2, eta2, aD = kern.h, kern.h_inv, kern.H2, kern.eta2, kern.alpha_d
    m0 = const.m0

    def W(q):
        return wendland_w(aD, q) if kernel_family == "wendland" else cubic_w(aD, q)

    def gW(q, xij):
        if kernel_family == "wendland":
            return wendland_grad_w(aD, h, q, xij)
        return cubic_grad_w(aD, h, eta2, q, xij)

    for i, j in reference_pair_visit(np.asarray(cells), active):
        xij = pos[i] - pos[j]
        d2 = float(xij @ xij)
        if d2 <= H2:
            d = np.sqrt(d2)
            q = min(max(d * h_inv, 0.0), 2.0)
            grad_w = gW(q, xij)
            rho_i, rho_j = dens[i], dens[j]
            vij = vel[i] - vel[j]

            sym = float(-vij @ grad_w)
            drho[i] += -rho_i * (m0 / rho_j) * sym
            drho[j] += -rho_j * (m0 / rho_i) * sym

            # density diffusion, D_j = -D_i with the m0/rho_j factor
            if diffusion != "zero":
                inv = 1.0 / (d2 + eta2)
                rho_ji = rho_j - rho_i
                if diffusion == "zero_gravity_linear":
                    psi = 2 * rho_ji * (-xij) * inv
                    mlcond = 1.0
                else:
                    Ph = const.rho0 * (-const.g) * (-xij[-1])
                    if diffusion == "linear":
                        rho_h = Ph * (1 / (const.Cb * const.gamma)) * const.rho0
                    else:  # complex
                        x = 1 + Ph * const.Cb_inv
                        rho_h = const.rho0 * (np.sign(x) * np.abs(x) ** (1 / 7) - 1)
                    psi = 2 * (rho_ji - rho_h) * (-xij) * inv
                    mlcond = ml[i] * ml[j]
                D_i = const.delta_sph * h * const.c0 * (m0 / rho_j) * float(psi @ grad_w) * mlcond
                drho[i] += D_i
                drho[j] += -D_i

            # momentum + tensile correction
            pfac = (pres[i] + pres[j]) / (rho_i * rho_j)
            if kernel_family == "wendland":
                f_ab = 0.0
            else:
                f_ab = kern.cubic_eps * (
                    (pres[i] / rho_i**2) + (pres[j] / rho_j**2)
                ) * (W(q) / W(const.dx)) ** 4
            dvdt = -m0 * (pfac + f_ab) * grad_w

            # viscosity
            if viscosity == "artificial":
                vx = float(vij @ xij)
                if vx < 0:
                    rho_bar = 0.5 * (rho_i + rho_j)
                    mu = h * vx / (d2 + eta2)
                    Pi = -m0 * (-const.alpha * const.c0 * mu) / rho_bar * grad_w
                    dvdt = dvdt + Pi
            elif viscosity in ("laminar", "laminar_sps"):
                term = (4 * m0 * const.nu0 * float(xij @ grad_w)) / (
                    (rho_i + rho_j) + (d2 + eta2)
                )
                visc_i = term * vij
                if viscosity == "laminar_sps":
                    eye = np.eye(dims)
                    cs2 = (const.smagorinsky_constant * const.dx) ** 2
                    bl = const.blin_constant * const.dx**2

                    def tau(S, rho):
                        nS = np.sqrt(2 * np.sum(S**2))
                        nut = cs2 * nS
                        tr = np.trace(S)
                        return 2 * nut * rho * (S - tr / 3 * eye) - (2 / 3) * rho * bl * nS**2 * eye

                    S_i = (m0 / rho_j) * np.outer(vel[j] - vel[i], grad_w)
                    S_j = (m0 / rho_i) * np.outer(vel[i] - vel[j], -grad_w)
                    dtau = (m0 / (rho_j * rho_i)) * (tau(S_i, rho_i) + tau(S_j, rho_j)) @ grad_w
                    visc_i = visc_i + dtau
                dvdt = dvdt + visc_i

            acc[i] += dvdt
            acc[j] -= dvdt

            if kernel_output:
                wv = W(q)
                wsum[i] += wv
                wsum[j] += wv
                gwsum[i] += grad_w
                gwsum[j] -= grad_w
            if shifting:
                mlcond = ml[i] * ml[j]
                gradc[i] += (m0 / rho_i) * grad_w
                gradc[j] += (m0 / rho_j) * -grad_w
                divr[i] += (m0 / rho_j) * float(-xij @ grad_w) * mlcond
                divr[j] += (m0 / rho_i) * float(xij @ -grad_w) * mlcond

    return dict(drhodt=drho, acc=acc, kernel_w=wsum, kernel_grad=gwsum, grad_c=gradc, div_r=divr)

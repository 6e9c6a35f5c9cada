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


# ---------------------------------------------------------------------------
# Full-step oracle: an independent numpy/f64 transcription of the reference's
# 12-stage symplectic predictor-corrector loop (SimulationLoop,
# SPHCellList.jl:727-805), built on ``brute_force_sweep`` above.  Never
# imports framework code.
# ---------------------------------------------------------------------------


def map_floor(x, inv_cutoff):
    """Round-toward-nearest-with-sign cell binning (reference map_floor,
    SPHCellList.jl:57-63): Int(sign(x)) * trunc(|x| * InverseCutOff + 0.5)."""
    return (np.sign(x) * np.trunc(np.abs(x) * inv_cutoff + 0.5)).astype(np.int64)


def eos_gamma7(rho, c0, rho0):
    """EquationOfStateGamma7 (SimulationEquations.jl:10-12)."""
    return ((c0 * c0 * rho0) / 7.0) * ((rho / rho0) ** 7 - 1.0)


def brute_force_mdbc(kern, const, cells, pos, dens, ptype, ghost, H_inv,
                     kernel_family="wendland"):
    """Full-stencil fluid-neighbor moment accumulation + det/Shepard branch
    (NeighborLoopMDBC!/ComputeInteractionsMDBC!/ApplyMDBCCorrection,
    SPHCellList.jl:219-266, 319-365, 598-622).  ``cells`` are the STORED
    (possibly stale) particle cells; the ghost cell is computed fresh from
    the ghost point, as the reference does."""
    n, dims = pos.shape
    dp = dims + 1
    out = dens.copy()
    gcells = map_floor(ghost, H_inv)
    for i in range(n):
        if not np.any(ghost[i] != 0):
            continue
        b = np.zeros(dp)
        A = np.zeros((dp, dp))
        for j in range(n):
            if ptype[j] != 1:  # fluid only
                continue
            if np.max(np.abs(cells[j] - gcells[i])) > 1:
                continue
            xij = ghost[i] - pos[j]
            d2 = float(xij @ xij)
            if d2 > kern.H2:
                continue
            q = min(np.sqrt(d2) * kern.h_inv, 2.0)
            if kernel_family == "wendland":
                w = wendland_w(kern.alpha_d, q)
                gw = wendland_grad_w(kern.alpha_d, kern.h, q, xij)
            else:
                w = cubic_w(kern.alpha_d, q)
                gw = cubic_grad_w(kern.alpha_d, kern.h, kern.eta2, q, xij)
            vj = const.m0 / dens[j]
            b += np.concatenate([[const.m0 * w], const.m0 * gw])
            fc = np.concatenate([[vj * w], vj * gw])
            e = np.concatenate([[1.0], -xij])
            A += np.outer(fc, e)
        if abs(np.linalg.det(A)) >= 1e-3:
            sol = np.linalg.solve(A, b)
            diff = pos[i] - ghost[i]
            v = sol[0] + float(sol[1:] @ diff)
            out[i] = const.rho0 if np.isnan(v) else v
        elif A[0, 0] > 0:
            v = b[0] / A[0, 0]
            out[i] = const.rho0 if np.isnan(v) else v
    return out


def _adaptive_dt(kern, const, pos, vel, acc):
    """Δt (TimeStepping.jl:25-47).  The viscous term uses ABSOLUTE positions
    (the reference quirk: dot(v, r)/(r·r + η²) with r the raw position)."""
    r2 = np.sum(pos * pos, axis=1)
    visc = np.max(np.abs(kern.h * np.sum(vel * pos, axis=1) / (r2 + kern.eta2)))
    amag = np.linalg.norm(acc, axis=1)
    with np.errstate(divide="ignore"):
        dt1 = np.min(np.where(amag > 0, np.sqrt(kern.h / np.where(amag > 0, amag, 1.0)), np.inf))
    dt2 = kern.h / (const.c0 + visc)
    return const.cfl * min(dt1, dt2)


def _progress_motion(motion, ptype, marker, pos, vel, total_time, dt2):
    """ProgressMotion (SPHCellList.jl:575-596): assign velocity of Moving
    particles inside their window, integrate position by dt/2."""
    if not motion:
        return
    for i in range(len(pos)):
        if ptype[i] != 3:  # Moving
            continue
        m = motion.get(int(marker[i]))
        if m is None:
            continue
        speed, start, duration, direction = m
        should = (start <= total_time) and (total_time <= start + duration)
        v = speed * np.asarray(direction) * float(should)
        vel[i] = v
        pos[i] = pos[i] + v * dt2


def reference_run(
    *,
    kernel_family,
    kern,
    const,
    viscosity,
    diffusion,
    shifting,
    kernel_output,
    mdbc,
    motion,        # {group_marker: (velocity, start_time, duration, dir tuple)}
    pos,
    dens,
    ptype,         # 1 fluid / 2 fixed / 3 moving
    group_marker,
    ids,
    ghost_points,  # [N, D]; zero rows = no ghost
    n_steps,
):
    """Run ``n_steps`` of the reference SimulationLoop (SPHCellList.jl:727-805)
    in f64 numpy and return the final state in INPUT (id) order.

    Transcribed stage by stage: dx accumulation (:744, update_delta_x!
    :706-724, 4*max||posₙ⁺-pos||, posₙ⁺ zero-initialised), adaptive dt
    (:748), lazy rebuild when dx >= h (:758-762, stable sort by
    CartesianIndex = reversed-tuple lexicographic), motion (:765), pressure
    BEFORE the mDBC correction (:771-772), first sweep (:774), half step
    (:778, HalfTimeStep :624-638), boundary clamp (:781), motion again
    (:787), pressure from rho_half (:789), second sweep on stale cells
    (:790), final clamp (:794), DensityEpsi (:796), FullTimeStep with
    optional planar shifting (:798, :640-677), bookkeeping (:800)."""
    n, dims = pos.shape
    pos = np.array(pos, dtype=np.float64)
    dens = np.array(dens, dtype=np.float64)
    ptype = np.array(ptype, dtype=np.int64)
    marker = np.array(group_marker, dtype=np.int64)
    ids = np.array(ids, dtype=np.int64)
    ghost = np.array(ghost_points, dtype=np.float64)
    vel = np.zeros_like(pos)
    acc = np.zeros_like(pos)
    cells = np.zeros((n, dims), dtype=np.int64)
    pos_half = np.zeros_like(pos)  # posₙ⁺ is zero-alloc'd in the reference

    # GravityFactor (Fluid -1, Moving +1, Fixed 0) and MotionLimiter
    # (Fluid 1 else 0), reference PreProcess.jl:79-98.
    gf = np.where(ptype == 1, -1.0, np.where(ptype == 3, 1.0, 0.0))
    ml = (ptype == 1).astype(np.float64)

    total_time = 0.0
    dx_acc = 1.0 + kern.h
    dts = []

    for _ in range(n_steps):
        # 00 - displacement accumulator
        dx_acc += 4.0 * np.max(np.linalg.norm(pos_half - pos, axis=1))

        # 01 - adaptive dt (uses last step's end-state acceleration)
        dt = _adaptive_dt(kern, const, pos, vel, acc)
        dt2 = 0.5 * dt

        # 02 - lazy rebuild: recompute cells, stable sort by CartesianIndex
        # order (lexicographic on the reversed coordinate tuple)
        if dx_acc >= kern.h:
            cells = map_floor(pos, kern.H_inv)
            order = np.lexsort(tuple(cells[:, d] for d in range(dims)))
            for a in (pos, dens, ptype, marker, ids, ghost, vel, acc, cells,
                      pos_half, gf, ml):
                a[:] = a[order]
            dx_acc = 0.0

        # -- motion (first half)
        _progress_motion(motion, ptype, marker, pos, vel, total_time, dt2)

        # 03 - pressure from current density (BEFORE mDBC mutates density)
        pres = eos_gamma7(dens, const.c0, const.rho0)

        # 04 - mDBC
        if mdbc:
            dens = brute_force_mdbc(
                kern, const, cells, pos, dens, ptype, ghost, kern.H_inv,
                kernel_family=kernel_family,
            )

        # 05 - first sweep (stale cells)
        active = np.ones(n, dtype=bool)
        out1 = brute_force_sweep(
            kernel_family=kernel_family, kern=kern, const=const,
            viscosity=viscosity, diffusion=diffusion, shifting=shifting,
            kernel_output=kernel_output, cells=cells, pos=pos, dens=dens,
            pres=pres, vel=vel, ml=ml, active=active,
        )

        # 06 - half step predictor (HalfTimeStep :624-638)
        acc = out1["acc"].copy()
        acc[:, -1] += const.g * gf
        pos_half = pos + vel * dt2 * ml[:, None]
        vel_half = vel + acc * dt2 * ml[:, None]
        rho_half = dens + out1["drhodt"] * dt2

        # 07 - clamp rho_half at boundaries
        rho_half = np.where((rho_half < const.rho0) & (ml == 0), const.rho0, rho_half)

        # -- motion (second half; TotalTime unchanged until stage 12)
        _progress_motion(motion, ptype, marker, pos, vel, total_time, dt2)

        # 03b - pressure from rho_half
        pres = eos_gamma7(rho_half, const.c0, const.rho0)

        # 08 - second sweep on half-step fields, same stale cells
        out2 = brute_force_sweep(
            kernel_family=kernel_family, kern=kern, const=const,
            viscosity=viscosity, diffusion=diffusion, shifting=shifting,
            kernel_output=kernel_output, cells=cells, pos=pos_half,
            dens=rho_half, pres=pres, vel=vel_half, ml=ml, active=active,
        )

        # 09 - clamp density at boundaries (before the corrector)
        dens = np.where((dens < const.rho0) & (ml == 0), const.rho0, dens)

        # 10 - symplectic density corrector (DensityEpsi :26-31)
        epsi = -(out2["drhodt"] / rho_half) * dt
        dens = dens * (2.0 - epsi) / (2.0 + epsi)

        # 11 - full step corrector (FullTimeStep :640-677)
        acc = out2["acc"].copy()
        acc[:, -1] += const.g * gf
        vel_old = vel.copy()
        vel = vel + acc * dt * ml[:, None]
        dpos = 0.5 * (vel + vel_old) * dt
        if shifting:
            a_fsc = out2["div_r"] / float(dims)  # A=2, A_FST=0, A_FSM=D
            vmag = np.linalg.norm(vel, axis=1)
            delta_x = (-a_fsc * 2.0 * kern.h * vmag * dt)[:, None] * out2["grad_c"]
            delta_x = np.where(a_fsc[:, None] < 0, 0.0, delta_x)
            dpos = dpos + delta_x
        pos = pos + dpos * ml[:, None]

        # 12 - bookkeeping
        total_time += dt
        dts.append(dt)

    back = np.argsort(ids, kind="stable")
    return dict(
        ids=ids[back], pos=pos[back], vel=vel[back], dens=dens[back],
        acc=acc[back], total_time=total_time, dts=np.asarray(dts),
    )

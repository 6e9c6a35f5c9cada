"""Fused Pallas mDBC moment kernel - ghost-node density extrapolation.

The XLA mdbc path (ops/mdbc.py) gathers per-ghost candidate windows exactly
like the old gather sweep - the pattern measured ~90x slower than the fused
cell kernel on TPU.  For ghost-heavy 3D cases (duckling at Dp0.005 carries
43k+ ghosts) that becomes the step bottleneck, so this module re-uses the
cell-window design of ``ops/pallas_sweep``:

  * ghosts are sorted by their ghost-point cell key (per call - ghost counts
    are thousands, so the argsort is trivial next to the sweep),
  * one grid program per occupied (ghost-cell, row-chunk) via the SAME
    ``make_program_tables`` machinery (ghost cell_start for the self rows,
    particle ``cell_start`` for the candidate windows),
  * per-pair moment terms on [R, 128] tiles: b = m0 [W, gradW] and
    A = [Vj W, Vj gradW] (x) [1, -x_jg]  (reference SPHCellList.jl:319-365),
  * outputs are the K = (D+1)(D+2) per-ghost moment scalars; the closed-form
    Cramer solves and the det/Shepard/NaN decision tree stay in
    ``ops/mdbc._det_solve`` (reference :598-622).

Candidates come from a 5-field pack (pos, rho, motion limiter) - the fluid
test ``ptype == FLUID`` is exactly ``ml == 1`` (state.py allocation rule).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .cell_list import Grid, cell_coords, clamp_coords, linearize, stencil_rows
from .pallas_sweep import (
    _grad_w_factor,
    _round_up,
    _w_value,
    make_program_tables,
    prog_rows,
)


def _make_mdbc_kernel(kern, c, grid: Grid, dims, nf_cand, cseg, S, n, Bpad, R, K):
    gshape = grid.shape
    gstrides = grid.strides
    ncells = grid.ncells
    rows_np = stencil_rows(dims)

    def kernel(
        occ_keys_ref,     # [maxgc] SMEM: occupied ghost-cell keys
        gcell_start_ref,  # [ncells+2] SMEM: ghost-array segment starts
        prog_slot_ref,    # [maxpg] SMEM
        prog_base_ref,    # [maxgc] SMEM
        cell_start_ref,   # [ncells+2] SMEM: PARTICLE segment starts (windows)
        packed_hbm,       # [F_pad, N] candidate fields (pos, rho, ml)
        ghostT_hbm,       # [Bpad, 128] ghost points row-major
        mom_out,          # [maxpg, K, R] moment block
        selfT_buf, cand_buf, acc_ref, sem,
    ):
        b = pl.program_id(0)
        slot = prog_slot_ref[b]
        key = occ_keys_ref[slot] >> 1  # bit 0 is the (sweep-only) pair flag
        is_live = key < ncells
        keyc = jnp.minimum(key, ncells - 1)
        chunk = b - prog_base_ref[slot]
        s0_cell = gcell_start_ref[keyc]
        cnt_cell = jnp.where(is_live, gcell_start_ref[keyc + 1] - s0_cell, 0)
        s0 = s0_cell + chunk * R
        cnt = jnp.clip(cnt_cell - chunk * R, 0, R)
        is_live = is_live & (cnt > 0)

        rel = []
        rem_k = keyc
        for d_i in range(dims):
            rel.append(rem_k % gshape[d_i])
            rem_k = rem_k // gshape[d_i]
        x_lo = jnp.clip(rel[0] - 1, 0, gshape[0] - 1)
        x_hi = jnp.clip(rel[0] + 1, 0, gshape[0] - 1)
        cwin = cseg + 128

        @pl.when(is_live)
        def _body():
            s08 = pl.multiple_of(
                jnp.maximum(jnp.minimum((s0 // 8) * 8, Bpad - (R + 8)), 0), 8
            )
            rem8 = s0 - s08
            cp_self = pltpu.make_async_copy(
                ghostT_hbm.at[pl.ds(s08, R + 8)], selfT_buf, sem.at[0]
            )
            cp_self.start()

            seg_rs, seg_re, seg_rs_al = [], [], []
            for s in range(S):
                deltas = rows_np[s]
                row_ok = True
                row_base = jnp.zeros_like(keyc)
                for d_i in range(1, dims):
                    rc = rel[d_i] + int(deltas[d_i - 1])
                    row_ok = row_ok & (rc >= 0) & (rc < gshape[d_i])
                    row_base = row_base + rc * gstrides[d_i]
                key_lo = jnp.where(row_ok, row_base + x_lo, 0)
                key_hi = jnp.where(row_ok, row_base + x_hi, -1)
                rs = jnp.where(row_ok, cell_start_ref[key_lo], 0)
                re = jnp.where(row_ok, cell_start_ref[key_hi + 1], 0)
                seg_rs.append(rs)
                seg_re.append(re)
                seg_rs_al.append(
                    pl.multiple_of(
                        jnp.maximum(jnp.minimum((rs // 128) * 128, n - cwin), 0),
                        128,
                    )
                )

            def seg_dma(s):
                return pltpu.make_async_copy(
                    packed_hbm.at[:, pl.ds(seg_rs_al[s], cwin)],
                    cand_buf.at[s], sem.at[1 + s],
                )

            for s in range(S):
                @pl.when(seg_re[s] > seg_rs[s])
                def _():
                    seg_dma(s).start()

            cp_self.wait()
            selfT = pltpu.roll(selfT_buf[...], shift=(R + 8) - rem8, axis=0)[0:R]
            gp = [selfT[:, d : d + 1] for d in range(dims)]     # [R, 1] each

            row_ids = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
            self_valid = row_ids < cnt

            acc_ref[...] = jnp.zeros_like(acc_ref)
            lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
            NLW = cwin // 128

            for s in range(S):
                @pl.when(seg_re[s] > seg_rs[s])
                def _segment():
                    seg_dma(s).wait()

                    def chunk_body(kc):
                        lo = kc * 128
                        idx_j = (seg_rs_al[s] + lo) + lane_ids
                        lane_valid = (idx_j >= seg_rs[s]) & (idx_j < seg_re[s])

                        pos_j = [
                            cand_buf[s][d : d + 1, lo : lo + 128]
                            for d in range(dims)
                        ]
                        rho_j = cand_buf[s][dims : dims + 1, lo : lo + 128]
                        ml_j = cand_buf[s][dims + 1 : dims + 2, lo : lo + 128]

                        xij = [gp[d] - pos_j[d] for d in range(dims)]
                        d2 = sum(x * x for x in xij)
                        within = (
                            self_valid & lane_valid & (d2 <= kern.H2)
                            & (ml_j > 0.5)          # fluid-only neighbors
                        )
                        d = jnp.sqrt(d2)
                        q = d * kern.h_inv
                        # fold the mask into BOTH kernel factors: every
                        # moment term is proportional to w or g
                        w = jnp.where(within, _w_value(kern, q), 0.0)
                        g = jnp.where(within, _grad_w_factor(kern, q, d), 0.0)
                        gw = [g * x for x in xij]

                        rho_j = jnp.where(rho_j > 0.0, rho_j, jnp.ones_like(rho_j))
                        vj = c.m0 / rho_j                       # [1, 128]

                        # b = sum m0 [W, gradW]      (reference :351)
                        terms = [c.m0 * w] + [c.m0 * gwr for gwr in gw]
                        # A = [Vj W, Vj gradW] (x) [1, -x]  (reference :353-359)
                        fc = [vj * w] + [vj * gwr for gwr in gw]
                        for a in range(dims + 1):
                            terms.append(fc[a])                 # e_0 = 1
                            for bb in range(dims):
                                terms.append(fc[a] * (-xij[bb]))
                        acc_ref[...] += jnp.stack(terms)

                    chunk_body(0)
                    for kc in range(1, NLW):
                        pl.when(seg_re[s] > seg_rs_al[s] + kc * 128)(
                            lambda kc=kc: chunk_body(kc)
                        )

            mom_out[...] = jnp.sum(acc_ref[...], axis=2)[None, :, :]

    return kernel


def pallas_mdbc_moments(
    spec,
    grid: Grid,
    mpc: int,
    cseg: int,
    gpoint,            # [B, D] compacted ghost points
    gvalid,            # [B] bool
    position,          # [N, D] particle sweep fields (cell-sorted)
    density,
    motion_limiter,
    cell_start,
    interpret: bool = False,
):
    """Return (bvec [B, D+1], Amat [B, D+1, D+1]) moment systems per ghost
    (zeros for invalid slots), in the CALLER's ghost order."""
    B, dims = gpoint.shape
    n = position.shape[0]
    ncells = grid.ncells
    S = 3 ** (dims - 1)
    R = prog_rows(mpc)
    K = (dims + 1) * (dims + 2)
    if n % 128 != 0 or n < cseg + 128:
        raise ValueError(
            f"particle capacity {n} must be a multiple of 128 and >= the DMA "
            f"window (cseg+128={cseg + 128}); pad the capacity"
        )
    if mpc % 8 != 0 or cseg % 128 != 0:
        raise ValueError("mpc must be a multiple of 8 and cseg of 128")

    f32 = jnp.float32
    # sort ghosts by ghost-point cell key (parking for invalid slots)
    gcoords = clamp_coords(cell_coords(gpoint, spec.kernel.H_inv), grid)
    gkeys = jnp.where(gvalid, linearize(gcoords, grid), ncells)
    perm = jnp.argsort(gkeys, stable=True)
    gkeys_s = jnp.take(gkeys, perm)
    gpoint_s = jnp.take(gpoint, perm, axis=0).astype(f32)
    gvalid_s = jnp.take(gvalid, perm)
    gcoords_s = jnp.take(gcoords, perm, axis=0)

    from .cell_list import segment_starts

    gcell_start = segment_starts(gkeys_s, ncells)

    # ghost self windows, row-major [Bpad, 128]
    Bpad = _round_up(B + R + 8, 128)
    ghostT = jnp.zeros((Bpad, 128), f32)
    ghostT = ghostT.at[:B, :dims].set(gpoint_s)

    # 5-field candidate pack (pos, rho, ml), padded to 8 rows
    nf_cand = dims + 2
    cols = [position[:, d].astype(f32) for d in range(dims)]
    cols += [density.astype(f32), motion_limiter.astype(f32)]
    cols += [jnp.zeros((n,), f32)] * (_round_up(nf_cand, 8) - nf_cand)
    packed = jnp.stack(cols, axis=0)

    maxgc = min(ncells, B)
    tables = make_program_tables(
        gcell_start, grid, maxgc, R, Bpad, gcoords_s, gvalid_s, mpc
    )
    maxpg = tables.prog_slot.shape[0]

    grid_size = maxpg if interpret else tables.nprog
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(grid_size,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=(pl.BlockSpec((1, K, R), lambda b, *_: (b, 0, 0)),),
        scratch_shapes=[
            pltpu.VMEM((R + 8, 128), f32),
            pltpu.VMEM((S, _round_up(nf_cand, 8), cseg + 128), f32),
            pltpu.VMEM((K, R, 128), f32),
            pltpu.SemaphoreType.DMA((1 + S,)),
        ],
    )
    kernel = _make_mdbc_kernel(
        spec.kernel, spec.constants, grid, dims, nf_cand, cseg, S, n, Bpad, R, K
    )
    (mom,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((maxpg, K, R), f32),),
        interpret=interpret,
    )(
        tables.occ_keys,
        gcell_start,
        tables.prog_slot,
        tables.prog_base,
        cell_start.astype(jnp.int32),
        packed,
        ghostT,
    )

    vals = mom[tables.prog_idx[:B], :, tables.row_idx[:B]]      # [B, K]
    vals = jnp.where(gvalid_s[:, None], vals, 0.0)

    dtype = position.dtype
    bvec_s = vals[:, : dims + 1].astype(dtype)
    Amat_s = vals[:, dims + 1 :].reshape(B, dims + 1, dims + 1).astype(dtype)

    # un-sort back to the caller's ghost order
    inv = jnp.zeros((B,), jnp.int32).at[perm].set(jnp.arange(B, dtype=jnp.int32))
    return jnp.take(bvec_s, inv, axis=0), jnp.take(Amat_s, inv, axis=0)

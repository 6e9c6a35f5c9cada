"""Block-structured Pallas pair sweep - generation-3 TPU hot path.

Replaces the cell-pair kernel (``pallas_sweep.py``) with a formulation whose
occupancy structure is dense by construction (the round-3 budget showed the
cell-pair kernel VPU-issue-bound at ~25% useful-lane fill, with the per-sweep
XLA gather-back and the grid launch floor each costing ~1 ms on top):

  * one grid program per **128 consecutive sorted rows** ("block") - selves
    live on the 128 LANES of the VPU tiles (self fields are one 128-aligned
    lane-slice of the lane-major pack: no row-major self DMA, no sublane
    roll, no per-program table lookups),
  * candidates live on SUBLANES: the stencil cover of a block is a set of
    contiguous sorted-row runs, pre-resolved at rebuild time into a **flat
    chunk table** (one entry per ``CH``-row, 8-aligned DMA window).  Chunks
    are streamed through a ring of VMEM buffers with a ``DEPTH``-deep DMA
    pipeline that crosses program boundaries, so DMA latency hides behind
    compute without per-program warm-up stalls,
  * validity needs **no segment bounds**: a chunk's rows are masked by the
    table's [vstart, vend) interval (dedup between overlapping 8-aligned
    windows + the inactive tail); the kernel-support cutoff itself is free
    (built into the gradient factor).  Any real particle
    inside the DMA cover but outside the stencil cells is >= one cell pitch
    (2h) from every self, so the kernel-support cutoff zeroes it exactly -
    cells one pitch apart cannot interact (reference stencil reasoning,
    ``src/SPHCellList.jl:37-43``),
  * outputs are written as one BlockSpec-mapped ``[K_pad, 128]`` lane-block
    per program into a ``[K_pad, capacity]`` array in **sorted particle
    order** - the per-particle gather-back (measured 1.23 ms/sweep) is gone;
    consumers slice rows,
  * the inner loop is a dynamic ``lax.fori_loop`` over table chunks - no
    static segment x chunk x half unrolling, so the Mosaic kernel body is
    compiled ONCE (the cell-pair kernel inlined the pair math 54x and cost
    4-9 minutes of compile time on the tunneled chip).

The physics is byte-identical in structure to ``ops/interactions.py`` /
``ops/pallas_sweep.py`` (each pair computed from both endpoints; the
cell-centric density-diffusion role quirk rides on the DMA'd sorted index
and the self rows' own-cell bounds - reference ``SPHCellList.jl:191-210``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import KernelOutputMode, ShiftingMode
from ..state import BlockTables
from .cell_list import Grid, linearize
from .interactions import PhysicsSpec, SweepOut
from .pallas_sweep import _pair_math

# Block geometry: selves per program (= VPU lane count; fixed by hardware).
BLOCK = 128
# Candidate chunk height in sublanes (8-aligned DMA windows of the row-major
# pack).  Measured on the headline case: 32 -> 17.4, 64 -> 14.0,
# 128 -> 12.6 ms/sweep (per-chunk fixed costs - decode, mask build, dense
# broadcasts, accumulate - amortize over more rows); the packed chunk word
# supports any CH <= 256 that is a multiple of 8.  Env-overridable for
# hardware A/B sweeps (tools/; tables and kernel read it consistently).
import os as _os

CH = int(_os.environ.get("SPH_BLOCK_CH", "128"))
# DMA ring: chunk g lands in buffer slot g % NBUF; the pipeline keeps DEPTH
# chunks in flight (issued at compute step g - DEPTH), crossing program
# boundaries so no per-program warm-up stall remains.
NBUF = 16
DEPTH = 12
# Stencil-cover run slots per row-range (3 ranges in 3D, 1 in 2D).  Blocks
# spanning <= NS (y,z)-rows get exact one-row runs; sparser blocks get
# coalesced multi-row runs (correct by the d2 argument, just wider).
NS = 10
# Chunk-loop unroll factor (ILP across chunk boundaries; A/B via
# tools/sweep_bench.py).  The dynamic fori_loop body is compiled once per
# unroll copy, so compile time stays flat.
UNROLL = 1
# Packed chunk-word field widths are CH-dependent: vstart and vend-1 are
# < CH, so they need S = ceil_log2(CH) bits each and off8/8 gets the
# remaining 32 - 2S (the sign bit is data; logical shifts in the kernel).
# At the default CH=128 that is 7+7+18 -> the capacity ceiling is 2^21 rows
# (2M particles single-chip / per extended slab); CH=256 packs 8+8+16 ->
# 2^19.  The driver falls back to the cell-pair kernel beyond it
# (assemble_simulation / _retune).
#
# The widths are derived from the CURRENT module CH at *call* time (the
# table builder, the kernel builder and the capacity checks all go through
# these helpers), so a test that monkeypatches ``pbs.CH`` gets a consistent
# encode/decode - the import-time constants below exist for external
# importers (driver/mesh sizing) and match the env-configured CH.


# A/B experiment: drop the 8-row DMA-window alignment entirely - windows
# start exactly at each run's first row (vstart == 0 by construction, so the
# packed word carries only vend-1 + the row offset, the validity interval
# becomes one-sided, and the ~3.5 rows/run head slack disappears).  Relies
# on Mosaic accepting non-8-aligned dynamic sublane offsets for HBM->VMEM
# copies; chip A/B decides whether the (possibly slower) unaligned DMA pays
# for the saved mask op + rows.
UNALIGNED = int(_os.environ.get("SPH_BLOCK_UNALIGNED", "0"))


def _enc_bits() -> int:
    return (CH - 1).bit_length()


def _cap_limit() -> int:
    if UNALIGNED:
        # word = vend-1 (S bits) | row offset (32 - S bits, unit rows)
        return 1 << (32 - _enc_bits())
    return 1 << (35 - 2 * _enc_bits())


S_BITS = _enc_bits()
BLOCK_CAP_LIMIT = _cap_limit()
# Lane groups per block: selves are split at the first (y,z)-row boundary
# and each group gets its own tight cover (a block straddling a row boundary
# otherwise unions the x-extents of both rows - measured 23% of blocks
# producing 49% of all chunks on the headline case).  Chunks carry the lane
# interval [l0, l1) of their group; other lanes are masked.
NG = 2
# Blocks per grid program: >1 amortizes the per-program grid-pipeline floor
# (scalar prologue, BlockSpec plumbing) over several 128-lane self blocks,
# processed sequentially inside one program with a shared DMA ring (the
# chunk stream stays globally ordered, so the cross-program pipeline is
# unchanged).  Env-overridable for hardware A/B sweeps; falls back to 1
# when the block count is not divisible.
BPB = int(_os.environ.get("SPH_BLOCK_BPB", "1"))
# SMEM chunk-table budget in words: the scalar-prefetch chunk_tab must fit
# the ~1 MB scoped-SMEM cap alongside prog_start/prog_mid (measured: a
# 1.56 MB table at 1.3M particles fails Mosaic allocation).  Bigger tables
# run as a PARTITIONED launch - the program range splits into
# ceil(ct_cap / TAB_BUDGET) static parts, each kernel call getting a
# TAB_BUDGET-word dynamic slice of the table with prog_start rebased to it
# (pure host/XLA-side restructuring; the kernel body is unchanged and the
# chunk stream inside each part keeps its global order, so per-chunk f32
# summation order is identical to an unpartitioned launch).  This lifts the
# block path's single-chip ceiling from ~800k particles (SMEM) to the
# 2^21-row chunk-word encoding limit.
TAB_BUDGET = int(_os.environ.get("SPH_BLOCK_TAB_BUDGET", str(192 * 1024)))


def n_tab_parts(ct_cap: int) -> int:
    """Number of kernel launches needed for a ct_cap-word chunk table."""
    return max(1, -(-ct_cap // TAB_BUDGET))


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def n_blocks(capacity: int) -> int:
    if capacity % BLOCK != 0:
        raise ValueError(f"capacity {capacity} must be a multiple of {BLOCK}")
    return capacity // BLOCK


def _num_runs(dims: int) -> int:
    return NG * (3 * NS if dims == 3 else NS)


def make_block_tables(cell_start, cells, active, grid: Grid,
                      capacity: int, ct_cap: int, *,
                      ext_off=None, ext_capacity: "int | None" = None,
                      idx0=None) -> BlockTables:
    """Flat chunk table for the block sweep - a pure function of the cell
    list, computed once per lazy rebuild.

    Sharded (per-device under ``shard_map``): ``capacity`` is the LOCAL slab
    row count (selves), ``cell_start`` stays GLOBAL, and the three extra
    kwargs rebase the candidate runs into the device's halo-extended window:
    ``ext_off`` (traced) is the global sorted row at extended index 0
    (= rank*C - halo), ``ext_capacity`` the extended row count C + 2*halo
    (the caller pads the row-major pack with CH extra zero rows so DMA
    windows never clamp - chunk boundaries then shift RIGIDLY vs the
    single-chip tables, since slab bases and halos are multiples of 128),
    and ``idx0`` (traced) offsets the packed sorted index to GLOBAL rows so
    the density-diffusion role quirk and the self-pair exclusion compare
    global positions.  Runs clipped at the window edges only ever drop rows
    beyond the per-particle stencil reach (telemetry-guarded ``max_halo``),
    which the kernel cutoff zeroes anyway.

    For every 128-row block of the sorted array, the selves are split into
    NG=2 lane groups at the first (y,z)-row boundary (group A = the lanes in
    the block's first combined row r = y + ny*z, group B = the rest); each
    group's stencil cover is (rows [ra-1, rb+1] + {0, +-ny} of ITS row span)
    x (x-cells [xmin-1, xmax+1] of ITS lanes).  Without the split, a block
    straddling a row boundary unions the x-extents of the row tail and the
    next row head - nearly the whole row.  Each of the <= 3 disjoint
    row-ranges per group is split into NS slots; each slot becomes one
    contiguous sorted-row run [s, e), chunked into ceil((e - floor8(s)) / CH)
    DMA windows.  Group B's chunks follow group A's within a block, so a
    chunk's lane group is just ``g >= prog_mid[b]`` (no per-chunk bit); the
    lane interval is [0, cut) for group A and [cut, 128) for B, with ``cut``
    packed into ``prog_start``'s high byte (per-chunk lane bounds measured
    over the 1 MB scoped-SMEM cap at 430k particles).  The packed chunk
    word is vstart | (vend-1)<<S_BITS | off8/8 << 2*S_BITS (logical shifts:
    the sign bit is data; field widths follow CH - see BLOCK_CAP_LIMIT).
    Chunk validity [vstart, vend) dedups the 8-aligned
    window overlap against neighboring runs and excludes the inactive tail;
    everything else inside a window is masked by the kernel-support cutoff
    (see module docstring).

    Entries beyond ``ct_cap`` are clamped away (the sweep then computes a
    truncated cover - physically wrong, which is why ``chunk_total`` rides
    the overflow telemetry and triggers a decisive retune + replay, exactly
    like the occupancy windows).
    """
    if ct_cap >= 2 ** 24:
        # prog_start packs chunk starts in its low 24 bits under the lane
        # cut byte: a bigger table would silently corrupt the decode
        raise ValueError(f"ct_cap {ct_cap} exceeds the 24-bit chunk-index "
                         "budget of the packed prog_start")
    ncells = grid.ncells
    nx = grid.shape[0]
    ny = grid.shape[1] if grid.dims == 3 else 1
    nrows = ncells // nx
    maxb = n_blocks(capacity)
    NR = _num_runs(grid.dims)
    ext = ext_off is not None
    n_ext = ext_capacity if ext else capacity

    keys = linearize(cells, grid)
    keys = jnp.where(active, keys, ncells)
    # self-row own-cell bounds (role quirk) + sorted index, as exact f32
    # (GLOBAL rows in the sharded case - exact in f32 up to 2^24 rows)
    kc = jnp.minimum(keys, ncells - 1)
    csr = jnp.where(active, cell_start[kc], 0).astype(jnp.float32)
    cer = jnp.where(active, cell_start[kc + 1], 0).astype(jnp.float32)
    idx = jnp.arange(capacity, dtype=jnp.int32)
    if idx0 is not None:
        idx = idx + idx0
    idx = idx.astype(jnp.float32)

    kb = keys.reshape(maxb, BLOCK)
    ab = active.reshape(maxb, BLOCK)
    any_act = jnp.any(ab, axis=1)
    big = jnp.int32(ncells)
    kmin = jnp.min(jnp.where(ab, kb, big), axis=1)      # sorted -> first key
    kmax = jnp.max(jnp.where(ab, kb, -1), axis=1)
    ra = kmin // nx
    rb = kmax // nx

    # Lane groups: A = active lanes in the block's FIRST (y,z)-row (a lane
    # prefix, since the arrays are key-sorted), B = the rest.  Each group
    # covers only its own row span and x-extent; inactive keys sit at
    # ncells, whose row (nrows) never equals a valid ra.
    rowb = kb // nx
    mA = ab & (rowb == ra[:, None])
    cut = jnp.sum(mA, axis=1).astype(jnp.int32)         # [maxb]
    mB = ab & (rowb > ra[:, None])

    def _extent(m, lo_row, hi_row):
        anyg = jnp.any(m, axis=1)
        xmin = jnp.min(jnp.where(m, kb % nx, nx), axis=1)
        xmax = jnp.max(jnp.where(m, kb % nx, -1), axis=1)
        return (anyg, lo_row, hi_row,
                jnp.clip(xmin - 1, 0, nx - 1), jnp.clip(xmax + 1, 0, nx - 1))

    kminB = jnp.min(jnp.where(mB, kb, big), axis=1)
    groups = [
        _extent(mA, ra, ra),
        _extent(mB, kminB // nx, rb),
    ]

    run_s, run_e = [], []
    j = jnp.arange(NS, dtype=jnp.int32)[None, :]        # [1, NS]
    for any_g, ra_g, rb_g, xlo, xhi in groups:
        # disjoint row-ranges covering {r + dy + ny*dz : r in [ra_g, rb_g]}
        if grid.dims == 3:
            ranges = [
                (ra_g - 1 - ny, jnp.minimum(rb_g + 1 - ny, ra_g - 2)),
                (ra_g - 1, rb_g + 1),
                (jnp.maximum(ra_g - 1 + ny, rb_g + 2), rb_g + 1 + ny),
            ]
        else:
            ranges = [(ra_g - 1, rb_g + 1)]
        for lo, hi in ranges:
            lo = jnp.clip(lo, 0, nrows - 1)[:, None]
            hi = jnp.clip(hi, -1, nrows - 1)[:, None]
            L = jnp.maximum(hi - lo + 1, 0)             # [maxb, 1]
            u = lo + (j * L) // NS
            v = lo + ((j + 1) * L) // NS - 1            # v < u -> empty slot
            live = (v >= u) & any_g[:, None]
            k_lo = jnp.clip(xlo[:, None] + nx * u, 0, ncells - 1)
            k_hi = jnp.clip(xhi[:, None] + nx * v, 0, ncells - 1)
            s_raw = cell_start[k_lo]
            e_raw = cell_start[k_hi + 1]
            if ext:
                # rebase global rows into the halo-extended window; edge
                # clips only drop rows beyond the guarded stencil reach
                s_raw = jnp.clip(s_raw - ext_off, 0, n_ext)
                e_raw = jnp.clip(e_raw - ext_off, 0, n_ext)
            s = jnp.where(live, s_raw, 0)
            e = jnp.where(live, e_raw, 0)
            run_s.append(s)
            run_e.append(e)
    s = jnp.concatenate(run_s, axis=1).reshape(-1)      # [maxb * NR]
    e = jnp.concatenate(run_e, axis=1).reshape(-1)

    s8 = s if UNALIGNED else (s // 8) * 8
    nch = jnp.where(e > s, -(-(e - s8) // CH), 0)       # [maxb * NR]
    gcum = jnp.cumsum(nch)
    total = gcum[-1].astype(jnp.int32)
    NRg = NR // NG  # runs per lane group (group A columns come first)
    nch_grp = nch.reshape(maxb, NG, NRg).sum(axis=2)    # [maxb, NG]
    nch_blk = nch_grp.sum(axis=1)
    prog_start = jnp.concatenate(
        [jnp.zeros((1,), nch_blk.dtype), jnp.cumsum(nch_blk)]
    )
    # group B's chunks follow group A's within a block: the kernel derives
    # the lane-group of chunk g from g >= prog_mid[b] (no per-chunk bit)
    prog_mid = jnp.minimum(prog_start[:-1] + nch_grp[:, 0], ct_cap)
    prog_mid = prog_mid.astype(jnp.int32)
    prog_start = jnp.minimum(prog_start, ct_cap).astype(jnp.int32)
    # pack the block's lane-group cut into the high byte (entries 0..maxb-1;
    # entry maxb stays the bare total, read as the kernel's chunk count).
    # Stored as cut-1: cut = 128 (a block entirely inside one (y,z) row -
    # the COMMON case in 3D) times 2^24 is exactly 2^31 and wraps int32
    # negative, which decodes into a negative chunk range and crashes the
    # chip.  Active blocks always have cut >= 1 (active lanes are a sorted
    # prefix, so the first row owns at least one lane); blocks with no
    # active lanes emit no chunks, so their decoded cut is never used.
    prog_start = prog_start + jnp.concatenate(
        [jnp.maximum(cut.astype(jnp.int32), 1) - 1, jnp.zeros((1,), jnp.int32)]
    ) * 16777216

    t = jnp.arange(ct_cap, dtype=gcum.dtype)
    rid = jnp.clip(
        jnp.searchsorted(gcum, t, side="right"), 0, s.shape[0] - 1
    )
    i = t - (gcum[rid] - nch[rid])
    off8 = s8[rid] + CH * i
    vstart = jnp.clip(s[rid] - off8, 0, CH)
    vend = jnp.clip(e[rid] - off8, 0, CH)
    # A run's last window may overhang the array tail (off8 + CH > capacity);
    # dynamic slices CLAMP the start, silently shifting the window against
    # its validity interval.  Clamp here instead and shift [vstart, vend)
    # by the same amount so covered rows stay exactly [max(s,off8), e) -
    # no loss, no double count against the previous chunk.  vend <= CH still
    # holds (e <= capacity and the clamped window ends at capacity).
    # Sharded: the caller pads the extended pack with CH zero rows, so the
    # limit is n_ext itself (off8 <= s <= n_ext: the clamp NEVER shifts -
    # keeping per-chunk summation order identical to the single-chip sweep).
    off_lim = n_ext if ext else capacity - CH
    off8c = jnp.maximum(jnp.minimum(off8, off_lim), 0)
    sh = off8 - off8c
    off8 = off8c
    vstart = jnp.clip(vstart + sh, 0, CH)
    vend = jnp.clip(vend + sh, 0, CH)
    dead = t >= jnp.minimum(total, ct_cap)
    # canonicalize empty chunks before encoding: the clip bound lets vstart
    # reach CH (= 2^S_BITS), which would bleed into the vend field - a
    # non-empty chunk always has vstart < vend <= CH, so only empties can
    # hit it, and (CH-1, 1) is an equally-empty in-range encoding
    empty = vend <= vstart
    vstart = jnp.where(empty, CH - 1, vstart)
    vend = jnp.where(empty, 1, vend)
    # packed chunk code (one SMEM word per chunk, built with bit ops so the
    # sign bit is just data): vstart (S_BITS) | (vend-1) << S_BITS |
    # off8/8 << 2*S_BITS (logical shifts in the kernel; see BLOCK_CAP_LIMIT
    # for the field economics).  Dead (padding) entries are 0 - they are
    # DMA'd during warm-up (offset 0, harmless) but never decoded for
    # compute.
    s_bits = _enc_bits()
    if UNALIGNED:
        # vstart == 0 by construction (s8 = s; the tail clamp never binds:
        # capacity padding >= CH single-chip, and the sharded pack pads CH
        # zero rows) - the word carries only vend-1 and the raw row offset
        code = jnp.bitwise_or(
            jnp.maximum(vend - 1, 0), jnp.left_shift(off8, s_bits)
        )
    else:
        code = jnp.bitwise_or(
            jnp.bitwise_or(
                vstart, jnp.left_shift(jnp.maximum(vend - 1, 0), s_bits)
            ),
            jnp.left_shift(off8 // 8, 2 * s_bits),
        )
    tab = jnp.where(dead, 0, code)

    # Partitioned-launch telemetry: with G = n_tab_parts(ct_cap) > 1 every
    # part must fit its chunks inside one TAB_BUDGET-word table slice.  The
    # overflow demand folds into chunk_total (the retune signal): growing
    # ct_cap decisively raises G, shrinking the per-part ranges, so the
    # existing grow-and-replay loop converges for skewed covers too.
    G = n_tab_parts(ct_cap)
    if G > 1:
        nb = -(-maxb // G)
        bounds = np.minimum(np.arange(G + 1, dtype=np.int64) * nb, maxb)
        cs_b = jax.lax.rem(prog_start[jnp.asarray(bounds)],
                           jnp.int32(16777216))
        part_need = jnp.max(cs_b[1:] - cs_b[:-1])
        # only inflate on a REAL per-part overflow (a part's chunks exceed
        # its TAB_BUDGET slice): part_need * G > TAB_BUDGET * G >= ct_cap
        # then trips the existing max_chunks retune, which grows ct_cap ->
        # more parts -> smaller ranges.  Without overflow, chunk_total stays
        # the exact raw chunk count (host mirrors compare it exactly).
        total = jnp.where(part_need > TAB_BUDGET,
                          jnp.maximum(total, (part_need * G).astype(jnp.int32)),
                          total)

    return BlockTables(
        prog_start=prog_start,
        prog_mid=prog_mid,
        chunk_tab=tab.astype(jnp.int32),
        csr=csr, cer=cer, idx=idx,
        chunk_total=total,
    )


def init_block_tables(capacity: int, ct_cap: int) -> BlockTables:
    """Zero tables with the shapes ``make_block_tables`` produces (the first
    step of every interval rebuilds, so these are never swept)."""
    maxb = n_blocks(capacity)
    z = functools.partial(jnp.zeros, dtype=jnp.int32)
    zf = functools.partial(jnp.zeros, dtype=jnp.float32)
    return BlockTables(
        prog_start=z((maxb + 1,)), prog_mid=z((maxb,)), chunk_tab=z((ct_cap,)),
        csr=zf((capacity,)), cer=zf((capacity,)),
        idx=zf((capacity,)), chunk_total=z(()),
    )


def _host_sorted_keys(position: np.ndarray, inv_cutoff: float, grid: Grid):
    """Sorted linear cell keys of the live rows + global cell_start (numpy)."""
    from .cell_list import host_cell_keys

    key = np.sort(host_cell_keys(position, inv_cutoff, grid))
    counts = np.bincount(key, minlength=grid.ncells)
    cs = np.concatenate([[0], np.cumsum(counts)])
    return key, cs


def _host_block_chunks(kb: np.ndarray, cs: np.ndarray, grid: Grid,
                       windows: "list | None" = None,
                       capacity: "int | None" = None) -> int:
    """Chunk count of ONE 128-row block (numpy mirror of the table builder);
    ``kb`` holds the block's live keys only (parking rows filtered out).
    With ``windows`` a list, also appends each chunk's exact (off8, vstart,
    vend) - including the builder's tail clamp+shift against ``capacity`` -
    so tests can verify the packed encoding word for word."""
    nx = grid.shape[0]
    ny = grid.shape[1] if grid.dims == 3 else 1
    ncells = grid.ncells
    nrows = ncells // nx
    rowb = kb // nx
    cut = int(np.searchsorted(rowb, rowb[0], side="right")) if len(kb) else 0
    total = 0
    for g in (kb[:cut], kb[cut:]):
        if len(g) == 0:
            continue
        xmn, xmx = (g % nx).min(), (g % nx).max()
        xlo, xhi = max(xmn - 1, 0), min(xmx + 1, nx - 1)
        ra, rb = g[0] // nx, g[-1] // nx
        if grid.dims == 3:
            rngs = [(ra - 1 - ny, min(rb + 1 - ny, ra - 2)),
                    (ra - 1, rb + 1),
                    (max(ra - 1 + ny, rb + 2), rb + 1 + ny)]
        else:
            rngs = [(ra - 1, rb + 1)]
        for lo, hi in rngs:
            lo, hi = max(lo, 0), min(hi, nrows - 1)
            L = hi - lo + 1
            if L <= 0:
                continue
            for jj in range(NS):
                u = lo + (jj * L) // NS
                v = lo + ((jj + 1) * L) // NS - 1
                if v < u:
                    continue
                s = int(cs[xlo + nx * u])
                e = int(cs[min(xhi + nx * v, ncells - 1) + 1])
                if e > s:
                    s8 = s if UNALIGNED else (s // 8) * 8
                    nch = -(-(e - s8) // CH)
                    total += nch
                    if windows is not None:
                        for i in range(nch):
                            off8 = s8 + CH * i
                            vs = min(max(s - off8, 0), CH)
                            ve = min(max(e - off8, 0), CH)
                            off8c = max(min(off8, capacity - CH), 0)
                            sh = off8 - off8c
                            vs = min(max(vs + sh, 0), CH)
                            ve = min(max(ve + sh, 0), CH)
                            windows.append((off8c, vs, ve))
    return total


def estimate_chunk_total(position: np.ndarray, inv_cutoff: float,
                         grid: Grid, capacity: int) -> int:
    """Host-side chunk-count estimate for sizing ``ct_cap`` (numpy mirror of
    ``make_block_tables``; padding rows beyond n land in empty blocks)."""
    key, cs = _host_sorted_keys(position, inv_cutoff, grid)
    n = len(key)
    total = 0
    for b0 in range(0, n, BLOCK):
        total += _host_block_chunks(key[b0:b0 + BLOCK], cs, grid)
    return int(total)


def estimate_chunk_totals_sharded(position: np.ndarray, inv_cutoff: float,
                                  grid: Grid, capacity: int,
                                  ndev: int) -> "list[int]":
    """Per-device chunk-count estimates for sizing the sharded ``ct_cap``:
    pad the sorted live keys to ``capacity`` with parking rows, slice the
    equal slabs (blocks never straddle slab boundaries: C % 128 == 0), and
    count each slab's cover.  Slight overestimate - the real builder also
    clips runs at the halo edges."""
    key, cs = _host_sorted_keys(position, inv_cutoff, grid)
    full = np.full(capacity, grid.ncells, dtype=key.dtype)
    full[: len(key)] = key
    C = capacity // ndev
    totals = []
    for d in range(ndev):
        slab = full[d * C : (d + 1) * C]
        t = 0
        for b0 in range(0, C, BLOCK):
            kb = slab[b0 : b0 + BLOCK]
            t += _host_block_chunks(kb[kb < grid.ncells], cs, grid)
        totals.append(int(t))
    return totals


def pack_block_fields(position, velocity, density, pressure, ml, tables,
                      spec: "PhysicsSpec | None" = None):
    """Row-major pack [N, 128]: phys fields + guarded reciprocal density +
    sorted index + own-cell bounds (rebuild-constant, from the tables).  The
    lane-major self view is its transposed 16-lane head.

    Pack-time precomputation moves per-pair work to one dense [N] op each:

    * density is stored GUARDED (padded slots carry 1.0, never 0) and its
      reciprocal is packed alongside, so the kernel does no divisions or
      zero-guards per chunk (`_pair_math(rcps=...)`);
    * the pressure slot carries p/rho (`_pair_math(p_is_pq=True)`): the
      momentum factor needs two fewer tile multiplies;
    * an extra ``rr = C_d (rho + C_lin z)`` field collapses the LINEAR-
      diffusion numerator (rho_ji - rho_h) to one subtract AND carries the
      diffusion constant C_d (``diffusion_rr_scale``), removing the
      per-chunk constant multiply (C_lin = 0 and C_d = 1 for the diffusion
      models that don't read rr)."""
    from ..config import DensityDiffusionModel
    from ..models.density_diffusion import linear_hydrostatic_constant
    from .pallas_sweep import diffusion_rr_scale

    rho_g = jnp.where(density > 0.0, density, jnp.ones_like(density))
    rcp = 1.0 / rho_g
    C_lin = 0.0
    C_d = 1.0
    if spec is not None and spec.diffusion is DensityDiffusionModel.LINEAR:
        C_lin = linear_hydrostatic_constant(spec.constants)
    if spec is not None:
        C_d = diffusion_rr_scale(spec)
    rr = C_d * (rho_g + C_lin * position[:, -1])
    # column order: the fields candidates consume (phys + rcp + idx + rr)
    # come FIRST, the self-only own-cell bounds (csr/cer) last - the sharded
    # halo exchange ships only the candidate-consumed prefix
    cols = [position, velocity, rho_g[:, None], (pressure * rcp)[:, None],
            ml[:, None], rcp[:, None], tables.idx[:, None], rr[:, None],
            tables.csr[:, None], tables.cer[:, None]]
    rowmajor = jnp.concatenate([c.astype(jnp.float32) for c in cols], axis=1)
    w = rowmajor.shape[1]
    packedT = jnp.pad(rowmajor, ((0, 0), (0, 128 - w)))
    packed = packedT[:, :16].T
    return packed, packedT


def _make_block_kernel(spec: PhysicsSpec, dims, maxb, bpb=1):
    s_bits = _enc_bits()  # captured at kernel-build time, tracks CH
    want_kernel = spec.kernel_output is KernelOutputMode.STORE
    want_shift = spec.shifting is ShiftingMode.PLANAR
    nfields = 2 * dims + 3
    RCP, IDX, RR = nfields, nfields + 1, nfields + 2
    CSR, CER = nfields + 3, nfields + 4

    keys = ["drho"] + [f"dvdt{r}" for r in range(dims)]
    if want_kernel:
        keys += ["w"] + [f"gw{r}" for r in range(dims)]
    if want_shift:
        keys += [f"gc{r}" for r in range(dims)] + ["dr"]
    n_keys = len(keys)
    k_pad = _round_up(n_keys, 8)

    def kernel(
        prog_start_ref,   # [maxb + 1] SMEM (prefetch): chunk start | cut<<24
        prog_mid_ref,     # [maxb] SMEM (prefetch): first group-B chunk
        chunk_tab_ref,    # [ct_cap] SMEM (prefetch): packed chunk codes
        self_blk,         # [16, bpb*128] VMEM (BlockSpec over lane-major pack)
        packedT_hbm,      # [N, 128] HBM (row-major candidates)
        out_blk,          # [k_pad, bpb*128] VMEM (BlockSpec over [k_pad, N])
        cand_buf,         # [NBUF, CH, 128] VMEM scratch (DMA ring)
        acc_ref,          # [bpb, n_keys, 8, 128] VMEM scratch
        sem,              # DMA semaphores (NBUF,)
    ):
        pid = pl.program_id(0)
        M24 = jnp.int32(16777216)
        total = jax.lax.rem(prog_start_ref[maxb], M24)

        def _slot(g):
            # NBUF is a power of two: a mask beats the scalar-unit rem
            return jnp.bitwise_and(g, jnp.int32(NBUF - 1))

        def copy_for(g, slot):
            # chunk code: vstart | vend-1 << S_BITS | off8/8 << 2*S_BITS
            # (the sign bit is data - decode with logical shifts); in the
            # UNALIGNED A/B the word is vend-1 | row-offset << S_BITS
            if UNALIGNED:
                off8 = jax.lax.shift_right_logical(
                    chunk_tab_ref[g], jnp.int32(s_bits)
                )
            else:
                off8 = pl.multiple_of(
                    jax.lax.shift_right_logical(
                        chunk_tab_ref[g], jnp.int32(2 * s_bits)
                    ) * 8, 8
                )
            return pltpu.make_async_copy(
                packedT_hbm.at[pl.ds(off8, CH)], cand_buf.at[slot],
                sem.at[slot],
            )

        def wait_for(slot):
            # waiting only needs the semaphore and the (static) copy size -
            # a descriptor with a fixed source offset avoids re-reading the
            # chunk word and redoing the address math on the wait path
            pltpu.make_async_copy(
                packedT_hbm.at[pl.ds(0, CH)], cand_buf.at[slot], sem.at[slot]
            ).wait()

        # pipeline warm-up: only the first program primes the ring; later
        # programs inherit in-flight chunks issued by their predecessors
        @pl.when(pid == 0)
        def _warmup():
            def wu(i, c):
                @pl.when(i < total)
                def _():
                    copy_for(i, _slot(i)).start()
                return c
            jax.lax.fori_loop(jnp.int32(0), jnp.int32(DEPTH), wu, 0,
                              unroll=True)

        acc_ref[...] = jnp.zeros_like(acc_ref)

        sub = jax.lax.broadcasted_iota(jnp.int32, (CH, BLOCK), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (CH, BLOCK), 1)

        # With bpb > 1 the program processes ``bpb`` consecutive 128-lane
        # self blocks sequentially (a static Python loop - the chunk stream
        # stays globally ordered, so the DMA ring pipeline is untouched);
        # the per-program grid floor amortizes over all of them.
        for hb in range(bpb):
            b = pid * bpb + hb if bpb > 1 else pid
            pv = prog_start_ref[b]
            g0 = jax.lax.rem(pv, M24)
            cut = pv // M24 + 1  # stored as cut-1 (int32 headroom, builder)
            g1 = jax.lax.rem(prog_start_ref[b + 1], M24)
            mid = prog_mid_ref[b]

            # Self quantities, hoisted out of the chunk loop as DENSE
            # [CH, 128] tiles: a [1, 128] row used in a mixed op would be
            # sublane-broadcast at every consumer; materializing once per
            # block amortizes it over every chunk (loop-invariant capture).
            L0 = hb * BLOCK

            def dense_self(f):
                return jnp.broadcast_to(
                    self_blk[f : f + 1, L0 : L0 + BLOCK], (CH, BLOCK)
                )

            self_f = [dense_self(f) for f in range(nfields)]
            rcp_i = dense_self(RCP)
            idx_i = dense_self(IDX)
            cs_i = dense_self(CSR)
            rr_i = dense_self(RR)

            # Lane-group masking by SENTINEL, not by per-chunk mask ops: the
            # chunk loop is split at prog_mid into a group-A and a group-B
            # loop, and each loop's self x-field carries the OTHER group's
            # lanes shifted far outside kernel support (q >> 2 -> the
            # gradient factor g is EXACTLY zero by its built-in clamp, and
            # the one non-g-proportional output, W, is masked by its
            # explicit d2 <= H2 cutoff - the same mechanism that already
            # zeroes in-window junk rows >= one cell pitch away).  This
            # deletes the per-chunk lane select AND the and-with-lane-mask
            # (2 full-tile ops), plus the scalar g >= mid compare and its
            # scalar->vector bridge.  The offset keeps every intermediate
            # finite in f32: q ~ 500 puts the Wendland t^4 term at ~1e11,
            # nowhere near overflow.
            off = 256.0 * spec.kernel.h
            offA = jnp.where(lane < cut, 0.0, off).astype(jnp.float32)
            offB = jnp.where(lane >= cut, 0.0, off).astype(jnp.float32)
            selfA = list(self_f)
            selfA[0] = self_f[0] + offA
            selfB = list(self_f)
            selfB[0] = self_f[0] + offB

            def body(g, c, self_g):
                slot = _slot(g)
                # keep DEPTH chunks in flight (slot g+DEPTH mod NBUF was
                # last used by chunk g+DEPTH-NBUF < g: fully consumed)
                ga = g + DEPTH
                @pl.when(ga < total)
                def _():
                    copy_for(ga, _slot(ga)).start()
                wait_for(slot)

                # decode vstart | vend-1 | off8/8 (S_BITS/S_BITS/rest);
                # UNALIGNED: vend-1 | off (vstart is 0 by construction)
                v = chunk_tab_ref[g]
                fmask = jnp.int32((1 << s_bits) - 1)
                if UNALIGNED:
                    vs = jnp.int32(0)
                    ve = jnp.bitwise_and(v, fmask) + 1
                else:
                    vs = jnp.bitwise_and(v, fmask)
                    ve = jnp.bitwise_and(
                        jax.lax.shift_right_logical(v, jnp.int32(s_bits)),
                        fmask) + 1
                buf = cand_buf[slot]                        # [CH, 128]

                # Candidate columns are [CH, 1]: on TPU that is 8 nearly-
                # empty vregs - the same vreg cost as a full tile - and
                # every mixed op would lane-broadcast it again.  Materialize
                # each field ONCE as a dense [CH, 128] tile; all pair math
                # then runs on dense vregs.
                def dense_cand(f):
                    return jnp.broadcast_to(buf[:, f : f + 1], (CH, BLOCK))

                cand_f = [dense_cand(f) for f in range(nfields)]
                rcp_j = dense_cand(RCP)
                idx_j = dense_cand(IDX)
                rr_j = dense_cand(RR)
                cs_j = dense_cand(CSR)
                # no lane-group mask: the loop split at prog_mid + the
                # sentinel x-shift on the other group's lanes already zero
                # every out-of-group contribution (see the selfA/B comment).
                # Live chunks always have 0 <= vs < ve <= CH (empty
                # encodings only occur past ``total`` and are never
                # decoded), so the two-sided interval folds into ONE
                # unsigned compare: (sub - vs) u< (ve - vs).
                within = (
                    jax.lax.convert_element_type(sub - vs, jnp.uint32)
                    < jax.lax.convert_element_type(ve - vs, jnp.uint32)
                )                                            # dense [CH, 128]
                if want_kernel:
                    # self-pair exclusion: only the kernel sum W survives at
                    # d2 == 0, so the index test is only needed in STORE mode
                    within = within & (idx_j != idx_i)
                # density-diffusion role quirk (cell-centric): intra-cell
                # pairs give the i role to the lower sorted index,
                # cross-cell pairs to the particle in the later cell.  One
                # fused compare replaces the old same-cell/idx-order chain:
                # cells order like their cell_start values (strictly
                # increasing over occupied cells), so
                #   role_i  <=>  (cs_i > cs_j) or (cs_i == cs_j and
                #                idx_i < idx_j)
                #           <=>  (cs_i - cs_j) * K + (idx_j - idx_i) > 0
                # with K > max|idx_j - idx_i| (2^25 > 2^24, the packed-index
                # budget).  All three intermediates are exact in f32 (both
                # cs and idx are < 2^24), and when cs differ the fma's
                # |(cs_i-cs_j) * K| >= 2^25 dominates the |idx| < 2^24 term
                # even after rounding, so the sign - all we read - is exact.
                i_is_role_i = (
                    (cs_i - cs_j) * jnp.float32(2.0 ** 25) + (idx_j - idx_i)
                    > 0.0
                )
                terms = _pair_math(spec, dims, self_g, cand_f, i_is_role_i,
                                   within, rcps=(rcp_i, rcp_j), p_is_pq=True,
                                   rr=(rr_i, rr_j), rr_scaled=True)
                for k, key in enumerate(keys):
                    t = terms[key]                          # [CH, 128]
                    h = CH
                    while h > 8 and h % 16 == 0:        # tree-reduce to [8,]
                        h //= 2
                        t = t[0:h] + t[h : 2 * h]
                    if h > 8:  # CH = 192: h = 24 -> sum three 8-row tiles
                        r8 = t[0:8]
                        for o in range(8, h, 8):
                            r8 = r8 + t[o : o + 8]
                        t = r8
                    acc_ref[hb, k] += t
                return c

            # group-A chunks are [g0, mid), group-B chunks [mid, g1) - two
            # loops with per-group sentinel selves replace the per-chunk
            # lane select
            def bodyA(g, c):
                return body(g, c, selfA)

            def bodyB(g, c):
                return body(g, c, selfB)

            if UNROLL > 1:
                # fori_loop(unroll=...) requires static bounds; with the
                # SMEM-read bounds the unroll must be manual: full groups of
                # UNROLL chunks, then a rolled remainder loop
                def unrolled(lo, hi, fn):
                    def fn_u(k, c):
                        base = lo + k * jnp.int32(UNROLL)
                        for u in range(UNROLL):
                            fn(base + u, c)
                        return c

                    nfull = (hi - lo) // UNROLL
                    jax.lax.fori_loop(jnp.int32(0), nfull, fn_u, 0)
                    jax.lax.fori_loop(lo + nfull * UNROLL, hi, fn, 0)

                unrolled(g0, mid, bodyA)
                unrolled(mid, g1, bodyB)
            else:
                jax.lax.fori_loop(g0, mid, bodyA, 0)
                jax.lax.fori_loop(mid, g1, bodyB, 0)

        halves = []
        for hb in range(bpb):
            rows = [jnp.sum(acc_ref[hb, k], axis=0, keepdims=True)
                    for k in range(n_keys)]
            if k_pad > n_keys:
                rows.append(jnp.zeros((k_pad - n_keys, BLOCK), jnp.float32))
            halves.append(jnp.concatenate(rows, axis=0))
        out_blk[...] = (halves[0] if bpb == 1
                        else jnp.concatenate(halves, axis=1))

    return kernel, n_keys, k_pad


@functools.partial(
    jax.jit, static_argnames=("spec", "grid", "ct_cap", "interpret")
)
def pallas_block_sweep(
    spec: PhysicsSpec,
    grid: Grid,
    ct_cap: int,
    particles,
    cell_start,
    position,
    density,
    pressure,
    velocity,
    tables: "BlockTables | None" = None,
    interpret: bool = False,
) -> SweepOut:
    """Full-device sweep via the block kernel (single-chip path).

    ``ct_cap``: flat chunk-table capacity (telemetry-guarded; the driver
    retunes when ``chunk_total`` outgrows it).  ``tables``: rebuild-time
    block tables (``make_block_tables``); ``None`` computes them inline
    (direct callers / tests).
    """
    dims = position.shape[1]
    cap = position.shape[0]
    if cap % BLOCK != 0:
        raise ValueError(f"capacity {cap} must be a multiple of {BLOCK}")
    if cap < CH + 8 or cap > min(_cap_limit(), 2 ** 24):
        # off8/8 must fit the packed code's offset field; beyond it
        # (~2M rows at CH=128) the driver uses the cell-pair kernel (or shard over
        # a mesh: parallel.shard_simulation).  The 2^24 bound is the f32
        # packed-index/cell-start exactness budget (the fused role compare
        # relies on it) - it only binds in UNALIGNED mode, whose offset
        # field is wider than 2^24 rows.
        raise ValueError(f"capacity {cap} out of the supported range "
                         f"[{CH + 8}, {min(_cap_limit(), 2 ** 24)}]")
    maxb = n_blocks(cap)

    if tables is None:
        tables = make_block_tables(cell_start, particles.cell,
                                   particles.active, grid, cap, ct_cap)
    if tables.chunk_tab.shape[0] != ct_cap or tables.csr.shape[0] != cap:
        raise ValueError(
            f"block tables sized for ct_cap={tables.chunk_tab.shape[0]}, "
            f"capacity={tables.csr.shape[0]}; expected {ct_cap}, {cap}"
        )

    packed, packedT = pack_block_fields(
        position, velocity, density, pressure, particles.motion_limiter,
        tables, spec=spec,
    )

    out = _invoke_block_kernel(spec, dims, maxb, tables, packed, packedT,
                               interpret)
    return _collect(out, spec, particles.active, position.dtype, dims)


def _invoke_block_kernel(spec, dims, maxb, tables, packed_self, packedT_hbm,
                         interpret):
    """Launch the block kernel: selves = ``maxb`` 128-lane slices of the
    lane-major pack, candidates DMA'd from the row-major pack (which may be
    longer than the selves - the sharded halo-extended window).  ``BPB``
    blocks share one grid program when the block count divides.

    Chunk tables beyond ``TAB_BUDGET`` words run as a partitioned launch
    (one kernel call per static program range, each with a rebased
    TAB_BUDGET-word slice of the table) - the SMEM scalar-prefetch cap
    otherwise rejects the table outright at ~800k+ particles."""
    ct_cap = tables.chunk_tab.shape[0]
    G = n_tab_parts(ct_cap)
    bpb = BPB if BPB > 1 and G == 1 and maxb % BPB == 0 else 1
    if bpb != BPB:
        # trace-time warning (fires once per compile): a silent fallback
        # would mislabel chip A/B measurements as the requested BPB
        import sys

        print(f"[sphexample_tpu] SPH_BLOCK_BPB={BPB} ignored: "
              f"{'partitioned launch' if G > 1 else f'{maxb} blocks not divisible'}"
              " - running bpb=1", file=sys.stderr)

    def launch(nb_g, ps_g, mid_g, tab_g, self_map):
        kernel, n_keys, k_pad = _make_block_kernel(spec, dims, nb_g, bpb)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(nb_g // bpb,),
            in_specs=[
                pl.BlockSpec((16, BLOCK * bpb), self_map),
                pl.BlockSpec(memory_space=pltpu.HBM),
            ],
            out_specs=(
                pl.BlockSpec((k_pad, BLOCK * bpb), lambda b, *_: (0, b)),
            ),
            scratch_shapes=[
                pltpu.VMEM((NBUF, CH, 128), jnp.float32),
                pltpu.VMEM((bpb, n_keys, 8, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((NBUF,)),
            ],
        )
        (out,) = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=(
                jax.ShapeDtypeStruct((k_pad, nb_g * BLOCK), jnp.float32),
            ),
            interpret=interpret,
        )(ps_g, mid_g, tab_g, packed_self, packedT_hbm)
        return out

    if G == 1:
        return launch(maxb, tables.prog_start, tables.prog_mid,
                      tables.chunk_tab, lambda b, *_: (0, b))

    outs = []
    for b0, nb_g, ps_g, mid_g, tab_g in partition_tables(tables, maxb, G):
        outs.append(
            launch(nb_g, ps_g, mid_g, tab_g,
                   lambda b, *_, _b0=b0: (0, _b0 + b))
        )
    return jnp.concatenate(outs, axis=1)


def partition_tables(tables: "BlockTables", maxb: int, G: int):
    """Split the chunk table into G static parts for the partitioned launch.

    Each part's table slice starts at its first chunk (prog_start rebased by
    subtracting it - safe on the packed words: the low-24 chunk field only
    shrinks, the cut byte is untouched).  The table is padded with TAB_BUDGET
    zero words so the trailing part's dynamic slice never clamps (a clamp
    would silently shift chunk indices against the slice).

    The rebased low-24 chunk fields are clamped to the slice length: a
    skewed cover can concentrate more than TAB_BUDGET chunks into one part
    even when ct_cap holds globally, and an unclamped index would read past
    the SMEM table slice on hardware (the unpartitioned path is safe because
    build time clamps prog_start to ct_cap = the table length).  Clamping
    truncates the part's trailing chunks - the same safe-truncate contract;
    the inflated ``chunk_total`` telemetry then drives the ct_cap retune.

    Yields ``(b0, nb_g, ps_g, mid_g, tab_g)`` per part.
    """
    M24 = jnp.int32(16777216)
    nb = -(-maxb // G)
    tab_padded = jnp.concatenate(
        [tables.chunk_tab, jnp.zeros((TAB_BUDGET,), jnp.int32)]
    )
    for g in range(G):
        b0 = g * nb
        b1 = min(b0 + nb, maxb)
        if b0 >= b1:
            break
        start = jax.lax.rem(tables.prog_start[b0], M24)
        ps_g = tables.prog_start[b0:b1 + 1] - start
        mid_g = tables.prog_mid[b0:b1] - start
        cut_g = (ps_g // M24) * M24
        ps_g = cut_g + jnp.minimum(ps_g - cut_g, TAB_BUDGET)
        mid_g = jnp.minimum(mid_g, TAB_BUDGET)
        tab_g = jax.lax.dynamic_slice(tab_padded, (start,), (TAB_BUDGET,))
        yield b0, b1 - b0, ps_g, mid_g, tab_g


def pallas_block_sweep_sharded(
    spec: PhysicsSpec,
    grid: Grid,
    ct_cap: int,
    halo: int,
    particles,               # LOCAL slab Particles (cell / ml / active)
    cell_start,              # [ncells+2] int32 GLOBAL sorted rows (replicated)
    position,                # [C, D] local sweep fields
    density,
    pressure,
    velocity,
    ctx,                     # sharded CommContext (inside shard_map)
    tables: "BlockTables | None" = None,
    interpret: bool = False,
) -> SweepOut:
    """Per-device block sweep under ``shard_map`` with a 1-hop halo exchange.

    The sharded analog of :func:`pallas_block_sweep` (same kernel body, same
    chunk economics): each device packs its local rows, ppermutes the
    first/last ``halo`` packed rows with its slab neighbors (2 x [halo, 128]
    transfers over ICI), and runs the block kernel with SELVES = its own C
    rows and CANDIDATES DMA'd from the halo-extended row-major pack.  The
    packed sorted index / own-cell bounds ride the exchange, so the
    density-diffusion role quirk compares GLOBAL positions.  Outputs stay in
    local sorted order ([k_pad, C] - no gather).  Per-device memory is
    O(C + halo), and chunk boundaries shift rigidly vs the single-chip
    tables (slab bases and halos are multiples of 128), keeping per-chunk
    f32 summation orders identical.

    Replaces the thread fan-out of the reference for the multi-chip case
    (``src/SPHCellList.jl:174-214``), like ``pallas_pair_sweep_sharded`` -
    but at the block kernel's measured ~2x lower sweep cost.
    """
    C = position.shape[0]
    H = halo
    if C % BLOCK != 0 or H % 128 != 0:
        raise ValueError(f"local capacity {C} and halo {H} must be multiples of 128")
    dims = position.shape[1]
    n_ext = C + 2 * H
    if n_ext < CH or n_ext > _cap_limit():
        # off8/8 must fit the packed chunk code's offset field
        raise ValueError(f"extended window {n_ext} out of the supported "
                         f"range [{CH}, {_cap_limit()}]")
    if ctx.num_devices * C > 2 ** 24:
        # the packed sorted index / own-cell bounds are exact f32 integers
        # only below 2^24 GLOBAL rows; beyond that the role quirk and the
        # self-pair exclusion would silently misclassify boundary pairs -
        # shard_simulation falls back to the cell-pair kernel instead
        raise ValueError(
            f"global row count {ctx.num_devices * C} exceeds the f32 "
            "sorted-index budget (2^24) of the block kernel"
        )
    maxb = n_blocks(C)
    base = ctx.rank() * C

    if tables is None:
        tables = make_block_tables(
            cell_start, particles.cell, particles.active, grid, C, ct_cap,
            ext_off=base - H, ext_capacity=n_ext, idx0=base,
        )
    if tables.chunk_tab.shape[0] != ct_cap or tables.csr.shape[0] != C:
        raise ValueError(
            f"block tables sized for ct_cap={tables.chunk_tab.shape[0]}, "
            f"capacity={tables.csr.shape[0]}; expected {ct_cap}, {C}"
        )

    packed, packedT = pack_block_fields(
        position, velocity, density, pressure, particles.motion_limiter,
        tables, spec=spec,
    )

    # 1-hop halo exchange of the packed rows: my left halo is the LEFT
    # neighbor's tail, my right halo the RIGHT neighbor's head.  Edge devices
    # receive zeros (lax.ppermute semantics), which is correct: validity
    # intervals are derived from the global cell_start and never reach past
    # the global array ends into a missing halo.  Only the columns that
    # candidate rows actually consume ride the ICI (phys + rcp + idx + rr +
    # csr - the kernel's fused role compare reads the candidate's own-cell
    # start; the self-only cer bound and the 128-lane pad re-materialize as
    # zeros locally).  CH extra zero rows make the builder's window clamp a
    # no-op (see make_block_tables).
    W = 2 * dims + 7  # nfields + rcp + idx + rr + csr
    ndev = ctx.num_devices
    fwd = [(i, i + 1) for i in range(ndev - 1)]
    bwd = [(i + 1, i) for i in range(ndev - 1)]
    left = jax.lax.ppermute(packedT[C - H:, :W], ctx.axis, fwd)
    right = jax.lax.ppermute(packedT[:H, :W], ctx.axis, bwd)
    packedT_ext = jnp.concatenate(
        [jnp.pad(left, ((0, 0), (0, 128 - W))), packedT,
         jnp.pad(right, ((0, CH), (0, 128 - W)))], axis=0
    )

    out = _invoke_block_kernel(spec, dims, maxb, tables, packed, packedT_ext,
                               interpret)
    return _collect(out, spec, particles.active, position.dtype, dims)


def _collect(out, spec, active, dtype, dims):
    """Slice the [k_pad, N] output rows into a SweepOut (sorted particle
    order - no gather).  Inactive rows carry garbage self lanes, so every
    value passes through the ``active`` mask."""
    want_kernel = spec.kernel_output is KernelOutputMode.STORE
    want_shift = spec.shifting is ShiftingMode.PLANAR

    vals = jnp.where(active[None, :], out, 0).astype(dtype)
    i = 0

    def take(n):
        nonlocal i
        v = vals[i : i + n]
        i += n
        return v

    drho = take(1)[0]
    acc = take(dims).T
    kw = kg = gc = dr = None
    if want_kernel:
        kw = take(1)[0]
        kg = take(dims).T
    if want_shift:
        gc = take(dims).T
        dr = take(1)[0]
    return SweepOut(
        drhodt=drho, acceleration=acc,
        kernel_w=kw, kernel_grad=kg, grad_c=gc, div_r=dr,
    )

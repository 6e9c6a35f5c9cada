"""Exact-cover cost model: lane-group granularity in the block sweep.

Today (NG=2): selves split at the FIRST row boundary; each group's cover =
(rows of its span +-1, +-ny) x (x-extent of its lanes +-1).  A 128-row block
usually sits inside ONE (y,z) row (~14 x-cells at dx=0.0085), so the group's
x-window is ~16 cells while each self only needs 3 -> most of the computed
rectangle is x-margin.  Finer lane groups (split every row boundary, then
split each row-run into <=GW-lane subgroups) tighten the x-extent at the cost
of more chunks (per-run ceil + 8-align slack) and more scalar chunk work.

Model: sweep = S_NS * chunks + C_LANE * chunks * CH * 128
with the measured S_NS=140ns, C_LANE=20ps (PERFORMANCE.md round-3 fit).
"""
import numpy as np
import sys
sys.path.insert(0, "/root/repo")
from sphexample_tpu.io.casegen import dam_break_3d
from sphexample_tpu.ops.cell_list import grid_from_positions

S_NS = 140e-9
C_LANE = 20e-12
BLOCK = 128

dx = 0.0085
pos, dens, ptype, grp, idp = dam_break_3d(dx)
import math
h = math.sqrt(3 * dx * dx)
H_inv = 1.0 / (2 * h)
grid = grid_from_positions(pos, H_inv, 6)
nx = grid.shape[0]
ny = grid.shape[1]
ncells = grid.ncells
nrows = ncells // nx

c = (np.sign(pos) * np.trunc(np.abs(pos) * H_inv + 0.5)).astype(np.int64)
c = np.clip(c, np.asarray(grid.cmin), np.asarray(grid.cmin) + np.asarray(grid.shape) - 1)
key = ((c - np.asarray(grid.cmin)) * np.asarray(grid.strides)).sum(axis=1)
key = np.sort(key)
counts = np.bincount(key, minlength=ncells)
cs = np.concatenate([[0], np.cumsum(counts)])
n = len(key)
print(f"n={n} grid={grid.shape} cells/row~{nx} occ_mean={n/ (counts>0).sum():.1f}")

def chunks_for_group(g, CH):
    """g: sorted keys of one lane group (all in one or more rows)."""
    if len(g) == 0:
        return 0, 0
    xmn, xmx = (g % nx).min(), (g % nx).max()
    xlo, xhi = max(xmn - 1, 0), min(xmx + 1, nx - 1)
    ra, rb = g[0] // nx, g[-1] // nx
    rngs = [(ra - 1 - ny, min(rb + 1 - ny, ra - 2)),
            (ra - 1, rb + 1),
            (max(ra - 1 + ny, rb + 2), rb + 1 + ny)]
    NS = 10
    total = 0
    rows_v = 0
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
            s = cs[xlo + nx * u]
            e = cs[min(xhi + nx * v, ncells - 1) + 1]
            if e > s:
                total += -(-(e - (s // 8) * 8) // CH)
                rows_v += e - s
    return total, rows_v

def eval_scheme(GW, CH, split_all_rows):
    """GW: max lanes per group.  split_all_rows: split at every row boundary
    (True) or only the first (False = today's NG=2 when GW=128)."""
    chunks = 0
    rows_v = 0
    ngroups = 0
    for b0 in range(0, n, BLOCK):
        kb = key[b0:b0 + BLOCK]
        rowb = kb // nx
        if split_all_rows:
            # maximal same-row runs
            bnd = np.flatnonzero(np.diff(rowb)) + 1
            runs = np.split(kb, bnd)
        else:
            cut = int(np.searchsorted(rowb, rowb[0], side="right"))
            runs = [kb[:cut], kb[cut:]]
        for r in runs:
            if len(r) == 0:
                continue
            k = -(-len(r) // GW)
            for i in range(k):
                g = r[(i * len(r)) // k : ((i + 1) * len(r)) // k]
                t, rv = chunks_for_group(g, CH)
                chunks += t
                rows_v += rv
                ngroups += 1 if len(g) else 0
    lanes = chunks * CH * 128
    cost = S_NS * chunks + C_LANE * lanes
    return chunks, lanes, rows_v, ngroups, cost

print(f"{'scheme':<28}{'chunks':>9}{'Mlanes':>9}{'Mrows_v':>9}{'groups':>8}{'pred_ms':>9}")
base = None
for (GW, CH, allrows, name) in [
    (128, 128, False, "today NG=2 CH=128"),
    (128, 64, False, "today NG=2 CH=64"),
    (128, 128, True, "all-row split CH=128"),
    (64, 128, True, "GW=64 CH=128"),
    (64, 64, True, "GW=64 CH=64"),
    (32, 128, True, "GW=32 CH=128"),
    (32, 64, True, "GW=32 CH=64"),
    (32, 32, True, "GW=32 CH=32"),
    (16, 64, True, "GW=16 CH=64"),
    (16, 32, True, "GW=16 CH=32"),
]:
    ch, la, rv, ngr, cost = eval_scheme(GW, CH, allrows)
    print(f"{name:<28}{ch:>9}{la/1e6:>9.0f}{rv/1e6:>9.2f}{ngr:>8}{cost*1e3:>9.2f}")

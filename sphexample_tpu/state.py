"""Particle state: a flat SoA pytree of device arrays.

TPU-native replacement for the reference's 17-field ``StructArray`` SoA
(reference ``src/PreProcess.jl:114``).  Arrays are padded to a static capacity
(``active`` marks live slots) and kept *cell-sorted* between lazy rebuilds so
that all neighbor candidates are contiguous row-segments of the arrays.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .config import ParticleType


@struct.dataclass
class Particles:
    """Cell-sorted particle SoA.

    Field names mirror the reference StructArray (PreProcess.jl:114); extra
    TPU-native fields are ``active`` (padding mask) and ``cell`` holding the
    per-dimension integer cell coordinates assigned at the last rebuild
    (the reference's ``Cells::CartesianIndex`` field).
    """

    cell: jax.Array            # [N, D] int32 cell coords from last rebuild
    chunk_id: jax.Array        # [N] int32 - owning compute block (ParaView parity)
    kernel_w: jax.Array        # [N] kernel sums (only filled in STORE mode)
    kernel_grad: jax.Array     # [N, D]
    position: jax.Array        # [N, D]
    acceleration: jax.Array    # [N, D]
    velocity: jax.Array        # [N, D]
    density: jax.Array         # [N]
    pressure: jax.Array        # [N]
    gravity_factor: jax.Array  # [N] float: Fluid -1, Moving +1, Fixed 0
    motion_limiter: jax.Array  # [N] float: Fluid 1 else 0
    boundary_bool: jax.Array   # [N] uint8 = !motion_limiter
    id: jax.Array              # [N] int32 1-based particle id (-1 for padding)
    ptype: jax.Array           # [N] int32 ParticleType enum value
    group_marker: jax.Array    # [N] int32
    ghost_points: jax.Array    # [N, D] zero when no associated ghost node
    ghost_normals: jax.Array   # [N, D]
    active: jax.Array          # [N] bool padding mask

    @property
    def capacity(self) -> int:
        return self.position.shape[0]

    @property
    def dims(self) -> int:
        return self.position.shape[1]

    def permute(self, perm: jax.Array) -> "Particles":
        """Reorder every per-particle field by ``perm`` (the TPU analog of the
        reference's full 17-field StructArray sort, SPHCellList.jl:142)."""
        return jax.tree.map(lambda a: jnp.take(a, perm, axis=0), self)


def allocate_particles(
    position: np.ndarray,
    density: np.ndarray,
    ptype: np.ndarray,
    group_marker: np.ndarray,
    idp: np.ndarray,
    *,
    dtype=jnp.float32,
    capacity: Optional[int] = None,
) -> Particles:
    """Build a Particles pytree from host arrays (one row per particle).

    Mirrors ``AllocateDataStructures`` (reference PreProcess.jl:45-119):
    derives GravityFactor (Fluid -1, Moving +1, Fixed 0; :79-87),
    MotionLimiter (Fluid 1 else 0; :89-98), BoundaryBool (:100), zero-inits all
    dynamic fields (:102-112) and sorts by particle ID (:116).  Slots beyond
    the live count are inactive padding.
    """
    n, dims = position.shape
    capacity = int(capacity or n)
    if capacity < n:
        raise ValueError(f"capacity {capacity} < particle count {n}")

    order = np.argsort(idp, kind="stable")
    position = np.asarray(position, dtype=np.float64)[order]
    density = np.asarray(density, dtype=np.float64)[order]
    ptype = np.asarray(ptype, dtype=np.int32)[order]
    group_marker = np.asarray(group_marker, dtype=np.int32)[order]
    idp = np.asarray(idp, dtype=np.int64)[order]

    gravity_factor = np.zeros(n)
    gravity_factor[ptype == ParticleType.FLUID] = -1.0
    gravity_factor[ptype == ParticleType.MOVING] = 1.0
    motion_limiter = (ptype == ParticleType.FLUID).astype(np.float64)
    boundary_bool = (motion_limiter == 0).astype(np.uint8)

    def padf(a, fill=0.0):
        a = np.asarray(a)
        out = np.full((capacity,) + a.shape[1:], fill, dtype=a.dtype)
        out[:n] = a
        return out

    f = lambda a: jnp.asarray(padf(a), dtype=dtype)  # noqa: E731

    return Particles(
        cell=jnp.zeros((capacity, dims), dtype=jnp.int32),
        chunk_id=jnp.zeros((capacity,), dtype=jnp.int32),
        kernel_w=jnp.zeros((capacity,), dtype=dtype),
        kernel_grad=jnp.zeros((capacity, dims), dtype=dtype),
        position=f(position),
        acceleration=jnp.zeros((capacity, dims), dtype=dtype),
        velocity=jnp.zeros((capacity, dims), dtype=dtype),
        density=f(density),
        pressure=jnp.zeros((capacity,), dtype=dtype),
        gravity_factor=f(gravity_factor),
        motion_limiter=f(motion_limiter),
        boundary_bool=jnp.asarray(padf(boundary_bool), dtype=jnp.uint8),
        id=jnp.asarray(padf(idp, fill=-1), dtype=jnp.int32),
        ptype=jnp.asarray(padf(ptype, fill=0), dtype=jnp.int32),
        group_marker=jnp.asarray(padf(group_marker, fill=0), dtype=jnp.int32),
        ghost_points=jnp.zeros((capacity, dims), dtype=dtype),
        ghost_normals=jnp.zeros((capacity, dims), dtype=dtype),
        active=jnp.asarray(np.arange(capacity) < n),
    )


@struct.dataclass
class PallasTables:
    """Rebuild-time program tables for the fused Pallas sweep.

    All four arrays are pure functions of ``cell_start`` (and static window
    sizes), so they are computed once per lazy rebuild and carried in the
    state instead of being rebuilt by XLA before every sweep (the
    nonzero/cumsum/scatter prelude is O(ncells) and was measured at ~26% of
    the sweep wall time when recomputed per call).  Sized (0,) when the
    Pallas path is off."""

    occ_keys: jax.Array      # [maxc] int32 compacted occupied LEAD cell keys
    prog_base: jax.Array     # [maxc] int32 slot -> first program id
    prog_slot: jax.Array     # [maxp] int32 program id -> occupied slot
    slot_of_cell: jax.Array  # [ncells + 1] int32 cell key -> occupied slot
    nprog: jax.Array         # scalar int32 live program count (dynamic grid)
    # cell-pair programs (sweep only): 1 when the slot covers cells
    # {key, key+1} (x-adjacent, paired by x-parity - deterministic under
    # sharding); the mDBC tables leave this all-zero
    slot_pair: jax.Array     # [maxc] int32
    # gather-back indices: particle row -> (program block, row-in-block).
    # Pure functions of the sorted order, so rebuild-time as well.
    prog_idx: jax.Array      # [capacity] int32
    row_idx: jax.Array       # [capacity] int32


def empty_pallas_tables() -> PallasTables:
    # every leaf is rank-1 so the sharded state specs (P(axis) on all table
    # leaves) stay valid for the table-less gather path
    z = jnp.zeros((0,), dtype=jnp.int32)
    return PallasTables(occ_keys=z, prog_base=z, prog_slot=z, slot_of_cell=z,
                        nprog=z, prog_idx=z, row_idx=z, slot_pair=z)


@struct.dataclass
class BlockTables:
    """Rebuild-time tables for the block-structured Pallas sweep
    (``ops/pallas_block_sweep.py``): one flat chunk list driving the
    kernel's streaming DMA pipeline, plus the per-row constants the pack
    carries as extra field lanes.  Pure functions of ``cell_start`` + the
    sorted order, refreshed at every lazy rebuild."""

    prog_start: jax.Array   # [maxb + 1] int32: first flat chunk (low 24 bits)
    #                         | block lane-group cut << 24 (entry maxb: total)
    prog_mid: jax.Array     # [maxb] int32: first group-B chunk of the block
                            # (chunk g's lane group = g >= prog_mid[b])
    chunk_tab: jax.Array    # [ct_cap] int32 packed chunk code: vstart (8b)
                            # | (vend-1) << S | off8/8 << 2S (S = S_BITS,
                            # logical shifts - the sign bit is data).  ONE
                            # word per chunk: two words measured over the
                            # 1 MB scoped-SMEM cap at 430k particles.
    csr: jax.Array          # [capacity] f32 own-cell start (role quirk)
    cer: jax.Array          # [capacity] f32 own-cell end
    idx: jax.Array          # [capacity] f32 sorted index (exact <= 2^24)
    chunk_total: jax.Array  # scalar int32 - chunks needed (overflow telemetry)


def empty_block_tables() -> BlockTables:
    z = jnp.zeros((0,), dtype=jnp.int32)
    zf = jnp.zeros((0,), dtype=jnp.float32)
    return BlockTables(prog_start=z, prog_mid=z, chunk_tab=z, csr=zf, cer=zf,
                       idx=zf, chunk_total=jnp.zeros((), jnp.int32))


@struct.dataclass
class SimulationState:
    """Full on-device simulation state: particles + neighbor structure + the
    mutable counters the reference keeps in ``SimulationMetaData``."""

    particles: Particles
    cell_start: jax.Array        # [ncells + 2] int32 segment starts (incl. parking)
    total_time: jax.Array        # scalar
    current_dt: jax.Array        # scalar
    iteration: jax.Array         # scalar int32
    max_occupancy: jax.Array     # scalar int32 - overflow telemetry for the host
    max_segment: jax.Array       # scalar int32 - max 3-cell row segment length
    occupied_cells: jax.Array    # scalar int32 - occupied-cell count at rebuild
    # Scratch half-step position kept across steps ONLY for the lazy-rebuild
    # displacement rule (update_delta_x!, reference SPHCellList.jl:706-724).
    # Like the reference, it is NOT permuted on resort (scratch arrays are not
    # part of the StructArray sort) - a faithful cadence quirk.
    position_half: jax.Array     # [N, D]
    # Pallas program tables refreshed at every lazy rebuild (empty when the
    # Pallas sweep is off).
    pallas_tables: PallasTables = struct.field(default_factory=empty_pallas_tables)
    # Sharded halo telemetry: max sorted-row reach of any local stencil
    # window past the slab boundary, pmax'd over devices at rebuild (0 on
    # single-chip runs).  The driver raises if it outgrows cfg.halo.
    max_halo: jax.Array = struct.field(
        default_factory=lambda: jnp.zeros((), jnp.int32)
    )
    # Block-sweep chunk tables, refreshed at every lazy rebuild (empty when
    # the block sweep is off; sized by (capacity, ct_cap) - re-initialized,
    # never padded, on capacity growth).
    block_tables: BlockTables = struct.field(default_factory=empty_block_tables)
    # Max flat-chunk count any rebuild needed this run; the driver retunes
    # when it outgrows cfg.ct_cap (truncated chunk tables sweep a physically
    # wrong cover, exactly like overflowed occupancy windows).
    max_chunks: jax.Array = struct.field(
        default_factory=lambda: jnp.zeros((), jnp.int32)
    )
    # Grid-escape telemetry: number of ACTIVE particles whose unclamped cell
    # coords fell outside the static grid at any rebuild this interval.  The
    # static grid clamps escapees into edge cells (ops/cell_list.clamp_coords)
    # - silently wrong physics, unlike the reference's unbounded cell Dict
    # (SPHCellList.jl:144-162) - so the driver treats any nonzero count like
    # a window overflow: re-grid and replay the interval.
    grid_escapes: jax.Array = struct.field(
        default_factory=lambda: jnp.zeros((), jnp.int32)
    )

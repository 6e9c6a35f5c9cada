"""Static configuration for the TPU-native weakly-compressible SPH framework.

Everything in this module is *trace-time static*: plain Python dataclasses of
floats / ints / enums that are baked into the jitted step function.  This is
the TPU-native equivalent of the reference's two-tier config system
(compile-time type-parameter mode flags + runtime keyword structs), see
reference ``src/SimulationMetaDataConfiguration.jl:12-75`` and
``src/SimulationConstantsConfiguration.jl:36-52``: a mode that is off costs
exactly zero at runtime because the trace never emits it.
"""

from __future__ import annotations

import dataclasses
import enum
import math
from dataclasses import dataclass
from typing import Optional, Tuple, Union


# ---------------------------------------------------------------------------
# Particle types (reference src/SimulationGeometry.jl:10-14)
# ---------------------------------------------------------------------------
class ParticleType(enum.IntEnum):
    FLUID = 1
    FIXED = 2
    MOVING = 3


# ---------------------------------------------------------------------------
# Mode axes (reference src/SimulationMetaDataConfiguration.jl:12-26).
# In the reference these are Julia type parameters dispatched at compile time;
# here they are Python enums resolved at trace time - same zero-cost-when-off
# property because jit specializes on them.
# ---------------------------------------------------------------------------
class ShiftingMode(enum.Enum):
    NONE = "none"
    PLANAR = "planar"


class KernelOutputMode(enum.Enum):
    NONE = "none"
    STORE = "store"


class MDBCMode(enum.Enum):
    NONE = "none"
    SIMPLE = "simple"


class LogMode(enum.Enum):
    NONE = "none"
    STORE = "store"


class KernelFamily(enum.Enum):
    WENDLAND_C2 = "wendland_c2"
    CUBIC_SPLINE = "cubic_spline"


class ViscosityModel(enum.Enum):
    """Reference src/SPHViscosityModels.jl:13-39."""

    ZERO = "zero"
    ARTIFICIAL = "artificial"
    LAMINAR = "laminar"
    LAMINAR_SPS = "laminar_sps"


class DensityDiffusionModel(enum.Enum):
    """Reference src/SPHDensityDiffusionModels.jl:20-148.

    The reference also *exports* a ``ZeroGravityComplexDensityDiffusion`` that
    is never defined (src/SPHDensityDiffusionModels.jl:12) - a latent bug we
    deliberately do not replicate.
    """

    ZERO = "zero"
    ZERO_GRAVITY_LINEAR = "zero_gravity_linear"
    LINEAR = "linear"
    COMPLEX = "complex"


# ---------------------------------------------------------------------------
# Simulation constants (reference src/SimulationConstantsConfiguration.jl:36-52)
# ---------------------------------------------------------------------------
@dataclass(frozen=True)
class SimulationConstants:
    """Physical / numerical constants with the reference's derived defaults.

    All fields are Python floats: inside jit they are weakly-typed literals, so
    arithmetic stays in the state dtype (f32 on TPU, f64 in x64 parity mode).
    """

    rho0: float = 1000.0
    dx: float = 0.02
    m0: Optional[float] = None  # default rho0 * dx^2 (2D convention)
    alpha: float = 0.01
    g: float = 9.81
    c0: Optional[float] = None  # default sqrt(2 g) * 20
    gamma: float = 7.0
    delta_sph: float = 0.1  # density-diffusion coefficient delta_phi
    cfl: float = 0.2
    Cb: Optional[float] = None  # default c0^2 rho0 / gamma
    nu0: float = 1e-6
    blin_constant: float = 0.0066
    smagorinsky_constant: float = 0.12

    def __post_init__(self):
        if self.m0 is None:
            object.__setattr__(self, "m0", self.rho0 * self.dx**2)
        if self.c0 is None:
            object.__setattr__(self, "c0", math.sqrt(self.g * 2) * 20)
        if self.Cb is None:
            object.__setattr__(self, "Cb", (self.c0**2 * self.rho0) / self.gamma)
        assert self.rho0 > 0 and self.dx > 0 and self.m0 > 0
        assert self.g >= 0 and self.c0 > 0 and self.gamma > 0
        assert self.delta_sph > 0 and self.cfl > 0 and self.Cb >= 0

    @property
    def gamma_inv(self) -> float:
        return 1.0 / self.gamma

    @property
    def Cb_inv(self) -> float:
        return 1.0 / self.Cb


# ---------------------------------------------------------------------------
# Kernel instance (reference src/SPHKernels.jl:30-72)
# ---------------------------------------------------------------------------
@dataclass(frozen=True)
class SPHKernelInstance:
    """Precomputed smoothing-kernel scalars.

    Mirrors ``SPHKernelInstance{Kernel,D,T}`` (reference src/SPHKernels.jl:30-40):
    h, 1/h, support radius H = k*h, 1/H, H^2, normalization alpha_d and
    eta^2 = (0.01 h)^2.  Use :func:`make_kernel` to construct from exactly one
    of ``dx`` or ``h`` (reference src/SPHKernels.jl:42-72).
    """

    family: KernelFamily
    dims: int
    k: float
    h: float
    h_inv: float
    H: float
    H_inv: float
    H2: float
    alpha_d: float
    eta2: float
    cubic_eps: float = 1.0  # CubicSpline tensile-correction epsilon


def _alpha_d(family: KernelFamily, dims: int, h: float) -> float:
    """Normalization constants (reference src/SPHKernels.jl:22-27).

    There is no 1D Wendland constant in the reference (src/SPHKernels.jl:21);
    we keep the same restriction.
    """
    if family is KernelFamily.WENDLAND_C2:
        if dims == 2:
            return 7 / (4 * math.pi * h**2)
        if dims == 3:
            return 21 / (16 * math.pi * h**3)
        raise ValueError("WendlandC2 supports only 2D/3D (reference SPHKernels.jl:21)")
    if family is KernelFamily.CUBIC_SPLINE:
        if dims == 1:
            return 2 / (3 * h)
        if dims == 2:
            return 10 / (7 * math.pi * h**2)
        if dims == 3:
            return 1 / (math.pi * h**3)
        raise ValueError("CubicSpline supports only 1D/2D/3D")
    raise ValueError(f"unknown kernel family {family}")


def make_kernel(
    family: KernelFamily,
    dims: int,
    *,
    dx: Optional[float] = None,
    h: Optional[float] = None,
    k: float = 2.0,
    cubic_eps: float = 1.0,
) -> SPHKernelInstance:
    """Construct a kernel instance from exactly one of ``dx`` or ``h``.

    Matches reference src/SPHKernels.jl:42-72: given ``dx``, h = k*dx; the
    support radius is always H = k*h.
    """
    if (dx is None) == (h is None):
        raise ValueError("Must provide exactly one of `dx` or `h`")
    h0 = k * dx if dx is not None else h
    H = k * h0
    return SPHKernelInstance(
        family=family,
        dims=dims,
        k=k,
        h=h0,
        h_inv=1.0 / h0,
        H=H,
        H_inv=1.0 / H,
        H2=H * H,
        alpha_d=_alpha_d(family, dims, h0),
        eta2=(0.01 * h0) ** 2,
        cubic_eps=cubic_eps,
    )


# ---------------------------------------------------------------------------
# Geometry spec (reference src/SimulationGeometry.jl:10-31)
# ---------------------------------------------------------------------------
@dataclass(frozen=True)
class MotionDetails:
    """Prescribed rigid-body motion (reference src/SimulationGeometry.jl:16-22)."""

    velocity: float
    start_time: float
    duration: float
    direction: Tuple[float, ...]


@dataclass(frozen=True)
class Geometry:
    """One input body: CSV path + group marker + particle type + optional motion
    (reference src/SimulationGeometry.jl:24-31)."""

    csv_file: str
    group_marker: int
    type: ParticleType
    motion: Optional[MotionDetails] = None


# ---------------------------------------------------------------------------
# Simulation metadata (reference src/SimulationMetaDataConfiguration.jl:28-67)
# ---------------------------------------------------------------------------
DEFAULT_OUTPUT_VARIABLES: Tuple[str, ...] = (
    "ChunkID",
    "Kernel",
    "KernelGradient",
    "Density",
    "Pressure",
    "Velocity",
    "Acceleration",
    "BoundaryBool",
    "ID",
    "Type",
    "GroupMarker",
    "GhostPoints",
    "GhostNormals",
)


@dataclass(frozen=True)
class SimulationMetaData:
    """Run metadata + the four static mode axes.

    Mutable counters of the reference struct (Iteration, TotalTime, ...) live in
    the on-device :class:`~sphexample_tpu.state.SimulationState` instead - this
    dataclass holds only what is static for the whole run.

    The reference's ``ChunkMultiplier`` field is unused in its code
    (SimulationMetaDataConfiguration.jl:66, stale README claim) and is not
    replicated.
    """

    simulation_name: str
    save_location: str
    dims: int = 2
    simulation_time: float = 1.0
    # Scalar output interval or explicit tuple of output times
    # (reference SimulationMetaDataConfiguration.jl:39, SPHCellList.jl:687-698).
    output_times: Union[float, Tuple[float, ...]] = 0.02
    shifting: ShiftingMode = ShiftingMode.NONE
    kernel_output: KernelOutputMode = KernelOutputMode.NONE
    mdbc: MDBCMode = MDBCMode.NONE
    log: LogMode = LogMode.STORE
    # Generate the ParaView state file at exit (reference
    # SimulationMetaDataConfiguration.jl:47 default true; we generate the
    # state file but never auto-launch ParaView - see io/paraview.py).
    visualize_in_paraview: bool = True
    export_single_vtkhdf: bool = True
    export_grid_cells: bool = False
    output_variables: Tuple[str, ...] = DEFAULT_OUTPUT_VARIABLES
    # Surface the log-file path at exit (reference AutoOpenLogFile,
    # OpenExternalPrograms.jl:37-52, default true at
    # SimulationMetaDataConfiguration.jl:65; auto-launching an editor is
    # deliberately not replicated - we print the path instead).
    open_log_file: bool = True
    # --- TPU-native knobs (no reference equivalent) ---
    dtype: str = "float32"  # state dtype; "float64" for x64 parity runs
    grid_margin_cells: int = 6  # static-grid padding around initial extent
    max_per_cell: Optional[int] = None  # candidate-window capacity (auto if None)
    max_occupied_cells: Optional[int] = None  # Pallas occupied-cell cap (auto)
    block_size: int = 1024  # particle chunking for the pair sweep
    use_pallas: bool = False  # fused Pallas pair kernel (TPU only)
    # Single-chip hot path: the block-structured sweep (ops/pallas_block_sweep,
    # one program per 128 sorted rows, flat chunk table, no gather-back).
    # False falls back to the cell-pair program kernel (ops/pallas_sweep) -
    # which remains the sharded-halo path either way.
    block_sweep: bool = True
    # Cap on steps per device program; the host loops chunks per interval.
    # Long single executions can trip remote-worker watchdogs (~60 s on the
    # tunneled TPU).  64 steps of the 160k headline case is ~5 s per program
    # at current kernel speed - 12x under the watchdog - while cutting the
    # per-interval host round-trips from ~15 to ~2.
    max_steps_per_call: Optional[int] = 64
    # Overlap snapshot device->host transfers and HDF5 writes with the next
    # interval's device compute (worker thread; measured 33% of headline
    # wall when synchronous over the tunneled link).
    async_output: bool = True
    # Device-call watchdog (utils/watchdog.py): seconds a single device
    # chunk may block before the run warns loudly - or, with watchdog_hard,
    # exits with code 86 so a supervisor restarts it from the last
    # checkpoint (--resume).  A stalled remote-device transport otherwise
    # hangs a multi-hour run silently (observed; see PERFORMANCE.md).
    device_call_timeout: Optional[float] = None
    watchdog_hard: bool = False

    def output_time_for(self, counter: int) -> float:
        """next_output_time (reference src/SPHCellList.jl:687-698)."""
        if isinstance(self.output_times, (int, float)):
            return float(self.output_times) * counter
        times = self.output_times
        # Reference indexes 1-based with guard `idx < length(times)`
        # (SPHCellList.jl:691-698): the *last* list entry is never used and the
        # final interval runs to SimulationTime - replicated faithfully.
        if counter < len(times):
            return float(times[counter - 1])
        return float(self.simulation_time)


def replace(obj, **kwargs):
    """Convenience re-export of dataclasses.replace for config tweaking."""
    return dataclasses.replace(obj, **kwargs)

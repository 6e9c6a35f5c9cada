"""sphexample_tpu: a TPU-native weakly-compressible SPH framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
AhmedSalih3d/SPHExample (pure-Julia, CPU-threaded WCSPH solver): same physics
and numerical behavior, but gather-formulated over an on-device sorted cell
list, with the whole symplectic step living in a single jit and optional
multi-chip spatial sharding over a ``jax.sharding.Mesh``.
"""

from .config import (  # noqa: F401
    DensityDiffusionModel,
    Geometry,
    KernelFamily,
    KernelOutputMode,
    LogMode,
    MDBCMode,
    MotionDetails,
    ParticleType,
    ShiftingMode,
    SimulationConstants,
    SimulationMetaData,
    SPHKernelInstance,
    ViscosityModel,
    make_kernel,
    replace,
)
from .state import Particles, SimulationState, allocate_particles  # noqa: F401
from .core.driver import (  # noqa: F401
    Simulation,
    assemble_simulation,
    build_simulation,
    run_simulation,
)
from .core.step import StepConfig, make_interval_fn, sph_step  # noqa: F401

__version__ = "0.1.0"

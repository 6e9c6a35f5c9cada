from . import kernels, equations, viscosity, density_diffusion  # noqa: F401

"""CFL-adaptive time stepping as on-device reductions.

Reference: ``src/TimeStepping.jl:24-46``.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import SimulationConstants, SPHKernelInstance


def adaptive_dt(
    position,
    velocity,
    acceleration,
    constants: SimulationConstants,
    kernel: SPHKernelInstance,
    ctx=None,
):
    """dt = CFL * min(dt_force, dt_acoustic).

    * viscous term: max over particles of |h (v . r) / (r . r + eta^2)| - NB
      the reference uses the *absolute position* r here, not pair distances
      (TimeStepping.jl:30-32); replicated faithfully.
    * force: dt1 = min sqrt(h / |a|)  (-> inf for zero acceleration, matching
      the reference's init=Inf; inactive padding has a = 0 and v = 0 so it
      never constrains the minimum).
    * acoustic: dt2 = h / (c0 + visc).
    """
    from ..parallel.context import SINGLE

    ctx = ctx or SINGLE
    h = kernel.h
    v_dot_r = jnp.sum(velocity * position, axis=-1)
    r_dot_r = jnp.sum(position * position, axis=-1)
    visc = ctx.pmax(jnp.max(jnp.abs(h * v_dot_r / (r_dot_r + kernel.eta2))))

    acc_norm = jnp.sqrt(jnp.sum(acceleration * acceleration, axis=-1))
    # |a| = 0 -> Inf (reference init=Inf); explicit where because XLA lowers
    # sqrt(inf) through rsqrt and would produce NaN.
    inf = jnp.asarray(jnp.inf, dtype=acc_norm.dtype)
    dt1 = ctx.pmin(jnp.min(jnp.where(acc_norm > 0, jnp.sqrt(h / acc_norm), inf)))

    dt2 = h / (constants.c0 + visc)
    return constants.cfl * jnp.minimum(dt1, dt2)

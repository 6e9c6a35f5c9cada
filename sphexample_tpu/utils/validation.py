"""Determinism and precision validation modes.

The reference avoids data races *by construction* (per-thread accumulators,
SURVEY.md section 5.2) and has no sanitizer; the gather formulation here has
no writes to race at all, so the TPU-native equivalent is an explicit
*determinism check* (same state in, bit-identical state out) plus an
fp32-vs-fp64 drift probe for precision validation.
"""

from __future__ import annotations

from typing import Dict

import jax
import numpy as np


def check_determinism(sim, n_steps: int = 5) -> bool:
    """Run ``n_steps`` twice from the same state; assert bit-identical output.

    Catches nondeterministic reductions/scatters sneaking into the step.
    """
    from ..core.step import make_fixed_steps_fn

    run = make_fixed_steps_fn(sim.cfg, n_steps)
    a = run(sim.state)
    b = run(sim.state)
    leaves_a = jax.tree.leaves(a)
    leaves_b = jax.tree.leaves(b)
    for la, lb in zip(leaves_a, leaves_b):
        if not np.array_equal(np.asarray(la), np.asarray(lb)):
            return False
    return True


def compare_states(state_a, state_b, n_live: int) -> Dict[str, float]:
    """Max relative field differences between two runs, matched by particle ID
    (orders may differ).  Use to quantify fp32-vs-fp64 drift."""
    out = {}

    def order(state):
        ids = np.asarray(state.particles.id)
        o = np.argsort(ids)
        return o[ids[o] > 0]

    oa, ob = order(state_a), order(state_b)
    for field in ("position", "velocity", "density", "pressure"):
        a = np.asarray(getattr(state_a.particles, field), dtype=np.float64)[oa]
        b = np.asarray(getattr(state_b.particles, field), dtype=np.float64)[ob]
        scale = np.abs(b).max() + 1e-30
        out[field] = float(np.abs(a - b).max() / scale)
    return out

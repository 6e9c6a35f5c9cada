"""Checkpoint / resume (new capability - the reference has none; SURVEY.md
section 5.4 flags this as a cheap win).

Whole-``SimulationState`` snapshots as compressed ``.npz``: every particle
field, the neighbor structure and the loop counters, so a resumed run
continues bit-for-bit from the saved step (modulo the interval-local
displacement accumulator, which resets at interval start by design - the same
reset the reference performs every ``SimulationLoop`` call).

Checkpoints survive auto-retunes in BOTH directions: the npz records the
window metadata (capacity / mpc / cseg / maxc), leaves are keyed by pytree
path, particle-axis arrays are padded on load when the capacities differ,
and the Pallas program tables are never restored (they are pure functions of
``cell_start`` and the first step of every interval rebuilds them) - so a
checkpoint written after a retune resumes into a freshly assembled
simulation and vice versa (:func:`resume_simulation`).
"""

from __future__ import annotations

import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..state import SimulationState


def _path_items(state: SimulationState):
    from jax.tree_util import keystr, tree_flatten_with_path

    leaves_p, treedef = tree_flatten_with_path(state)
    return [(keystr(kp), v) for kp, v in leaves_p], treedef


def save_checkpoint(path: str, state: SimulationState, counter: int, cfg=None):
    """``cfg`` (a StepConfig) records the window metadata that makes the
    checkpoint resumable across retunes."""
    items, _ = _path_items(state)
    # the Pallas/block tables are pure functions of cell_start and are
    # rebuilt at the first step of every interval: never persisted
    arrays = {f"f::{k}": np.asarray(v) for k, v in items
              if "pallas_tables" not in k and "block_tables" not in k}
    extras = dict(
        counter=np.asarray(counter),
        capacity=np.asarray(state.particles.capacity),
    )
    if cfg is not None:
        extras.update(
            mpc=np.asarray(cfg.mpc), cseg=np.asarray(cfg.cseg),
            maxc=np.asarray(cfg.maxc),
            ct_cap=np.asarray(getattr(cfg, "ct_cap", 0)),
        )
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(path, **extras, **arrays)


def load_checkpoint(path: str, template: SimulationState) -> Tuple[SimulationState, int]:
    """Restore into the structure of ``template``.

    Leaves are matched by pytree path; particle-axis arrays whose capacity
    differs are padded with inactive slots (template capacity must be >= the
    saved one - use :func:`resume_simulation` to grow a simulation first).
    ``pallas_tables`` leaves are deliberately NOT restored: their shapes
    depend on the (possibly retuned) window config and the first step of
    every interval rebuilds them from ``cell_start``.
    """
    data = np.load(path)
    try:
        return _load_into(data, template)
    finally:
        data.close()


def _load_into(data, template: SimulationState) -> Tuple[SimulationState, int]:
    if "capacity" not in data:
        # legacy format: positional leaves, exact shapes required
        leaves, treedef = jax.tree.flatten(template)
        restored = []
        for i, leaf in enumerate(leaves):
            arr = data[f"leaf_{i}"]
            if arr.shape != leaf.shape:
                raise ValueError(
                    f"checkpoint leaf {i} shape {arr.shape} != template "
                    f"{leaf.shape} (legacy checkpoint; re-save to migrate)"
                )
            restored.append(jnp.asarray(arr, dtype=leaf.dtype))
        return jax.tree.unflatten(treedef, restored), int(data["counter"])

    cap_saved = int(data["capacity"])
    cap_t = int(template.particles.capacity)
    if cap_t < cap_saved:
        raise ValueError(
            f"checkpoint capacity {cap_saved} exceeds the simulation's "
            f"{cap_t}; grow it first (resume_simulation does this)"
        )
    items, treedef = _path_items(template)
    restored = []
    for kp, leaf in items:
        if "pallas_tables" in kp or "block_tables" in kp:
            restored.append(leaf)  # rebuilt at the first step of the interval
            continue
        key = f"f::{kp}"
        if key not in data:
            if "max_chunks" in kp or "grid_escapes" in kp:
                # telemetry scalar added after older checkpoints were written;
                # zero re-accumulates at the next rebuild
                restored.append(leaf)
                continue
            raise ValueError(f"checkpoint is missing state leaf {kp!r}")
        arr = data[key]
        if arr.shape != leaf.shape:
            ok_pad = (
                arr.ndim >= 1 and leaf.ndim == arr.ndim
                and arr.shape[0] == cap_saved and leaf.shape[0] == cap_t
                and arr.shape[1:] == tuple(leaf.shape[1:])
            )
            if not ok_pad:
                raise ValueError(
                    f"checkpoint leaf {kp!r} shape {arr.shape} != template "
                    f"{leaf.shape} and is not a particle-axis array"
                )
            padded = np.zeros(leaf.shape, dtype=arr.dtype)
            padded[:cap_saved] = arr
            if kp.endswith(".id"):
                padded[cap_saved:] = -1  # matches pad_capacity's convention
            arr = padded
        restored.append(jnp.asarray(arr, dtype=leaf.dtype))
    return jax.tree.unflatten(treedef, restored), int(data["counter"])


def _reinit_tables(state, cfg, cap: int):
    """Re-init the capacity-shaped Pallas program/block tables after a
    capacity change (shared by both resume branches; core/driver._retune
    rebuilds through the same constructors)."""
    if cfg.ct_cap:
        from ..ops.pallas_block_sweep import init_block_tables

        return state.replace(block_tables=init_block_tables(cap, cfg.ct_cap))
    from ..ops.pallas_sweep import init_program_tables, sweep_rows

    return state.replace(
        pallas_tables=init_program_tables(cfg.grid, cfg.maxc,
                                          sweep_rows(cfg.mpc), cap)
    )


def resume_simulation(sim, path: str):
    """Resume ``sim`` from ``path`` even when the checkpoint was written
    with different (retuned) windows or capacity: grows the simulation's
    windows/capacity to cover the checkpoint's, re-jits, then loads.

    Returns ``(sim, start_counter)``.
    """
    import dataclasses as _dc

    # read only the scalar window metadata here (and close the npz - the
    # leaves are loaded once, by load_checkpoint below)
    with np.load(path) as npz:
        meta_keys = ("mpc", "cseg", "maxc", "capacity", "ct_cap")
        data = {k: int(npz[k]) for k in meta_keys if k in npz}
    if "mpc" in data and getattr(sim.cfg, "use_pallas", False):
        mpc = max(int(data["mpc"]), sim.cfg.mpc)
        cseg = max(int(data["cseg"]), sim.cfg.cseg)
        maxc = max(int(data["maxc"]), sim.cfg.maxc)
        cap = max(int(data["capacity"]), int(sim.state.particles.capacity))
        ct_cap = sim.cfg.ct_cap
        if ct_cap and "ct_cap" in data:
            ct_cap = max(int(data["ct_cap"]), ct_cap)
        if (mpc, cseg, maxc, ct_cap) != (
                sim.cfg.mpc, sim.cfg.cseg, sim.cfg.maxc, sim.cfg.ct_cap) or \
                cap != int(sim.state.particles.capacity):
            from ..core.driver import Simulation
            from ..parallel.mesh import pad_capacity

            state = pad_capacity(sim.state, cap)
            new_cfg = _dc.replace(sim.cfg, mpc=mpc, cseg=cseg, maxc=maxc,
                                  ct_cap=ct_cap)
            state = _reinit_tables(state, new_cfg, cap)
            sim = Simulation(
                cfg=new_cfg, state=state, meta=sim.meta, n_live=sim.n_live
            )
    elif "capacity" in data and int(data["capacity"]) > int(
            sim.state.particles.capacity):
        from ..parallel.mesh import pad_capacity

        cap = int(data["capacity"])
        sim.state = pad_capacity(sim.state, cap)
        if getattr(sim.cfg, "use_pallas", False):
            # cfg-less checkpoint (save_checkpoint cfg=None) on a Pallas sim:
            # the program/block tables are shaped by capacity, so leaving
            # them at the old size makes the interval trace fail with a
            # lax.cond branch-shape mismatch - re-init like the cfg-aware
            # branch, and re-jit through a fresh Simulation
            from ..core.driver import Simulation

            state = _reinit_tables(sim.state, sim.cfg, cap)
            sim = Simulation(
                cfg=sim.cfg, state=state, meta=sim.meta, n_live=sim.n_live
            )

    sim.state, start_counter = load_checkpoint(path, sim.state)
    return sim, start_counter

"""Multi-chip spatial sharding: slab decomposition over a jax Mesh.

Re-exports from :mod:`.mesh` are lazy (PEP 562): ``mesh`` imports
``core.driver`` which imports ``parallel.context``, so an eager re-export
here would be circular.
"""

_MESH_EXPORTS = ("make_mesh", "make_sharded_interval_fn", "shard_simulation")

__all__ = list(_MESH_EXPORTS)


def __getattr__(name):
    if name in _MESH_EXPORTS:
        from . import mesh

        return getattr(mesh, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")

"""Active-mesh registry: lets the Pallas kernels shard themselves.

XLA's SPMD partitioner cannot partition a ``pallas_call`` — with sharded
operands it falls back to all-gathering the inputs and running the full
kernel on every device (verified: 21 all-gathers around one flash-attention
call on a 4×2 mesh), silently undoing tensor/data parallelism for the
kernel. The kernels are per-(batch, head) independent, so the fix is a
``jax.shard_map`` around the kernel with batch on the ``data`` axis and
heads on the ``model`` axis — but the kernel call sites live deep inside
model code that has no mesh argument.  Trainers, the multichip dryrun, and
tests register the mesh here; kernel wrappers consult it and fall back to
the unsharded call when no mesh is active (single chip) or shapes do not
divide.
"""

from __future__ import annotations

import contextlib

_ACTIVE_MESH = None


def set_active_mesh(mesh):
    """Register the mesh the current program runs under (None to clear).

    The registry is consulted at TRACE time inside callers' jits, so a
    cached trace bakes in the mesh that was active when it compiled.
    Changing the active mesh therefore drops all jit caches — otherwise a
    function first traced without a mesh would keep running its unsharded
    (all-gathering) trace after the mesh is registered, and vice versa.
    Mesh changes are rare (trainer/serving startup), so the recompile cost
    is paid once, not per step."""
    global _ACTIVE_MESH
    if mesh is not _ACTIVE_MESH:
        same = (_ACTIVE_MESH is not None and mesh is not None
                and _ACTIVE_MESH.shape == mesh.shape
                and _ACTIVE_MESH.devices.tolist() == mesh.devices.tolist())
        if not same:
            import jax
            jax.clear_caches()
    _ACTIVE_MESH = mesh


def active_mesh():
    """The registered mesh, or None. Meshes of size 1 count as None."""
    if _ACTIVE_MESH is not None and _ACTIVE_MESH.size > 1:
        return _ACTIVE_MESH
    return None


@contextlib.contextmanager
def use_mesh(mesh):
    """Scoped mesh registration (tests/tools).  Unlike set_active_mesh this
    does NOT drop jit caches — callers that re-trace the same function with
    identical shapes under a different mesh must clear caches themselves
    (jax.clear_caches()); the test suite uses per-case functions/shapes."""
    global _ACTIVE_MESH
    prev = _ACTIVE_MESH
    _ACTIVE_MESH = mesh
    try:
        yield mesh
    finally:
        _ACTIVE_MESH = prev

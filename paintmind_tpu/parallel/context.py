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

The registry is consulted at TRACE time inside callers' jits, so a cached
trace bakes in the mesh that was active when it compiled.  Every jit entry
point that can reach a kernel wrapper therefore goes through
:func:`mesh_keyed_jit`, which injects the active mesh as a static argument
— flipping the mesh re-traces those programs automatically instead of
serving a stale unsharded trace (the round-2 global ``jax.clear_caches``
hammer is gone; ``set_active_mesh`` and ``use_mesh`` now behave
identically).
"""

from __future__ import annotations

import contextlib
import functools

_ACTIVE_MESH = None


def set_active_mesh(mesh):
    """Register the mesh the current program runs under (None to clear).
    Safe at any point in the process: mesh-keyed jit caches re-trace on
    the next call instead of reusing traces from the previous mesh."""
    global _ACTIVE_MESH
    _ACTIVE_MESH = mesh


def active_mesh():
    """The registered mesh, or None. Meshes of size 1 count as None."""
    if _ACTIVE_MESH is not None and _ACTIVE_MESH.size > 1:
        return _ACTIVE_MESH
    return None


@contextlib.contextmanager
def use_mesh(mesh):
    """Scoped mesh registration (tests/tools); same cache semantics as
    set_active_mesh — mesh-keyed programs re-trace under the new mesh."""
    global _ACTIVE_MESH
    prev = _ACTIVE_MESH
    _ACTIVE_MESH = mesh
    try:
        yield mesh
    finally:
        _ACTIVE_MESH = prev


class MeshKeyedJit:
    """A jitted callable whose trace cache keys on the active mesh.

    ``jax.sharding.Mesh`` is hashable, so the mesh rides along as a static
    argument: calls under different active meshes hit different cache
    entries, and returning to an earlier mesh reuses its compiled program.
    """

    def __init__(self, jitted):
        self._jit = jitted
        functools.update_wrapper(self, jitted, updated=())

    def __call__(self, *args, **kw):
        kw.setdefault('_mesh', active_mesh())
        return self._jit(*args, **kw)

    def lower(self, *args, **kw):
        kw.setdefault('_mesh', active_mesh())
        return self._jit.lower(*args, **kw)

    def eval_shape(self, *args, **kw):
        kw.setdefault('_mesh', active_mesh())
        return self._jit.eval_shape(*args, **kw)


def mesh_keyed_jit(fn, *, static_argnames=(), **jit_kw):
    """``jax.jit`` with the active mesh folded into the cache key.

    ``fn`` is wrapped in a shim that accepts and discards a ``_mesh``
    static kwarg; the returned :class:`MeshKeyedJit` fills it from
    :func:`active_mesh` on every call."""
    import jax

    def shim(*args, _mesh=None, **kw):
        del _mesh  # cache key only; kernels consult active_mesh() directly
        return fn(*args, **kw)

    # keep the display name; do NOT functools.wraps — that would point
    # inspect.signature at fn, which has no _mesh param, and jit's
    # static_argnames validation would reject the wrapper
    shim.__name__ = getattr(fn, '__name__', 'mesh_keyed')
    shim.__doc__ = getattr(fn, '__doc__', None)

    if isinstance(static_argnames, str):
        static_argnames = (static_argnames,)
    jitted = jax.jit(shim, static_argnames=(*static_argnames, '_mesh'),
                     **jit_kw)
    return MeshKeyedJit(jitted)

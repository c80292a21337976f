"""Tracing/profiling hooks (SURVEY §5: the reference has none; here we wire
jax.profiler so any train/sample loop can capture a Perfetto/TensorBoard
trace)."""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def trace(log_dir, *, create_perfetto_link=False):
    """Capture a device trace for the enclosed block:

        with profiling.trace('/tmp/trace'):
            state, m = step(state, batch)
            jax.block_until_ready(m)

    View in TensorBoard (profile plugin) or Perfetto."""
    jax.profiler.start_trace(log_dir,
                             create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name):
    """Named scope for profiler timelines (usable as decorator/context)."""
    return jax.named_scope(name)


def device_memory_stats(device=None):
    dev = device or jax.devices()[0]
    stats = getattr(dev, 'memory_stats', lambda: None)()
    return stats or {}

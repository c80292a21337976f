"""Multi-host SPMD entry helpers — the replacement for ``accelerate launch``
(SURVEY §2.2: the reference's multi-process story is implicit in accelerate;
here the same single-program code runs on every host of a pod slice)."""

from __future__ import annotations

import jax


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """Call once at program start on each host of a multi-host pod.  With no
    args, TPU pod environments auto-discover topology."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs.update(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)
    return {'process_index': jax.process_index(),
            'process_count': jax.process_count(),
            'local_devices': jax.local_device_count(),
            'global_devices': jax.device_count()}


def is_main_process():
    """Host-0 gating for logging/checkpoint writes (the reference's
    ``accelerator.is_main_process``, trainer.py:176)."""
    return jax.process_index() == 0

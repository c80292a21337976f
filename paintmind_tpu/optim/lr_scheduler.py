"""Warmup + cosine LR schedule.

Pure-JAX replacement for the reference's timm CosineLRScheduler wrapper
(paintmind/utils/lr_scheduler.py:3-10) with the exact flag combination the
reference uses: ``warmup_prefix=True``, ``t_in_epochs=False``,
``cycle_limit=1``, stepped per-iteration:

  t <  warmup_t:  lr = warmup_lr_init + t · (lr − warmup_lr_init)/warmup_t
  t >= warmup_t:  t' = t − warmup_t
                  t' < decay: lr_min + 0.5·(lr − lr_min)·(1 + cos(π·t'/decay))
                  else:       lr_min
"""

from __future__ import annotations

import jax.numpy as jnp


def build_schedule(lr, lr_min, warmup_steps, warmup_lr_init, decay_steps):
    """Returns step -> learning-rate callable (optax schedule)."""
    lr = float(lr)
    lr_min = float(lr_min)
    warmup_steps = int(warmup_steps)
    decay_steps = int(decay_steps)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        if warmup_steps > 0:
            warm = warmup_lr_init + step * (lr - warmup_lr_init) / warmup_steps
        else:
            warm = jnp.asarray(lr, jnp.float32)
        t = jnp.maximum(step - warmup_steps, 0.0)
        frac = jnp.clip(t / max(decay_steps, 1), 0.0, 1.0)
        cos = lr_min + 0.5 * (lr - lr_min) * (1.0 + jnp.cos(jnp.pi * frac))
        decayed = jnp.where(t < decay_steps, cos, lr_min)
        return jnp.where(step < warmup_steps, warm, decayed)

    return schedule


def build_scheduler(num_epoch, iters_per_epoch, lr, lr_min, warmup_steps,
                    warmup_lr_init, decay_steps=None):
    """Reference build_scheduler signature semantics (lr_scheduler.py:3-10):
    decay_steps defaults to num_epoch · iters_per_epoch."""
    if decay_steps is None:
        decay_steps = num_epoch * iters_per_epoch
    return build_schedule(lr, lr_min, warmup_steps, warmup_lr_init, decay_steps)

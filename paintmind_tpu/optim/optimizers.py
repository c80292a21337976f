"""Optimizer builders (optax) matching the reference's choices.

  * Adam(betas=(0.9, 0.99)) — stage-1 G and D optimizers (trainer.py:103-104)
  * AdamW(betas=(0.9, 0.96), wd=0.05) — stage-2 option (trainer.py:336)
  * Lion — stage-2 default (trainer.py:334, optim/lion.py:20-83); optax.lion
    implements the same sign-momentum update with decoupled weight decay
    p ← p·(1 − lr·wd) − lr·sign(β1·m + (1−β1)·g).

Every builder takes a schedule (or float) and an optional max_grad_norm,
applied as global-norm clipping before the update — mirroring
``accelerator.clip_grad_norm_`` at sync points (trainer.py:197-198).
"""

from __future__ import annotations

import optax


def _with_clip(tx, max_grad_norm):
    if max_grad_norm is None:
        return tx
    return optax.chain(optax.clip_by_global_norm(max_grad_norm), tx)


def adam(learning_rate, betas=(0.9, 0.99), max_grad_norm=None):
    return _with_clip(optax.adam(learning_rate, b1=betas[0], b2=betas[1]),
                      max_grad_norm)


def adamw(learning_rate, betas=(0.9, 0.96), weight_decay=0.05,
          max_grad_norm=None):
    return _with_clip(
        optax.adamw(learning_rate, b1=betas[0], b2=betas[1],
                    weight_decay=weight_decay),
        max_grad_norm)


def lion(learning_rate, betas=(0.9, 0.99), weight_decay=0.0,
         max_grad_norm=None):
    return _with_clip(
        optax.lion(learning_rate, b1=betas[0], b2=betas[1],
                   weight_decay=weight_decay),
        max_grad_norm)

"""SwiGLU feed-forward.

Functional equivalent of the reference SwiGLUFFN / SwiGLUFFNFused
(paintmind/modules/mlp.py:13-59): a fused input projection ``w12`` producing
2*hidden features, split, ``silu(x1) * x2``, output projection ``w3``.
``SwiGLUFFNFused`` rescales the requested hidden width by 2/3 rounded up to a
multiple of 8 (mlp.py:53); we keep that exact rule so parameter shapes match
reference checkpoints, then round nothing further — the resulting widths
(e.g. 1368 for mlp_dim=2048) are handled fine by the MXU since the matmul M/K
dims stay large.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .core import init_linear, linear


def swiglu_hidden_dim(mlp_dim: int) -> int:
    # (reference mlp.py:53)
    return (int(mlp_dim * 2 / 3) + 7) // 8 * 8


def init_swiglu(key, dim, mlp_dim, *, out_dim=None, param_dtype=jnp.float32):
    hidden = swiglu_hidden_dim(mlp_dim)
    out_dim = out_dim or dim
    k1, k2 = jax.random.split(key)
    return {
        'w12': init_linear(k1, dim, 2 * hidden, bias=True, param_dtype=param_dtype),
        'w3': init_linear(k2, hidden, out_dim, bias=True, param_dtype=param_dtype),
    }


def swiglu(p, x):
    x12 = linear(p['w12'], x)
    x1, x2 = jnp.split(x12, 2, axis=-1)
    return linear(p['w3'], jax.nn.silu(x1) * x2)

"""Multi-head (self/cross) attention with a pluggable compute backend.

Functional equivalent of the reference attention pair
(paintmind/modules/attention.py:25-108): q/k/v projections without bias,
output projection with bias + dropout; when ``context`` is None the module
degrades to self-attention (reference attention.py:47 ``default(context, x)``)
— this matters for classifier-free/unconditional passes in stage 2, where the
cross-attention sublayer becomes a second self-attention.

Backends:
  * ``xla``   — plain einsum attention; XLA fuses it well at these sizes.
  * ``flash`` — Pallas blockwise flash-attention kernel (ops/flash_attention),
                the TPU-native replacement for xformers'
                ``memory_efficient_attention`` (reference attention.py:100).
  * ``auto``  — flash on TPU when shapes are tile-compatible, else xla.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .core import dropout as _dropout
from .core import init_linear, linear

_BACKEND = 'auto'


def set_attention_backend(name: str):
    """Globally select 'auto' | 'xla' | 'flash'."""
    global _BACKEND
    assert name in ('auto', 'xla', 'flash'), name
    _BACKEND = name


def get_attention_backend() -> str:
    return _BACKEND


@functools.cache
def _default_is_tpu() -> bool:
    try:
        return jax.default_backend() == 'tpu'
    except Exception:
        return False


def init_attention(key, query_dim, *, context_dim=None, heads=8, dim_head=64,
                   param_dtype=jnp.float32):
    inner = heads * dim_head
    context_dim = query_dim if context_dim is None else context_dim
    ks = jax.random.split(key, 4)
    return {
        'to_q': init_linear(ks[0], query_dim, inner, bias=False, param_dtype=param_dtype),
        'to_k': init_linear(ks[1], context_dim, inner, bias=False, param_dtype=param_dtype),
        'to_v': init_linear(ks[2], context_dim, inner, bias=False, param_dtype=param_dtype),
        'to_out': init_linear(ks[3], inner, query_dim, bias=True, param_dtype=param_dtype),
    }


def _xla_attention(q, k, v, scale):
    """(B, N, H, D) x (B, M, H, D) -> (B, N, H, D); softmax in fp32."""
    logits = jnp.einsum('bnhd,bmhd->bhnm', q * scale, k,
                        preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum('bhnm,bmhd->bnhd', probs, v)


def _flash_ok(q, k):
    b, n, h, d = q.shape
    m = k.shape[1]
    # the kernel pads ragged query/key tails; below these sizes the padding
    # overhead outweighs the fusion win
    return d <= 128 and n >= 128 and m >= 16


def attention_cfg_halves(p, x, context, *, heads, backend=None):
    """Cross-attention for a CFG-fused batch: ``x`` is (2B, N, Dq) holding
    [conditional; unconditional] halves, ``context`` is (B, M, Dc).

    The first B rows attend to ``context``; the last B rows self-attend
    (the ``context=None`` semantics of the trained unconditional branch,
    reference attention.py:47).  Q and output projections run batched at
    2B on the MXU; only the K/V projections and the attention itself split
    into their two genuinely different shapes — identical math and FLOPs
    to two separate passes, with the heavy matmuls at double batch.
    Deterministic (sampling path): no dropout."""
    b2, n, _ = x.shape
    b = b2 // 2
    q = linear(p['to_q'], x)
    xu = x[b:]
    ctx = context.astype(x.dtype)
    k_c, v_c = linear(p['to_k'], ctx), linear(p['to_v'], ctx)
    k_u, v_u = linear(p['to_k'], xu), linear(p['to_v'], xu)

    dim_head = q.shape[-1] // heads
    scale = dim_head ** -0.5
    q = q.reshape(b2, n, heads, dim_head)
    m = ctx.shape[1]
    k_c = k_c.reshape(b, m, heads, dim_head)
    v_c = v_c.reshape(b, m, heads, dim_head)
    k_u = k_u.reshape(b, n, heads, dim_head)
    v_u = v_u.reshape(b, n, heads, dim_head)

    backend = backend or _BACKEND
    if backend == 'auto':
        backend = 'flash' if (_default_is_tpu() and _flash_ok(q, k_u)) else 'xla'
    if backend == 'flash':
        from ..ops.flash_attention import flash_attention
        out_c = flash_attention(q[:b], k_c, v_c, scale=scale)
        out_u = flash_attention(q[b:], k_u, v_u, scale=scale)
    else:
        out_c = _xla_attention(q[:b], k_c, v_c, scale)
        out_u = _xla_attention(q[b:], k_u, v_u, scale)

    out = jnp.concatenate([out_c, out_u], axis=0).reshape(b2, n,
                                                          heads * dim_head)
    return linear(p['to_out'], out)


def attention(p, x, context=None, *, heads, dropout_rate=0.0, key=None,
              deterministic=True, backend=None):
    """x: (B, N, Dq); context: (B, M, Dc) or None (self-attention).

    Deliberately three separate q/k/v matmuls: a packed (D, 3·H·Dh)
    projection was measured SLOWER on v5e (−5% at B=32, −8% at B=64 full
    forward — the per-layer weight concat inside the scanned stack
    materializes and outweighs the wider-N matmul; see BASELINE.md)."""
    b, n, _ = x.shape
    ctx = x if context is None else context
    q = linear(p['to_q'], x)
    k = linear(p['to_k'], ctx)
    v = linear(p['to_v'], ctx)
    dim_head = q.shape[-1] // heads
    q = q.reshape(b, n, heads, dim_head)
    k = k.reshape(b, ctx.shape[1], heads, dim_head)
    v = v.reshape(b, ctx.shape[1], heads, dim_head)
    scale = dim_head ** -0.5

    backend = backend or _BACKEND
    if backend == 'auto':
        backend = 'flash' if (_default_is_tpu() and _flash_ok(q, k)) else 'xla'

    if backend == 'flash':
        from ..ops.flash_attention import flash_attention
        out = flash_attention(q, k, v, scale=scale)
    else:
        out = _xla_attention(q, k, v, scale)

    out = out.reshape(b, n, heads * dim_head)
    out = linear(p['to_out'], out)
    return _dropout(out, dropout_rate, key=key, deterministic=deterministic)

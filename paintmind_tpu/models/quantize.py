"""Vector quantizer with l2-normalized codebook.

Functional equivalent of the reference VectorQuantizer
(paintmind/stage1/quantize.py:8-44): inputs and codebook rows are
l2-normalized, nearest neighbor by squared distance, commitment loss
``beta*mean((sg[z_q]-z)^2) + mean((z_q-sg[z])^2)`` with beta=0.25, and a
straight-through estimator ``z_q = z + sg(z_q - z)``.

TPU-native detail: with both sides l2-normalized, ``argmin_j ||z - e_j||^2``
equals ``argmax_j z·e_j`` exactly, so the lookup is a single
(B·L, n_embed) matmul + argmax — MXU-shaped — instead of materializing the
expanded distance (reference quantize.py:24-28).  A fused Pallas
matmul+argmax kernel (ops/vq_lookup) avoids writing the (B·L, 8192) score
matrix to HBM; the plain-XLA path below is the fallback and the CPU test
path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def l2norm(x, eps=1e-12):
    # torch F.normalize semantics: x / max(||x||_2, eps)
    n = jnp.sqrt(jnp.sum(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True))
    return (x.astype(jnp.float32) / jnp.maximum(n, eps)).astype(x.dtype)


def init_quantizer(key, n_embed, embed_dim, param_dtype=jnp.float32):
    # reference: embedding.weight.data.normal_() — unit normal init
    return {'codebook': jax.random.normal(key, (n_embed, embed_dim), param_dtype)}


def nearest_codes(codebook_norm, z_norm, *, backend='auto'):
    """argmax_j z·e_j over the codebook. z_norm: (..., D)."""
    if backend in ('auto', 'fused'):
        try:
            from ..ops.vq_lookup import fused_nearest_codes
            if backend == 'fused' or jax.default_backend() == 'tpu':
                return fused_nearest_codes(z_norm, codebook_norm)
        except Exception:
            if backend == 'fused':
                raise
    sim = jnp.einsum('...d,nd->...n', z_norm, codebook_norm,
                     preferred_element_type=jnp.float32)
    return jnp.argmax(sim, axis=-1).astype(jnp.int32)


def quantize(p, z, beta=0.25, *, backend='auto'):
    """Returns (z_q with STE, commitment loss, indices)."""
    z = l2norm(z)
    e = l2norm(p['codebook'].astype(z.dtype))
    indices = nearest_codes(e, z, backend=backend)
    z_q = jnp.take(e, indices, axis=0)
    zf, qf = z.astype(jnp.float32), z_q.astype(jnp.float32)
    loss = (beta * jnp.mean(jnp.square(jax.lax.stop_gradient(qf) - zf))
            + jnp.mean(jnp.square(qf - jax.lax.stop_gradient(zf))))
    z_q = z + jax.lax.stop_gradient(z_q - z)
    return z_q, loss, indices


def decode_from_indice(p, indices):
    # (reference quantize.py:40-44): embed then l2-normalize
    return jnp.take(l2norm(p['codebook']), indices, axis=0)

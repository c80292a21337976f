"""Functional building blocks: linear, layernorm, initializers, dtype policy.

Design: parameters are plain pytrees (nested dicts of jnp arrays), every
module is an ``init_*`` function returning a param tree plus a pure apply
function.  This keeps the whole model a transparent pytree — trivial to
shard with jax.sharding, to checkpoint with orbax, and to map from the
reference's torch state_dicts.

Numerics policy: parameters are stored in ``param_dtype`` (fp32 by default);
apply functions compute in the dtype of the incoming activations, except
LayerNorm statistics and softmax which always run in fp32 (TPU-safe bf16
training).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Initializers (parity with the reference init scheme:
# paintmind/stage1/layers.py:94-104 — xavier-uniform Linear kernels, zero
# biases, unit LayerNorm scale).
# ---------------------------------------------------------------------------

xavier_uniform = jax.nn.initializers.xavier_uniform()
# torch Conv2d default (kaiming_uniform(a=sqrt(5))) is uniform(+-1/sqrt(fan_in));
# variance_scaling(1/3, fan_in, uniform) has the same bound.
conv_default = jax.nn.initializers.variance_scaling(1.0 / 3.0, 'fan_in', 'uniform')


def normal_init(key, shape, std=1.0, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype) * jnp.asarray(std, dtype)


# ---------------------------------------------------------------------------
# Linear
# ---------------------------------------------------------------------------

def init_linear(key, in_dim, out_dim, *, bias=True, init=xavier_uniform,
                param_dtype=jnp.float32):
    """Kernel layout is (in, out) — JAX convention; the torch converter
    transposes (reference Linear weights are (out, in))."""
    p = {'kernel': init(key, (in_dim, out_dim), param_dtype)}
    if bias:
        p['bias'] = jnp.zeros((out_dim,), param_dtype)
    return p


def linear(p, x):
    from .quant import is_quantized, linear_q
    if is_quantized(p):  # int8 (nn/quant.py) — inference only
        return linear_q(p, x)
    kernel = p['kernel'].astype(x.dtype)
    y = jnp.dot(x, kernel, preferred_element_type=x.dtype)
    if 'bias' in p:
        y = y + p['bias'].astype(x.dtype)
    return y


# ---------------------------------------------------------------------------
# LayerNorm (elementwise affine, eps identical to torch default 1e-5)
# ---------------------------------------------------------------------------

def init_layernorm(dim, param_dtype=jnp.float32):
    return {'scale': jnp.ones((dim,), param_dtype),
            'bias': jnp.zeros((dim,), param_dtype)}


def layernorm(p, x, eps=1e-5):
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * p['scale'].astype(jnp.float32) + p['bias'].astype(jnp.float32)
    return y.astype(dtype)


# ---------------------------------------------------------------------------
# RMSNorm (for the T5 text encoder; torch T5LayerNorm semantics: no mean
# subtraction, scale only, computed in fp32)
# ---------------------------------------------------------------------------

def init_rmsnorm(dim, param_dtype=jnp.float32):
    return {'scale': jnp.ones((dim,), param_dtype)}


def rmsnorm(p, x, eps=1e-6):
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
    y = x32 * jax.lax.rsqrt(var + eps)
    return (y * p['scale'].astype(jnp.float32)).astype(dtype)


# ---------------------------------------------------------------------------
# Dropout
# ---------------------------------------------------------------------------

def dropout(x, rate, *, key=None, deterministic=True):
    if deterministic or rate == 0.0 or key is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))

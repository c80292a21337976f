"""Pre-LN transformer blocks and scanned stacks.

Functional equivalents of the reference blocks:
  * stage-1 ``Layer`` (paintmind/stage1/layers.py:40-63):
      ``x = attn(ln1(x)) + x; x = swiglu(ln2(x)) + x``
  * stage-2 ``Layer`` (paintmind/stage2/transformer.py:28-49):
      self-attn, cross-attn (context), swiglu — and when context is None the
      cross sublayer self-attends, matching the reference's
      ``default(context, x)`` semantics used for unconditional passes.

TPU-first choices: layer parameters are stacked along a leading depth axis
and the stack runs as a single ``lax.scan`` — one compiled block body
regardless of depth (fast compiles, and a natural remat boundary for
``jax.checkpoint``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .attention import attention, init_attention
from .core import init_layernorm, layernorm
from .mlp import init_swiglu, swiglu


def init_block(key, dim, *, dim_head, mlp_dim, num_head, cross=False,
               context_dim=None, param_dtype=jnp.float32):
    ks = jax.random.split(key, 3)
    p = {
        'norm1': init_layernorm(dim, param_dtype),
        'attn1': init_attention(ks[0], dim, heads=num_head, dim_head=dim_head,
                                param_dtype=param_dtype),
        'norm2': init_layernorm(dim, param_dtype),
        'ffnet': init_swiglu(ks[2], dim, mlp_dim, param_dtype=param_dtype),
    }
    if cross:
        p['attn2'] = init_attention(ks[1], dim, context_dim=context_dim,
                                    heads=num_head, dim_head=dim_head,
                                    param_dtype=param_dtype)
        p['norm3'] = init_layernorm(dim, param_dtype)
    return p


def block_apply(p, x, context=None, *, heads, dropout_rate=0.0, key=None,
                deterministic=True, backend=None, cfg_halves=False):
    has_cross = 'attn2' in p
    if key is not None:
        k1, k2, k3 = jax.random.split(key, 3)
    else:
        k1 = k2 = k3 = None
    x = x + attention(p['attn1'], layernorm(p['norm1'], x), heads=heads,
                      dropout_rate=dropout_rate, key=k1,
                      deterministic=deterministic, backend=backend)
    if has_cross:
        if cfg_halves and context is not None:
            # x is a [cond; uncond] 2B batch; see attention_cfg_halves
            from .attention import attention_cfg_halves
            x = x + attention_cfg_halves(p['attn2'], layernorm(p['norm2'], x),
                                         context, heads=heads, backend=backend)
        else:
            x = x + attention(p['attn2'], layernorm(p['norm2'], x), context,
                              heads=heads, dropout_rate=dropout_rate, key=k2,
                              deterministic=deterministic, backend=backend)
        x = x + swiglu(p['ffnet'], layernorm(p['norm3'], x))
    else:
        x = x + swiglu(p['ffnet'], layernorm(p['norm2'], x))
    return x


def init_stack(key, depth, dim, *, dim_head, mlp_dim, num_head, cross=False,
               context_dim=None, param_dtype=jnp.float32):
    """Stacked block params: every leaf gets a leading ``depth`` axis."""
    keys = jax.random.split(key, depth)
    init_one = functools.partial(init_block, dim=dim, dim_head=dim_head,
                                 mlp_dim=mlp_dim, num_head=num_head,
                                 cross=cross, context_dim=context_dim,
                                 param_dtype=param_dtype)
    return jax.vmap(init_one)(keys)


def stack_apply(p, x, context=None, *, heads, dropout_rate=0.0, key=None,
                deterministic=True, backend=None, remat=False, unroll=1,
                cfg_halves=False, act_sharding=None):
    """``act_sharding`` (optional NamedSharding for the (B, N, D) hidden
    state): constrains the scan carry between blocks — e.g. sequence
    parallelism, sharding N over the 'model' axis for long sequences
    (512² → 4096 tokens); XLA inserts the all-gather/reduce-scatter
    collectives around the attention/matmul ops that need other layouts."""
    depth = jax.tree_util.tree_leaves(p)[0].shape[0]
    keys = jax.random.split(key, depth) if key is not None else None

    def body(carry, layer):
        if keys is None:
            layer_p, layer_key = layer, None
        else:
            layer_p, layer_key = layer
        y = block_apply(layer_p, carry, context, heads=heads,
                        dropout_rate=dropout_rate, key=layer_key,
                        deterministic=deterministic, backend=backend,
                        cfg_halves=cfg_halves)
        if act_sharding is not None:
            y = jax.lax.with_sharding_constraint(y, act_sharding)
        return y, None

    if remat:
        body = jax.checkpoint(body, prevent_cse=False)
    xs = p if keys is None else (p, keys)
    x, _ = jax.lax.scan(body, x, xs, unroll=unroll)
    return x

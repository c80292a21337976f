"""Pallas TPU fused MaskGIT sampling head.

The sampler's per-step cost is dominated not by the transformer but by the
ops over the (B·L, 8192) logits tensor: ``lax.top_k`` (sort-based, slow on
TPU), a full softmax, a gumbel-noise argmax, and a gather — each a separate
HBM round trip over ~256 MB (reference math: generate.py:159-181).  This
kernel reads the logits once and produces, per row:

  * ``pred`` — gumbel sample over the top-k filtered, temperature-scaled
    logits (top-k by value threshold: k iterative maxes; with distinct
    float logits this equals the reference's count-based top-k)
  * ``conf`` — softmax probability of the sampled id under the ORIGINAL
    logits (the re-mask confidence, generate.py:170-172)

Randomness comes from the on-core PRNG (pltpu.prng_random_bits) seeded per
(jax key, block) — deterministic for a fixed key, but a different stream
than jax.random: bit-exact parity with the XLA path is not expected, only
distributional equivalence (tested).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _sample_kernel(seed_ref, temp_ref, logits_ref, pred_ref, conf_ref, *, k):
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    l = logits_ref[:].astype(jnp.float32)  # (BT, V)

    # logsumexp for confidence
    row_max = jnp.max(l, axis=-1, keepdims=True)
    lse = jnp.log(jnp.sum(jnp.exp(l - row_max), axis=-1, keepdims=True))

    # top-k threshold by k iterative maxes
    thr = row_max
    for _ in range(k - 1):
        thr = jnp.max(jnp.where(l < thr, l, NEG_INF), axis=-1, keepdims=True)

    # gumbel noise from on-core PRNG; bitcast first — prng_random_bits
    # yields signed int32 and an arithmetic shift would fold the sign bit
    # into the uniform (halving the noise and biasing toward argmax)
    bits = pltpu.bitcast(pltpu.prng_random_bits(l.shape), jnp.uint32)
    # logical-shift to 24 bits, then view as int32 (top bits zero) since
    # Mosaic lacks a uint32→f32 cast
    u = pltpu.bitcast(bits >> 8, jnp.int32).astype(jnp.float32) * (2.0 ** -24)
    g = -jnp.log(-jnp.log(jnp.maximum(u, 1e-20)))

    temp = jnp.maximum(temp_ref[0], 1e-10)
    masked = jnp.where(l >= thr, l / temp + g, NEG_INF)
    pred = jnp.argmax(masked, axis=-1).astype(jnp.int32)[:, None]

    picked = jnp.max(jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, l.shape, 1) == pred, l, NEG_INF),
        axis=-1, keepdims=True)
    conf = jnp.exp(picked - row_max - lse)

    pred_ref[:] = pred
    conf_ref[:] = conf


@functools.partial(jax.jit, static_argnames=('k',))
def fused_gumbel_topk_sample(logits, key, temperature, k=5):
    """logits: (..., V) fp32/bf16; key: jax PRNG key; temperature: scalar.
    Returns (pred int32 (...,), conf fp32 (...,))."""
    shape = logits.shape[:-1]
    v = logits.shape[-1]
    t = 1
    for s in shape:
        t *= s
    l2 = logits.reshape(t, v)

    block_t = 64
    t_pad = -(-max(t, 8) // block_t) * block_t
    if t_pad != t:
        l2 = jnp.pad(l2, [(0, t_pad - t), (0, 0)])

    seed = jax.random.bits(key, (1,), jnp.uint32).astype(jnp.int32)
    temp = jnp.asarray(temperature, jnp.float32).reshape(1)

    pred, conf = pl.pallas_call(
        functools.partial(_sample_kernel, k=k),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(t_pad // block_t,),
            in_specs=[
                pl.BlockSpec((block_t, v), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((block_t, 1), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block_t, 1), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((t_pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((t_pad, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=8 * t_pad * v, bytes_accessed=t_pad * v * 4,
            transcendentals=2 * t_pad * v),
    )(seed, temp, l2)
    return pred[:t, 0].reshape(shape), conf[:t, 0].reshape(shape)

"""Pallas TPU fused MaskGIT sampling head.

The sampler's per-step cost is dominated not by the transformer but by the
ops over the (B·L, 8192) logits tensor: ``lax.top_k`` (sort-based, slow on
TPU), a full softmax, a gumbel-noise argmax, and a gather — each a separate
HBM round trip over ~256 MB (reference math: generate.py:159-181).  This
kernel reads the logits once and produces, per row:

  * ``pred`` — gumbel sample over the top-k filtered, temperature-scaled
    logits.  Exactly k candidates survive the filter even with duplicated
    logit values (common on the bf16 logits path): see ``topk_keep_mask``
    — exact count-based top-k with lowest-index tie preference, identical
    membership to torch.topk / lax.top_k for every input dtype.
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
_INTERPRET = False  # flip for CPU interpreter tests (trace-time, per shape)


def topk_keep_mask(l, k):
    """Boolean (..., V) mask keeping exactly the k largest entries per row,
    ties broken toward lower index (count-based top-k order, matching both
    the reference's torch.topk and lax.top_k tie preference).

    Pure VPU math (usable inside the kernel and directly under jnp for CPU
    tests), exact for every dtype — no epsilon perturbation:
      1. k-th order statistic by iterative distinct-max, stopping the
         per-row descent once the ≥-threshold count reaches k (duplicates
         at the boundary would otherwise over-admit — the ADVICE r1 bug);
      2. among entries equal to the threshold, keep the lowest
         ``k - (strictly greater count)`` integer indices via an iterative
         min over an index field (integer compares: no rounding, so genuine
         value order is never perturbed)."""
    thr = jnp.max(l, axis=-1, keepdims=True)
    cnt = jnp.sum((l >= thr).astype(jnp.int32), axis=-1, keepdims=True)
    for _ in range(k - 1):
        nxt = jnp.max(jnp.where(l < thr, l, NEG_INF), axis=-1, keepdims=True)
        thr = jnp.where(cnt < k, nxt, thr)
        cnt = jnp.sum((l >= thr).astype(jnp.int32), axis=-1, keepdims=True)

    gt = l > thr
    need = k - jnp.sum(gt.astype(jnp.int32), axis=-1, keepdims=True)  # >= 1
    eq = l == thr
    big = jnp.int32(2 ** 30)
    col = jax.lax.broadcasted_iota(jnp.int32, l.shape, len(l.shape) - 1)
    idx = jnp.where(eq, col, big)
    cut = jnp.min(idx, axis=-1, keepdims=True)
    for i in range(1, k):
        nxt = jnp.min(jnp.where(idx > cut, idx, big), axis=-1, keepdims=True)
        cut = jnp.where(i < need, nxt, cut)
    return gt | (eq & (col <= cut))


def _sample_kernel(seed_ref, logits_ref, temp_ref, pred_ref, conf_ref, *, k):
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    l = logits_ref[:].astype(jnp.float32)  # (BT, V)

    # logsumexp for confidence
    row_max = jnp.max(l, axis=-1, keepdims=True)
    lse = jnp.log(jnp.sum(jnp.exp(l - row_max), axis=-1, keepdims=True))

    keep = topk_keep_mask(l, k)

    # gumbel noise from on-core PRNG; bitcast first — prng_random_bits
    # yields signed int32 and an arithmetic shift would fold the sign bit
    # into the uniform (halving the noise and biasing toward argmax)
    bits = pltpu.bitcast(pltpu.prng_random_bits(l.shape), jnp.uint32)
    # logical-shift to 24 bits, then view as int32 (top bits zero) since
    # Mosaic lacks a uint32→f32 cast
    u = pltpu.bitcast(bits >> 8, jnp.int32).astype(jnp.float32) * (2.0 ** -24)
    g = -jnp.log(-jnp.log(jnp.maximum(u, 1e-20)))

    temp = jnp.maximum(temp_ref[:], 1e-10)  # (BT, 1), broadcasts over V
    masked = jnp.where(keep, l / temp + g, NEG_INF)
    pred = jnp.argmax(masked, axis=-1).astype(jnp.int32)[:, None]

    picked = jnp.max(jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, l.shape, 1) == pred, l, NEG_INF),
        axis=-1, keepdims=True)
    conf = jnp.exp(picked - row_max - lse)

    pred_ref[:] = pred
    conf_ref[:] = conf


def fused_gumbel_topk_sample(logits, key, temperature, k=5):
    """logits: (..., V) fp32/bf16; key: jax PRNG key; temperature: scalar
    or per-sample (B,) vector (B = logits.shape[0]) — per-sample values let
    the serving engine coalesce requests that differ only in temperature.
    Returns (pred int32 (...,), conf fp32 (...,)).

    Under an active mesh (parallel.context) the kernel is shard_mapped with
    the batch on the 'data' axis (XLA cannot partition a pallas_call and
    would otherwise all-gather the logits and replicate the kernel); each
    shard folds its data-axis index into the PRNG key so gumbel noise stays
    independent across shards."""
    temperature = jnp.asarray(temperature, jnp.float32)
    from ..parallel.context import active_mesh
    mesh = active_mesh()
    if mesh is not None and logits.ndim >= 2:
        from jax.sharding import PartitionSpec as P
        dp = mesh.shape.get('data', 1)
        if dp > 1 and logits.shape[0] % dp == 0:
            spec_l = P('data', *([None] * (logits.ndim - 1)))
            spec_o = P('data', *([None] * (logits.ndim - 2)))
            spec_t = P() if temperature.ndim == 0 else P('data')

            def body(l_, key_, t_):
                key_ = jax.random.fold_in(key_, jax.lax.axis_index('data'))
                return _fused_gumbel_topk_sample(l_, key_, t_, k=k)

            fn = jax.shard_map(body, mesh=mesh,
                               in_specs=(spec_l, P(), spec_t),
                               out_specs=(spec_o, spec_o), check_vma=False)
            return fn(logits, key, temperature)
    return _fused_gumbel_topk_sample(logits, key, temperature, k=k)


@functools.partial(jax.jit, static_argnames=('k',))
def _fused_gumbel_topk_sample(logits, key, temperature, k=5):
    shape = logits.shape[:-1]
    v = logits.shape[-1]
    t = 1
    for s in shape:
        t *= s
    l2 = logits.reshape(t, v)

    temperature = jnp.asarray(temperature, jnp.float32)
    if temperature.ndim == 0:
        temp = jnp.full((t, 1), temperature, jnp.float32)
    else:  # (B,) per-sample → per-row over the flattened (B·L,) rows
        temp = jnp.broadcast_to(
            temperature.reshape(-1, *([1] * (len(shape) - 1))),
            shape).reshape(t, 1)

    block_t = 64
    t_pad = -(-max(t, 8) // block_t) * block_t
    if t_pad != t:
        l2 = jnp.pad(l2, [(0, t_pad - t), (0, 0)])
        temp = jnp.pad(temp, [(0, t_pad - t), (0, 0)], constant_values=1.0)

    seed = jax.random.bits(key, (1,), jnp.uint32).astype(jnp.int32)

    pred, conf = pl.pallas_call(
        functools.partial(_sample_kernel, k=k),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(t_pad // block_t,),
            in_specs=[
                pl.BlockSpec((block_t, v), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block_t, 1), lambda i, *_: (i, 0),
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
        interpret=_INTERPRET,
    )(seed, l2, temp)
    return pred[:t, 0].reshape(shape), conf[:t, 0].reshape(shape)

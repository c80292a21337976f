"""Pallas TPU flash attention (non-causal, self or cross).

TPU-native replacement for xformers' ``memory_efficient_attention``
(reference paintmind/modules/attention.py:100).  The PaintMind workloads are
fixed, short sequences — 1024 image tokens and 77 text tokens
(SURVEY.md §2.4) — so the kernel keeps the full K/V for one (batch, head) in
VMEM and blocks only over queries: attention logits never touch HBM, softmax
runs in fp32 on the VPU, and both matmuls land on the MXU.

Layout: inputs are transposed to (B, H, N, D) so each block's trailing dims
are (block_q, D) with D equal to the full minor dimension — the layout the
Mosaic lowering requires; XLA fuses the transposes into the surrounding
projection reshapes.

Backward: a dedicated Pallas kernel recomputes the (N, M) probabilities for
one (batch, head) entirely in VMEM and produces dq/dk/dv with four MXU
matmuls — attention probabilities never hit HBM in either direction.  Set
``_BWD_IMPL = 'xla'`` to fall back to differentiating the einsum reference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
_BLOCK_Q = 512  # queries per program; tunable
_INTERPRET = False  # pallas interpreter mode (CPU testing of kernel logic)


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, kv_len, block_q):
    # q_ref: (1, 1, BLOCK_Q, D); k_ref/v_ref: (1, 1, M_pad, D)
    # keep q/k in their input dtype (bf16 on the fast path) so the MXU runs
    # native bf16 passes; accumulate and scale in fp32
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    logits = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32) * scale
    m_pad = k.shape[0]
    if kv_len < m_pad:
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(col < kv_len, logits, NEG_INF)
    logits = logits - jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o_ref[0, 0] = jnp.dot(p.astype(v.dtype), v,
                          preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _round_up(x, m):
    return (x + m - 1) // m * m


@functools.partial(jax.jit, static_argnames=('scale',))
def _flash_forward(q, k, v, scale):
    b, n, h, d = q.shape
    m = k.shape[1]
    m_pad = _round_up(m, 128)
    if m_pad != m:
        pad = [(0, 0), (0, m_pad - m), (0, 0), (0, 0)]
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
    # long-KV sequences: shrink the query block so the (block_q, M) fp32
    # logits tile leaves VMEM room for pipelining — kernel microbench on
    # v5e at M=4096: block 256 ≈ 25% faster than 512 (they tie at M≤1536;
    # the 512px sampler end-to-end is matmul-bound so its gain is ~0)
    block_cap = _BLOCK_Q if m_pad <= 1536 else min(_BLOCK_Q, 256)
    block_q = min(_round_up(n, 128), block_cap)
    n_pad = _round_up(n, block_q)  # pad tail queries; sliced off below
    if n_pad != n:
        q = jnp.pad(q, [(0, 0), (0, n_pad - n), (0, 0), (0, 0)])
    # (B, N, H, D) -> (B, H, N, D)
    qf = q.transpose(0, 2, 1, 3)
    kf = k.transpose(0, 2, 1, 3)
    vf = v.transpose(0, 2, 1, 3)

    grid = (b, h, n_pad // block_q)

    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, kv_len=m, block_q=block_q),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, m_pad, d), lambda bi, hi, qi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, m_pad, d), lambda bi, hi, qi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, d),
                               lambda bi, hi, qi: (bi, hi, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, n_pad, d), q.dtype),
        interpret=_INTERPRET,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * n * m * d,
            bytes_accessed=(2 * b * n * h * d + 2 * b * m_pad * h * d) * q.dtype.itemsize,
            transcendentals=b * h * n * m,
        ),
    )(qf, kf, vf)
    return out.transpose(0, 2, 1, 3)[:, :n]


def _xla_reference(q, k, v, scale):
    logits = jnp.einsum('bnhd,bmhd->bhnm', q.astype(jnp.float32) * scale,
                        k.astype(jnp.float32))
    p = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum('bhnm,bmhd->bnhd', p, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash_attention(q, k, v, scale):
    return _flash_forward(q, k, v, scale)


def flash_attention(q, k, v, scale):
    """Public entry: shards the kernel over the active mesh when one is
    registered (batch → 'data', heads → 'model'; see parallel.context —
    XLA cannot partition a pallas_call and would otherwise all-gather the
    operands and replicate the kernel on every device).  Falls back to the
    plain call when no mesh is active or a dimension does not divide."""
    from ..parallel.context import active_mesh
    mesh = active_mesh()
    if mesh is not None:
        from jax.sharding import PartitionSpec as P
        dp = mesh.shape.get('data', 1)
        mp = mesh.shape.get('model', 1)
        b, _, h, _ = q.shape
        if b % dp == 0 and h % mp == 0:
            spec = P('data', None, 'model', None)
            fn = jax.shard_map(
                lambda q_, k_, v_: _flash_attention(q_, k_, v_, scale),
                mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
                check_vma=False)
            return fn(q, k, v)
    return _flash_attention(q, k, v, scale)


_BWD_IMPL = 'pallas'  # 'pallas' | 'xla'


def _bwd_kernel(q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref,
                dk_acc, dv_acc, *, scale, kv_len):
    # q/g blocks: (1, 1, BLOCK_Q, D); k/v: (1, 1, M_pad, D); grid is
    # (b, h, n/BLOCK_Q) with the query index innermost — dk/dv accumulate
    # across query blocks in fp32 VMEM scratch and are written on the last.
    qi = pl.program_id(2)
    n_qi = pl.num_programs(2)
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    g = g_ref[0, 0]
    m_pad = k.shape[0]

    @pl.when(qi == 0)
    def _():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    if kv_len < m_pad:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, NEG_INF)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    p = p / jnp.sum(p, axis=-1, keepdims=True)          # (BLOCK_Q, M) fp32
    pb = p.astype(q.dtype)

    dv_acc[:] += jax.lax.dot_general(                   # dv += p^T g
        pb, g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(g, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    delta = jnp.sum(p * dp, axis=-1, keepdims=True)
    ds = (p * (dp - delta) * scale).astype(q.dtype)      # (BLOCK_Q, M)
    dq_ref[0, 0] = jnp.dot(ds, k,
                           preferred_element_type=jnp.float32).astype(dq_ref.dtype)
    dk_acc[:] += jax.lax.dot_general(                   # dk += ds^T q
        ds, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(qi == n_qi - 1)
    def _():
        dk_ref[0, 0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[:].astype(dv_ref.dtype)


@functools.partial(jax.jit, static_argnames=('scale',))
def _flash_backward(q, k, v, g, scale):
    b, n_in, h, d = q.shape
    m = k.shape[1]
    m_pad = _round_up(m, 128)
    if m_pad != m:
        pad = [(0, 0), (0, m_pad - m), (0, 0), (0, 0)]
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
    # block queries so the (BLOCK_Q, M) prob/ds tiles fit in VMEM
    block_q = 512 if m_pad <= 1536 else (256 if m_pad <= 3072 else 128)
    block_q = min(block_q, _round_up(n_in, 128))
    n = _round_up(n_in, block_q)  # padded rows get zero cotangents
    if n != n_in:
        qpad = [(0, 0), (0, n - n_in), (0, 0), (0, 0)]
        q = jnp.pad(q, qpad)
        g = jnp.pad(g, qpad)
    qf, kf, vf, gf = (t.transpose(0, 2, 1, 3) for t in (q, k, v, g))

    spec_q = pl.BlockSpec((1, 1, block_q, d),
                          lambda bi, hi, qi: (bi, hi, qi, 0),
                          memory_space=pltpu.VMEM)
    spec_m = pl.BlockSpec((1, 1, m_pad, d), lambda bi, hi, qi: (bi, hi, 0, 0),
                          memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, kv_len=m),
        grid=(b, h, n // block_q),
        in_specs=[spec_q, spec_m, spec_m, spec_q],
        out_specs=[spec_q, spec_m, spec_m],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, n, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, m_pad, d), k.dtype),
            jax.ShapeDtypeStruct((b, h, m_pad, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((m_pad, d), jnp.float32),
            pltpu.VMEM((m_pad, d), jnp.float32),
        ],
        interpret=_INTERPRET,
        cost_estimate=pl.CostEstimate(
            flops=10 * b * h * n * m_pad * d,
            bytes_accessed=(4 * b * n * h * d + 4 * b * m_pad * h * d)
            * q.dtype.itemsize,
            transcendentals=b * h * n * m_pad,
        ),
    )(qf, kf, vf, gf)
    dq = dq.transpose(0, 2, 1, 3)[:, :n_in]
    dk = dk.transpose(0, 2, 1, 3)[:, :m]
    dv = dv.transpose(0, 2, 1, 3)[:, :m]
    return dq, dk, dv


def _fwd(q, k, v, scale):
    return _flash_forward(q, k, v, scale), (q, k, v)


def _bwd(scale, res, g):
    q, k, v = res
    if _BWD_IMPL == 'pallas':
        return _flash_backward(q, k, v, g, scale)
    _, vjp = jax.vjp(lambda q_, k_, v_: _xla_reference(q_, k_, v_, scale), q, k, v)
    return vjp(g)


_flash_attention.defvjp(_fwd, _bwd)

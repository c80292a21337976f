"""Int8 post-training quantization for linear layers (inference only).

TPU-first rationale: the v5e MXU datasheet runs s8 x s8 -> s32 matmuls at
twice the bf16 peak (~394 vs ~197 TOPS), and int8 kernels halve the HBM
bytes streamed per step.  The stage-2 sampler is compute-bound at batch 64
(BASELINE.md: ~92 TFLOPs effective bf16), so dynamic W8A8 is the remaining
throughput lever on hardware whose XLA exposes that double-rate path;
weight-only W8 targets the weight-streaming-bound small-batch serving
regime, whose HBM-byte halving is hardware-independent.  Whether a given
chip actually realizes the W8A8 win is a per-deployment measurement —
``tools/bench_int8.py`` is the A/B; on this repo's hosted v5e the int8
rate is NOT exposed (BASELINE.md calibration), so defaults stay bf16.

The reference has no quantization support (this is an extension); the
quantized pipeline keeps the reference's sampler semantics — only matmul
numerics change, which an FID/parity eval must (and does, tests +
tools/eval_generation.py) bound.

Two modes, chosen at *quantization time* and encoded in the param tree
structure itself:

  * ``w8``   — weight-only: ``{'kernel_q': int8 (in, out), 'scale': f32
    (out,)}``; apply dequantizes into the activation dtype (XLA fuses the
    convert into the matmul read) — bf16 MXU, half the weight bytes.
  * ``w8a8`` — adds a zero-size ``'dyn'`` marker leaf: activations are
    quantized per token (dynamic symmetric abs-max) and the matmul runs
    s8 x s8 -> s32 on the MXU, rescaled by (token scale x channel scale).

Encoding the mode in the tree structure (not a Python global) means the two
modes can never share a stale jit trace: pytree structure is part of every
jit cache key.  ``nn.core.linear`` dispatches here when it sees
``'kernel_q'``, so every linear consumer (attention projections, SwiGLU,
vocab head) picks the path up for free, including under ``lax.scan`` over
depth-stacked layer weights.

Quantization scheme: symmetric per-output-channel for weights (scale
``amax/127`` over the input axis, round-to-nearest-even, clip to ±127) and
symmetric per-token for activations.  Biases, norms, embeddings stay fp.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

QMODES = ('w8', 'w8a8')


def quantize_linear(p, mode='w8a8'):
    """Quantize one linear param dict ``{'kernel', ['bias']}``.

    Works on depth-stacked kernels too: the input axis is always ``-2``,
    so a ``(depth, in, out)`` stack gets per-``(depth, out)`` scales and
    stays a valid ``lax.scan`` operand.
    """
    assert mode in QMODES, mode
    w = jnp.asarray(p['kernel'], jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=-2, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    wq = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    out = {'kernel_q': wq, 'scale': jnp.squeeze(scale, axis=-2)}
    if mode == 'w8a8':
        # structural mode marker; zero-size, but keeps any leading stack
        # axes so the dict stays a valid lax.scan operand
        out['dyn'] = jnp.zeros(wq.shape[:-2] + (0,), jnp.int8)
    if 'bias' in p:
        out['bias'] = p['bias']
    return out


def dequantize_linear(p):
    """Inverse (up to rounding): quantized dict -> ``{'kernel', ['bias']}``."""
    w = p['kernel_q'].astype(jnp.float32) * p['scale'][..., None, :]
    out = {'kernel': w}
    if 'bias' in p:
        out['bias'] = p['bias']
    return out


def is_quantized(p) -> bool:
    return isinstance(p, dict) and 'kernel_q' in p


def linear_q(p, x):
    """Apply a quantized linear.  Mode comes from the tree structure."""
    wq, scale = p['kernel_q'], p['scale']
    if 'dyn' in p:
        # dynamic per-token activation quantization -> s8 x s8 -> s32 MXU
        x32 = x.astype(jnp.float32)
        ax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
        sx = jnp.maximum(ax, 1e-12) / 127.0
        xq = jnp.clip(jnp.round(x32 / sx), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            xq, wq, (((xq.ndim - 1,), (wq.ndim - 2,)), ((), ())),
            preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * sx * scale.astype(jnp.float32)
        y = y.astype(x.dtype)
    else:
        # weight-only: dequantize into the matmul's input dtype; the
        # per-output-channel scale commutes with the contraction so it is
        # applied to the (much smaller per-step) output instead
        y = jnp.dot(x, wq.astype(x.dtype),
                    preferred_element_type=x.dtype) * scale.astype(x.dtype)
    if 'bias' in p:
        y = y + p['bias'].astype(x.dtype)
    return y


def quantize_tree(params, mode='w8a8', *, min_dim=64, predicate=None):
    """Walk a param pytree; quantize every linear-like sub-dict.

    A node qualifies when it is a dict with a ``'kernel'`` array whose two
    trailing dims are both >= ``min_dim`` (skips tiny projections like the
    32->dim token embed, where quality risk outweighs negligible savings).
    ``predicate(path, node) -> bool`` further filters when given.
    """
    assert mode in QMODES, mode

    def walk(node, path):
        if isinstance(node, dict):
            if 'kernel' in node and hasattr(node['kernel'], 'shape'):
                k = node['kernel']
                if (k.ndim >= 2 and min(k.shape[-2:]) >= min_dim
                        and (predicate is None or predicate(path, node))):
                    return quantize_linear(node, mode)
            return {name: walk(v, path + (name,)) for name, v in node.items()}
        return node

    return walk(params, ())

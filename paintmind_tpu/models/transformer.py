"""Stage-2 conditional bidirectional transformer (MaskGIT backbone).

Functional equivalent of the reference CondTransformer
(paintmind/stage2/transformer.py:52-93): token_proj(32→dim) → learned
pos-embed → depth × {self-attn, cross-attn(context), SwiGLU} → LN →
to_logits(dim→n_embed).  No causal mask anywhere — fully bidirectional.
``context_proj`` exists only when context_dim != dim (transformer.py:58);
for paintmindv1 (dim=1024, t5-l dim=1024) it is the identity.

When ``context is None`` the cross-attention sublayers self-attend
(reference modules/attention.py:47) — the unconditional branch used for
classifier-free guidance.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..nn.core import init_layernorm, init_linear, layernorm, linear, normal_init
from ..nn.transformer import init_stack, stack_apply


@dataclasses.dataclass(frozen=True)
class CondTransformerConfig:
    in_dim: int = 32
    dim: int = 1024
    len_seq: int = 1024
    dim_head: int = 64
    mlp_dim: int = 4096
    num_head: int = 16
    depth: int = 12
    dropout: float = 0.1
    context_dim: int = 1024
    num_classes: int = 8192

    @property
    def has_context_proj(self):
        return self.context_dim != self.dim


def init_cond_transformer(key, cfg: CondTransformerConfig,
                          param_dtype=jnp.float32):
    ks = jax.random.split(key, 5)
    p = {
        'token_proj': init_linear(ks[0], cfg.in_dim, cfg.dim,
                                  param_dtype=param_dtype),
        'pos_embed': normal_init(ks[1], (1, cfg.len_seq, cfg.dim),
                                 std=cfg.dim ** -0.5, dtype=param_dtype),
        'layers': init_stack(ks[2], cfg.depth, cfg.dim, dim_head=cfg.dim_head,
                             mlp_dim=cfg.mlp_dim, num_head=cfg.num_head,
                             cross=True, context_dim=cfg.dim,
                             param_dtype=param_dtype),
        'norm': init_layernorm(cfg.dim, param_dtype),
        'to_logits': init_linear(ks[3], cfg.dim, cfg.num_classes,
                                 param_dtype=param_dtype),
    }
    if cfg.has_context_proj:
        p['context_proj'] = init_linear(ks[4], cfg.context_dim, cfg.dim,
                                        bias=False, param_dtype=param_dtype)
    return p


def head_project(p, h):
    """Vocab projection of a post-LN hidden state, in the activation dtype
    (fp32 accumulation inside the MXU); emitting bf16 logits halves HBM
    traffic for the (B·L, 8192) tensor — downstream softmax/CE/sampling all
    upcast to fp32 internally.  Routes through ``nn.core.linear`` so an
    int8-quantized head (nn/quant.py) is picked up transparently."""
    return linear(p['to_logits'], h)


def cond_transformer_apply(p, x, context=None, *, cfg: CondTransformerConfig,
                           key=None, deterministic=True, backend=None,
                           remat=False, cfg_halves=False, act_sharding=None,
                           return_hidden=False, unroll=1):
    """x: (B, len_seq, in_dim) latent tokens; context: (B, M, context_dim)
    or None.  Returns (B, len_seq, num_classes) logits (fp32), or the
    post-LN (B, len_seq, dim) hidden state when ``return_hidden`` — the CFG
    sampler mixes branch hiddens BEFORE the shared ``head_project``
    (guidance is affine in the logits, and the head is the same linear map
    for every branch, so the mix commutes with it; halves the vocab matmul).

    ``cfg_halves=True``: x is a [cond; uncond] 2B batch and context is (B,
    M, context_dim) — one fused CFG pass; the uncond half's cross-attention
    self-attends exactly as a separate ``context=None`` call would."""
    x = linear(p['token_proj'], x)
    x = x + p['pos_embed'].astype(x.dtype)
    if context is not None and 'context_proj' in p:
        context = linear(p['context_proj'], context.astype(x.dtype))
    elif context is not None:
        context = context.astype(x.dtype)
    x = stack_apply(p['layers'], x, context, heads=cfg.num_head,
                    dropout_rate=cfg.dropout, key=key,
                    deterministic=deterministic, backend=backend, remat=remat,
                    cfg_halves=cfg_halves, act_sharding=act_sharding,
                    unroll=unroll)
    x = layernorm(p['norm'], x)
    if return_hidden:
        return x
    return head_project(p, x)

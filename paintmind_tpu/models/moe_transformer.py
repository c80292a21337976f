"""MoE stage-2 transformer — the expert-parallel extension model family.

Same conditional bidirectional MaskGIT backbone as
``models.transformer.CondTransformer`` (reference stage2/transformer.py:
52-93) with every block's SwiGLU replaced by a routed expert pool
(nn/moe.py).  The reference has no MoE; this family exists to scale
stage-2 capacity past one chip's HBM *without* growing per-token FLOPs:
``num_experts`` experts per layer, ``num_selected`` active per token,
experts sharded over the mesh 'model' axis (expert parallelism) while
attention stays megatron-style tensor-parallel on the same axis.

Registered as ``paintmindv1-moe`` in the version registry (config.py)
with paintmindv1's dims and an 8-expert top-2 pool.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..nn.core import init_layernorm, init_linear, layernorm, linear, \
    normal_init
from ..nn.moe import init_moe_stack, moe_stack_apply
from .transformer import CondTransformerConfig


@dataclasses.dataclass(frozen=True)
class MoECondTransformerConfig(CondTransformerConfig):
    num_experts: int = 8
    num_selected: int = 2
    capacity_factor: float = 1.25
    lb_weight: float = 0.01     # Switch-style load-balance loss weight
    zloss_weight: float = 1e-3  # router logit z-loss weight
    # 'auto' | 'dense' | 'gather' — see nn.moe.moe_swiglu (VERDICT r3 #3)
    moe_dispatch: str = 'auto'


def init_moe_cond_transformer(key, cfg: MoECondTransformerConfig,
                              param_dtype=jnp.float32):
    ks = jax.random.split(key, 5)
    p = {
        'token_proj': init_linear(ks[0], cfg.in_dim, cfg.dim,
                                  param_dtype=param_dtype),
        'pos_embed': normal_init(ks[1], (1, cfg.len_seq, cfg.dim),
                                 std=cfg.dim ** -0.5, dtype=param_dtype),
        'layers': init_moe_stack(ks[2], cfg.depth, cfg.dim,
                                 dim_head=cfg.dim_head, mlp_dim=cfg.mlp_dim,
                                 num_head=cfg.num_head,
                                 num_experts=cfg.num_experts, cross=True,
                                 context_dim=cfg.dim,
                                 param_dtype=param_dtype),
        'norm': init_layernorm(cfg.dim, param_dtype),
        'to_logits': init_linear(ks[3], cfg.dim, cfg.num_classes,
                                 param_dtype=param_dtype),
    }
    if cfg.has_context_proj:
        p['context_proj'] = init_linear(ks[4], cfg.context_dim, cfg.dim,
                                        bias=False, param_dtype=param_dtype)
    return p


def moe_cond_transformer_apply(p, x, context=None, *,
                               cfg: MoECondTransformerConfig, key=None,
                               deterministic=True, backend=None, remat=False,
                               act_sharding=None):
    """Returns (logits (B, L, num_classes), aux) — aux carries the routing
    losses averaged over depth; weight them with cfg.lb_weight /
    cfg.zloss_weight in the train loss."""
    x = linear(p['token_proj'], x)
    x = x + p['pos_embed'].astype(x.dtype)
    if context is not None and 'context_proj' in p:
        context = linear(p['context_proj'], context.astype(x.dtype))
    elif context is not None:
        context = context.astype(x.dtype)
    x, aux = moe_stack_apply(p['layers'], x, context, heads=cfg.num_head,
                             num_selected=cfg.num_selected,
                             capacity_factor=cfg.capacity_factor,
                             dropout_rate=cfg.dropout, key=key,
                             deterministic=deterministic, backend=backend,
                             remat=remat, act_sharding=act_sharding,
                             dispatch=cfg.moe_dispatch)
    x = layernorm(p['norm'], x)
    return linear(p['to_logits'], x), aux


def moe_masked_loss(p, tokens, labels, mask, context=None, *,
                    cfg: MoECondTransformerConfig, key=None,
                    label_smoothing=0.1):
    """Masked-CE MaskGIT objective (reference generate.py:110-123 semantics)
    plus the weighted routing losses.  Returns (loss, metrics)."""
    logits, aux = moe_cond_transformer_apply(
        p, tokens, context, cfg=cfg, key=key,
        deterministic=key is None)
    logits = logits.astype(jnp.float32)
    n = cfg.num_classes
    onehot = jax.nn.one_hot(labels, n, dtype=jnp.float32)
    soft = onehot * (1.0 - label_smoothing) + label_smoothing / n
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -(soft * logp).sum(-1)
    m = mask.astype(jnp.float32)
    ce_loss = (ce * m).sum() / jnp.maximum(m.sum(), 1.0)
    loss = (ce_loss + cfg.lb_weight * aux['lb_loss']
            + cfg.zloss_weight * aux['router_z'])
    return loss, {'ce': ce_loss, **aux}

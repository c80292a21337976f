"""Stage-2 MaskGIT pipeline: frozen VQGAN + frozen T5 + conditional
transformer, with training loss and iterative parallel decoding.

Functional equivalent of the reference Pipeline (paintmind/generate.py:49-236):

  * training forward: encode image → per-sample random masking → transformer
    → masked cross-entropy with label smoothing 0.1 (generate.py:110-146)
  * inference: cosine-schedule confidence re-masking loop
    (generate.py:159-198), here a single jit-compiled fixed-step ``lax.scan``
    with static shapes — per-step mask counts and temperatures are
    precomputed host-side, gumbel sampling uses threaded PRNG keys, and
    image decoding happens outside the scan only for the steps requested.
  * inpaint / outpaint: the same loop seeded with a rectangular latent mask
    (generate.py:200-236) — implemented with integer ``where`` instead of
    the reference's float-mask arithmetic (dtype bug noted in SURVEY §2.5).
  * classifier-free guidance at sampling time (extension over the reference,
    which only trains for it via caption dropout, trainer.py:387-388):
    ``logits = uncond + scale·(cond − uncond)`` where the unconditional
    branch runs the transformer with context=None (cross-attn sublayers
    self-attend, exactly the trained uncond behavior).

Parity notes kept deliberately:
  * ``ids2tokens`` embeds sampling-time tokens from the **raw** codebook
    rows + mask token (generate.py:148-157), while training feeds
    l2-normalized quantizer outputs — a reference inconsistency we preserve
    by default for checkpoint parity (``normalize_sample_tokens`` opts into
    the consistent behavior).
"""

from __future__ import annotations

import dataclasses
import functools
import math
import threading

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config, ver2cfg
from ..parallel.context import mesh_keyed_jit
from . import quantize as vq
from . import vqmodel as vm
from .transformer import CondTransformerConfig, cond_transformer_apply, \
    head_project, init_cond_transformer


# Conditioning towers the registry's ``t5`` field can name → context dim.
# The reference hard-codes T5 (generate.py:52-58) and leaves its CLIP
# embedders unused (modules/encoder.py:45-151); here every tower is a
# first-class option.  ``clip-img-l`` conditions on CLIP ViT-L *image*
# patch tokens — an image-variations pipeline.
CONTEXT_TOWERS = {
    't5-l': 1024, 't5-xl': 2048, 't5-xxl': 4096,
    'clip-l': 768, 'clip-l-penultimate': 768,
    'clip-img-l': 1024,
}


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    stage1: str = 'vit-s-vqgan'
    t5: str = 't5-l'
    dim: int = 1024
    dim_head: int = 64
    mlp_dim: int = 4096
    num_head: int = 16
    depth: int = 12
    dropout: float = 0.1
    vqc: vm.VQModelConfig = vm.VQModelConfig()
    t5_dim: int = 1024
    normalize_sample_tokens: bool = False
    # MoE variant (``paintmindv1-moe``, config.py): num_experts=0 means the
    # dense CondTransformer; >0 routes every block's SwiGLU over an
    # expert pool (models/moe_transformer.py) — same masking/sampling
    # semantics, experts shard over the mesh 'model' axis.
    num_experts: int = 0
    num_selected: int = 2
    capacity_factor: float = 1.25
    moe_dispatch: str = 'auto'  # 'dense'|'gather' — nn.moe.moe_swiglu
    lb_weight: float = 0.01     # Switch load-balance loss weight
    zloss_weight: float = 1e-3  # router z-loss weight

    @classmethod
    def from_dict(cls, d):
        d = d if isinstance(d, dict) else d.to_dict()
        vqc = vm.VQModelConfig.from_dict(ver2cfg[d['stage1']])
        t5_dim = CONTEXT_TOWERS[d['t5']]
        return cls(stage1=d['stage1'], t5=d['t5'], dim=d['dim'],
                   dim_head=d['dim_head'], mlp_dim=d['mlp_dim'],
                   num_head=d['num_head'], depth=d['depth'],
                   dropout=d['dropout'], vqc=vqc, t5_dim=t5_dim,
                   normalize_sample_tokens=d.get('normalize_sample_tokens',
                                                 False),
                   num_experts=d.get('num_experts', 0),
                   num_selected=d.get('num_selected', 2),
                   capacity_factor=d.get('capacity_factor', 1.25),
                   moe_dispatch=d.get('moe_dispatch', 'auto'),
                   lb_weight=d.get('lb_weight', 0.01),
                   zloss_weight=d.get('zloss_weight', 1e-3))

    @property
    def image_size(self):
        return self.vqc.enc.image_size

    @property
    def patch_size(self):
        return self.vqc.enc.patch_size

    @property
    def num_tokens(self):
        return (self.image_size // self.patch_size) ** 2

    @property
    def mask_token_id(self):
        return self.vqc.n_embed

    @property
    def tcfg(self) -> CondTransformerConfig:
        kw = dict(
            in_dim=self.vqc.embed_dim, dim=self.dim, len_seq=self.num_tokens,
            dim_head=self.dim_head, mlp_dim=self.mlp_dim,
            num_head=self.num_head, depth=self.depth, dropout=self.dropout,
            context_dim=self.t5_dim, num_classes=self.vqc.n_embed)
        if self.num_experts:
            from .moe_transformer import MoECondTransformerConfig
            return MoECondTransformerConfig(
                num_experts=self.num_experts, num_selected=self.num_selected,
                capacity_factor=self.capacity_factor,
                moe_dispatch=self.moe_dispatch, lb_weight=self.lb_weight,
                zloss_weight=self.zloss_weight, **kw)
        return CondTransformerConfig(**kw)


# ---------------------------------------------------------------------------
# Training-path pure functions
# ---------------------------------------------------------------------------

def init_pipeline(key, cfg: PipelineConfig, param_dtype=jnp.float32,
                  vqgan_params=None):
    k_vq, k_tr, k_mask = jax.random.split(key, 3)
    if vqgan_params is None:
        vqgan_params = vm.init_vqmodel(k_vq, cfg.vqc, param_dtype)
    if cfg.num_experts:
        from .moe_transformer import init_moe_cond_transformer
        transformer = init_moe_cond_transformer(k_tr, cfg.tcfg, param_dtype)
    else:
        transformer = init_cond_transformer(k_tr, cfg.tcfg, param_dtype)
    return {
        'vqgan': vqgan_params,
        'transformer': transformer,
        # (reference generate.py:70-73): zeros + normal(std=.02)
        'mask_token': jax.random.normal(k_mask, (1, cfg.vqc.embed_dim),
                                        param_dtype) * 0.02,
    }


def random_masking(key, x, mask_token, mask_ratio):
    """Per-sample random masking by rank of uniform noise — exactly
    equivalent to the reference's argsort/gather/unshuffle construction
    (generate.py:78-108).  Returns (x_masked, mask) with mask 1 = removed."""
    n, l, d = x.shape
    len_mask = jnp.maximum(jnp.asarray(l * mask_ratio).astype(jnp.int32), 1)
    len_keep = l - len_mask
    noise = jax.random.uniform(key, (n, l))
    ids_shuffle = jnp.argsort(noise, axis=1)
    rank = jnp.argsort(ids_shuffle, axis=1)
    keep = rank < len_keep
    x = jnp.where(keep[..., None], x, mask_token.astype(x.dtype))
    mask = 1.0 - keep.astype(jnp.float32)
    return x, mask


def masked_ce_loss(logits, labels, mask, label_smoothing=0.1):
    """torch F.cross_entropy(label_smoothing=0.1) masked mean
    (reference generate.py:110-123)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    smooth = -jnp.mean(logp, axis=-1)
    per_tok = (1.0 - label_smoothing) * nll + label_smoothing * smooth
    return jnp.sum(per_tok * mask) / jnp.sum(mask)


def pipeline_loss(params, img, context, mask_ratio, key, *,
                  cfg: PipelineConfig, deterministic=True, backend=None,
                  remat=False, return_aux=False, transformer_apply=None):
    """Training forward → scalar loss (reference generate.py:136-146).
    ``context`` is the (B, M, t5_dim) text embedding or None (CFG dropout).
    The vqgan tower is frozen (stop_gradient), matching the reference's
    no_grad to_latent (generate.py:125-131).

    ``return_aux=True`` → (loss, aux-metrics dict): for the MoE variant the
    routing-health scalars (``lb loss``/``router z``/``dropped``) and the
    per-expert top-1 ``expert load`` fractions — the trainer logs these so
    a collapsing router or over-capacity token drop is visible in training
    (VERDICT r3 #2); empty dict for the dense model.

    ``transformer_apply``: override for the stage-2 stack forward with the
    same ``(params, x, context, key=..., deterministic=...)`` signature —
    the pipeline-parallel trainer passes the GPipe apply here
    (parallel/pipeline_parallel.py).  For the MoE variant the override
    must return ``(logits, aux)`` like moe_cond_transformer_apply; the
    dense variant's returns logits alone."""
    k_mask, k_drop = jax.random.split(key)
    vq_params = jax.lax.stop_gradient(params['vqgan'])
    z_q, _, ids = vm.encode(vq_params, img, cfg.vqc, backend=backend,
                            remat=remat)
    z_q = jax.lax.stop_gradient(z_q)
    x, mask = random_masking(k_mask, z_q, params['mask_token'], mask_ratio)
    if cfg.num_experts:
        # MoE variant: same masked-CE objective plus the weighted routing
        # losses (Switch load-balance + router z-loss) so the router trains.
        # ``transformer_apply`` here must return (logits, aux) — the
        # pipeline-parallel trainer passes pp_moe_cond_transformer_apply
        # (PP × MoE composition, VERDICT r4 #6).
        from .moe_transformer import moe_cond_transformer_apply
        tcfg = cfg.tcfg
        apply = transformer_apply or functools.partial(
            moe_cond_transformer_apply, cfg=tcfg, backend=backend,
            remat=remat)
        logits, aux = apply(
            params['transformer'], x, context,
            key=None if deterministic else k_drop,
            deterministic=deterministic)
        loss = (masked_ce_loss(logits, ids, mask)
                + tcfg.lb_weight * aux['lb_loss']
                + tcfg.zloss_weight * aux['router_z'])
        if return_aux:
            return loss, {'lb loss': aux['lb_loss'],
                          'router z': aux['router_z'],
                          'dropped': aux['dropped'],
                          'expert load': aux['expert_load']}
        return loss
    apply = transformer_apply or functools.partial(
        cond_transformer_apply, cfg=cfg.tcfg, backend=backend, remat=remat)
    logits = apply(params['transformer'], x, context,
                   key=None if deterministic else k_drop,
                   deterministic=deterministic)
    loss = masked_ce_loss(logits, ids, mask)
    return (loss, {}) if return_aux else loss


# ---------------------------------------------------------------------------
# Sampling-path pure functions
# ---------------------------------------------------------------------------

def mask_schedule(ratio):
    return np.cos(math.pi / 2.0 * ratio)  # (reference generate.py:25-26)


def ids_to_tokens(params, ids, cfg: PipelineConfig):
    """Gather sampling tokens from [codebook; mask_token]
    (reference generate.py:148-157 — raw, unnormalized rows)."""
    codebook = params['vqgan']['quantize']['codebook']
    if cfg.normalize_sample_tokens:
        codebook = vq.l2norm(codebook)
    table = jnp.concatenate([codebook, params['mask_token']], axis=0)
    return jnp.take(table, ids, axis=0)


def _gumbel(key, shape):
    # reference gumbel_noise (generate.py:40-42): -log(-log(clip(u)))
    u = jax.random.uniform(key, shape)
    eps = 1e-20
    return -jnp.log(-jnp.log(jnp.maximum(u, eps)) + 0.0)


def _topk_filter(logits, k):
    """Keep top-k logits per position, others → -inf
    (reference top_k, generate.py:33-37)."""
    vals, _ = jax.lax.top_k(logits, k)
    thresh = vals[..., -1:]
    return jnp.where(logits >= thresh, logits, -jnp.inf)


def _transformer_logits(params, tokens, context, guidance_scale, *, cfg,
                        backend, dtype=None, act_sharding=None,
                        neg_context=None, pp=None):
    if dtype is not None:
        tokens = tokens.astype(dtype)
        context = context.astype(dtype) if context is not None else None
        neg_context = (neg_context.astype(dtype)
                       if neg_context is not None else None)
    if pp is not None:
        # pipeline-parallel decode (extension; VERDICT r3 #1): the layer
        # stack runs the GPipe schedule over the mesh 'model' axis.  CFG
        # mixes branch HIDDENS before the shared vocab head like the dense
        # path below; the fused-halves trick is skipped (doubling the batch
        # would halve the microbatch size mid-schedule for no matmul win —
        # PP targets models too big for one chip, where batches are large).
        mesh, microbatches = pp
        if cfg.num_experts:
            # PP × MoE decode: two passes mixing LOGITS like the MoE path
            # below (capacity-limited routing is not token-independent, so
            # hidden-state mixing across branches is not exactly the dense
            # semantics; logit mixing matches reference generate.py:64-68)
            from ..parallel.pipeline_parallel import \
                pp_moe_cond_transformer_apply
            run = functools.partial(pp_moe_cond_transformer_apply,
                                    params['transformer'], tokens,
                                    cfg=cfg.tcfg, mesh=mesh,
                                    microbatches=microbatches,
                                    backend=backend)
            if guidance_scale is None or context is None:
                return run(context=context)[0]
            guidance_scale = jnp.asarray(guidance_scale, tokens.dtype)
            if guidance_scale.ndim == 1:
                guidance_scale = guidance_scale[:, None, None]
            cond = run(context=context)[0]
            uncond = run(context=neg_context)[0]
            return uncond + guidance_scale * (cond - uncond)
        from ..parallel.pipeline_parallel import pp_cond_transformer_apply
        run = functools.partial(pp_cond_transformer_apply,
                                params['transformer'], tokens, cfg=cfg.tcfg,
                                mesh=mesh, microbatches=microbatches,
                                backend=backend)
        if guidance_scale is None or context is None:
            return run(context=context)
        guidance_scale = jnp.asarray(guidance_scale, tokens.dtype)
        if guidance_scale.ndim == 1:
            guidance_scale = guidance_scale[:, None, None]
        cond = run(context=context, return_hidden=True)
        uncond = run(context=neg_context, return_hidden=True)
        return head_project(params['transformer'],
                            uncond + guidance_scale * (cond - uncond))
    if cfg.num_experts:
        # MoE sampler path: routing aux is inference-irrelevant; guidance
        # mixes LOGITS (reference generate.py:64-68 semantics) with two
        # passes — the dense path's fused-halves / hidden-mix tricks assume
        # token-independent per-position compute, which expert capacity
        # limits break (a doubled batch changes routing pressure).
        from .moe_transformer import moe_cond_transformer_apply

        def moe_logits(ctx):
            return moe_cond_transformer_apply(
                params['transformer'], tokens, ctx, cfg=cfg.tcfg,
                backend=backend, act_sharding=act_sharding)[0]

        if guidance_scale is None or context is None:
            return moe_logits(context)
        guidance_scale = jnp.asarray(guidance_scale, tokens.dtype)
        if guidance_scale.ndim == 1:
            guidance_scale = guidance_scale[:, None, None]
        cond = moe_logits(context)
        uncond = moe_logits(neg_context)  # None → self-attending uncond pass
        return uncond + guidance_scale * (cond - uncond)
    # The sampler fully unrolls the layer-stack scan: per-layer dynamic
    # slicing of the stacked weights costs ~3.8% of the 16-step program on
    # v5e (measured: 13.77 → 14.29 img/s at batch 64); training keeps the
    # scan (one compiled block body, remat-friendly).
    unroll = cfg.tcfg.depth
    if guidance_scale is None or context is None:
        return cond_transformer_apply(params['transformer'], tokens, context,
                                      cfg=cfg.tcfg, backend=backend,
                                      act_sharding=act_sharding,
                                      unroll=unroll)
    b = tokens.shape[0]
    # Guided paths mix the two branches' post-LN HIDDEN states and project
    # through the shared vocab head once: guidance ``u + s·(c − u)`` is
    # affine and head_project is the same linear map for both branches, so
    # the mix commutes with it — identical math, half the (B·L, 8192)
    # matmul + logits HBM traffic (reference mixes logits: generate.py:64-68).
    # ``guidance_scale`` is a TRACED operand — scalar or per-sample (B,)
    # vector — so serving coalesces mixed-scale requests and changing the
    # scale never recompiles.
    guidance_scale = jnp.asarray(guidance_scale, tokens.dtype)
    if guidance_scale.ndim == 1:  # cast to the activation dtype: a python
        guidance_scale = guidance_scale[:, None, None]  # scalar was weak-typed
    tp = params['transformer']
    if neg_context is not None:
        # negative-prompt guidance (extension): the unguided branch attends
        # to the negative caption instead of self-attending — both branches
        # are ordinary conditional passes.  Same batch-size gate as the
        # plain-CFG fused path below: one 2B call only wins while the
        # matmuls are under-batched (measured −5% at B≥16).
        if b <= 8:
            both = cond_transformer_apply(
                tp, jnp.concatenate([tokens, tokens], axis=0),
                jnp.concatenate([context, neg_context], axis=0),
                cfg=cfg.tcfg, backend=backend, act_sharding=act_sharding,
                return_hidden=True, unroll=unroll)
            cond, uncond = both[:b], both[b:]
        else:
            cond = cond_transformer_apply(
                tp, tokens, context, cfg=cfg.tcfg,
                backend=backend, act_sharding=act_sharding,
                return_hidden=True, unroll=unroll)
            uncond = cond_transformer_apply(
                tp, tokens, neg_context, cfg=cfg.tcfg,
                backend=backend, act_sharding=act_sharding,
                return_hidden=True, unroll=unroll)
        return head_project(tp, uncond + guidance_scale * (cond - uncond))
    if b <= 8:
        # fused CFG: one 2B pass — heavy matmuls batch across both branches,
        # cross-attention splits into its two true KV shapes (identical math
        # to two separate calls; see attention_cfg_halves).  Measured on
        # v5e: +10% at B=4 where the matmuls are under-batched, but −5%
        # at B≥16 (already MXU-saturated; the 2B logits tensor costs HBM),
        # hence the batch-size gate.
        both = cond_transformer_apply(
            tp, jnp.concatenate([tokens, tokens], axis=0),
            context, cfg=cfg.tcfg, backend=backend, cfg_halves=True,
            act_sharding=act_sharding, return_hidden=True, unroll=unroll)
        cond, uncond = both[:b], both[b:]
    else:
        cond = cond_transformer_apply(tp, tokens, context,
                                      cfg=cfg.tcfg, backend=backend,
                                      act_sharding=act_sharding,
                                      return_hidden=True, unroll=unroll)
        uncond = cond_transformer_apply(tp, tokens, None,
                                        cfg=cfg.tcfg, backend=backend,
                                        act_sharding=act_sharding,
                                        return_hidden=True, unroll=unroll)
    return head_project(tp, uncond + guidance_scale * (cond - uncond))


def sample_step(params, ids, key, *, context, n_masked, temperature, topk,
                cfg: PipelineConfig, guidance_scale=None, backend=None,
                dtype=None, sampler='auto', act_sharding=None,
                neg_context=None, clamp_remask=False, pp=None):
    """One MaskGIT step (reference Pipeline.sample, generate.py:159-181).
    Returns (ids_next, pred_ids).  ``n_masked`` may be a traced int scalar —
    the re-mask uses a full static sort + rank threshold so the whole loop
    compiles into one scan.

    sampler: 'exact' = reference math via XLA ops (top_k sort + softmax +
    gumbel argmax — several HBM passes over the (B·L, 8192) logits);
    'fused' = single-pass Pallas sampling-head kernel (ops/sampling);
    'auto' = fused on TPU."""
    b, l = ids.shape
    tokens = ids_to_tokens(params, ids, cfg)
    logits = _transformer_logits(params, tokens, context, guidance_scale,
                                 cfg=cfg, backend=backend, dtype=dtype,
                                 act_sharding=act_sharding,
                                 neg_context=neg_context, pp=pp)
    if sampler == 'auto':
        sampler = 'fused' if jax.default_backend() == 'tpu' else 'exact'
    is_mask = ids == cfg.mask_token_id
    if sampler == 'fused':
        from ..ops.sampling import fused_gumbel_topk_sample
        pred_ids, conf = fused_gumbel_topk_sample(logits, key, temperature,
                                                  k=topk)
        pred_ids = pred_ids.astype(ids.dtype)
    else:
        filtered = _topk_filter(logits, topk)
        temp = jnp.maximum(jnp.asarray(temperature, jnp.float32), 1e-10)
        if temp.ndim == 1:  # per-sample (B,) → broadcast over (B, L, V)
            temp = temp[:, None, None]
        pred_ids = jnp.argmax(filtered / temp + _gumbel(key, filtered.shape),
                              axis=-1).astype(ids.dtype)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        conf = jnp.take_along_axis(probs, pred_ids[..., None], axis=-1)[..., 0]

    ids_filled = jnp.where(is_mask, pred_ids, ids)
    scores = jnp.where(is_mask, 1.0 - conf, -1e5)  # (generate.py:170-173)

    # re-mask the n_masked lowest-confidence masked positions.
    # clamp_remask (paint path): clamp to the per-sample masked count — the
    # reference's -1e5 sentinel (not -inf, generate.py:173) lets KEPT tokens
    # be re-masked whenever n_masked exceeds the masked count.  That never
    # binds for generate() (the schedule decreases from all-masked; default
    # off keeps exact reference math) but is destructive for inpaint/
    # outpaint with timesteps>1, where it would regenerate the keep region.
    if clamp_remask:
        n_masked = jnp.minimum(n_masked,
                               jnp.sum(is_mask, axis=1, dtype=jnp.int32))
        n_masked = n_masked.reshape(-1, 1)  # per-sample threshold

    if l <= 2048:
        # sort-free exact equivalent of the top_k route below: an element is
        # re-masked iff its descending-order rank (ties -> lower index first,
        # lax.top_k / torch.topk semantics) is < n_masked.  rank_i =
        # #{j: s_j > s_i} + #{j < i: s_j == s_i} -- an all-pairs compare XLA
        # fuses into one reduction pass, replacing the full variadic sort +
        # gather + scatter (measured faster on v5e; bit-equal, see
        # test_remask_rank_matches_sort).  O(L^2) compares: guarded to
        # L<=2048 (the 512^2 variant's L=4096 keeps the sort).
        si = scores[:, :, None]                       # element i
        sj = scores[:, None, :]                       # candidate j
        idx = jnp.arange(l, dtype=jnp.int32)
        before = idx[None, None, :] < idx[None, :, None]
        rank = jnp.sum(((sj > si) | ((sj == si) & before)).astype(jnp.int32),
                       axis=-1)
        remask = rank < n_masked                      # n_masked: scalar/(B,1)
        ids_next = jnp.where(remask,
                             jnp.asarray(cfg.mask_token_id, ids.dtype),
                             ids_filled)
    else:
        _, order = jax.lax.top_k(scores, l)  # descending by score
        ranked_vals = jnp.take_along_axis(ids_filled, order, axis=1)
        new_vals = jnp.where(jnp.arange(l)[None, :] < n_masked,
                             jnp.asarray(cfg.mask_token_id, ids.dtype),
                             ranked_vals)
        ids_next = ids_filled.at[jnp.arange(b)[:, None], order].set(new_vals)
    return ids_next, pred_ids


def _schedule_arrays(timesteps, temperature, num_tokens):
    steps = np.arange(1, timesteps + 1)
    masked_r = mask_schedule(steps / timesteps)
    n_masked = np.maximum((masked_r * num_tokens).astype(np.int32), 1)
    factor = jnp.asarray(1.0 - (steps - 1) / timesteps, jnp.float32)
    temperature = jnp.asarray(temperature, jnp.float32)
    if temperature.ndim == 0:
        temps = temperature * factor                        # (T,)
    else:  # per-sample (B,) base temperatures → (T, B)
        temps = temperature[None, :] * factor[:, None]
    return jnp.asarray(n_masked), temps


@functools.partial(mesh_keyed_jit,
                   static_argnames=('cfg', 'timesteps', 'topk',
                                    'backend', 'dtype', 'sampler',
                                    'cfg_warmup', 'act_sharding',
                                    'clamp_remask', 'trajectory', 'pp'))
def generate_ids(params, key, init_ids, context=None, *, cfg: PipelineConfig,
                 timesteps=18, temperature=1.0, topk=5, guidance_scale=None,
                 backend=None, dtype=None, sampler='auto', cfg_warmup=0.0,
                 act_sharding=None, neg_context=None, clamp_remask=False,
                 trajectory='merged', pp=None):
    """Full iterative decode as one scan (reference generate.py:183-198).
    Returns (final ids, per-step display-ids trajectory (T, B, L)):
    ``trajectory='merged'`` (default) yields committed tokens + the current
    prediction at still-masked slots; ``'preds'`` yields the reference's
    raw per-step predictions (generate.py:165 — unsupervised at committed
    positions; see Pipeline.generate).

    ``cfg_warmup`` (extension, default off): fraction of the early steps
    that run conditional-only before guidance kicks in at full scale —
    standard MaskGIT/MUSE practice (early steps fix global structure where
    guidance adds least) and the one real CFG throughput lever on this
    hardware: full CFG is FLOP-bound at ≈2.4× the plain sampler
    (BASELINE.md).  cfg_warmup=0.5 ≈ 1.7× instead.  Compiles as two scans
    in one jit; cfg_warmup=0 is exactly the always-guided path."""
    if trajectory not in ('merged', 'preds'):
        raise ValueError(f"trajectory must be 'merged' or 'preds', "
                         f'got {trajectory!r}')
    n_masked, temps = _schedule_arrays(timesteps, temperature, cfg.num_tokens)
    keys = jax.random.split(key, timesteps)

    warm = 0
    if guidance_scale is not None and context is not None and cfg_warmup:
        warm = min(int(round(cfg_warmup * timesteps)), timesteps)

    def make_body(scale):
        def body(ids, xs):
            step_key, n_m, temp = xs
            ids_next, pred = sample_step(
                params, ids, step_key, context=context, n_masked=n_m,
                temperature=temp, topk=topk, cfg=cfg,
                guidance_scale=scale, backend=backend, dtype=dtype,
                sampler=sampler, act_sharding=act_sharding,
                neg_context=neg_context, clamp_remask=clamp_remask, pp=pp)
            if trajectory == 'preds':
                return ids_next, pred
            # 'merged' (default): committed tokens + the current prediction
            # where still masked.  The reference decodes raw pred_ids every
            # step (generate.py:165) — but positions already committed get
            # RE-predictions the loss never supervises (CE is masked-only,
            # generate.py:110-123), which visibly degrades late-step and
            # final images.  Merged ids are the actual sample.
            return ids_next, jnp.where(ids_next == cfg.mask_token_id, pred,
                                       ids_next)
        return body

    if warm == 0:
        return jax.lax.scan(make_body(guidance_scale), init_ids,
                            (keys, n_masked, temps))
    ids_w, ys_w = jax.lax.scan(
        make_body(None), init_ids,
        (keys[:warm], n_masked[:warm], temps[:warm]))
    final_ids, ys_g = jax.lax.scan(
        make_body(guidance_scale), ids_w,
        (keys[warm:], n_masked[warm:], temps[warm:]))
    return final_ids, jnp.concatenate([ys_w, ys_g], axis=0)


# ---------------------------------------------------------------------------
# Object API wrapper (reference generate.py:49-236)
# ---------------------------------------------------------------------------

class Pipeline:
    def __init__(self, config=None, stage1_pretrained=True,
                 stage1_checkpoint_path=None, *, text_encoder='auto', seed=0,
                 param_dtype=jnp.float32, compute_dtype=None, params=None):
        if config is None:
            config = Config(ver2cfg['paintmindv1'])
        self.config = (config if isinstance(config, PipelineConfig)
                       else PipelineConfig.from_dict(config))
        cfg = self.config
        self.compute_dtype = compute_dtype

        from .. import factory
        self.vqgan = factory.create_model(
            arch='vqgan', version=cfg.stage1, pretrained=stage1_pretrained,
            checkpoint_path=stage1_checkpoint_path,
            compute_dtype=compute_dtype)
        self.vqgan.freeze()

        if params is None:
            # fused transformer init + compute-dtype cast in ONE program
            # (the vqgan params pass through as arguments so their values
            # match the factory-built tower exactly): the eager form was
            # ~99 tiny programs, each paying the remote runtime's dispatch
            # round trip — measured 9-11s of every warm start (VERDICT
            # r4 #7); the fused form is a single cacheable program
            params = jax.jit(lambda k, vqp: self._maybe_cast(init_pipeline(
                k, cfg, param_dtype, vqgan_params=vqp)))(
                jax.random.PRNGKey(seed), self.vqgan.params)
            self.params = params
        else:
            self.params = self._maybe_cast(params)
        self.vqgan.params = self.params['vqgan']

        self.text_model = None
        self._text_lock = threading.Lock()
        self._text_disabled = text_encoder is None
        if text_encoder not in ('auto', None):
            self.text_model = text_encoder

        self.mask_token_id = cfg.mask_token_id
        self.num_tokens = cfg.num_tokens
        self.image_size = cfg.image_size
        self.patch_size = cfg.patch_size
        self._key = jax.random.PRNGKey(seed + 1)
        self._pp = None  # (mesh, microbatches) — see enable_pipeline_parallel
        self._act_sharding = None  # default decode act sharding — see shard()

        self._loss = mesh_keyed_jit(functools.partial(pipeline_loss, cfg=cfg))

    # -- helpers ---------------------------------------------------------

    def _maybe_cast(self, params):
        """Inference pipelines hold params directly in compute_dtype —
        avoids re-converting every weight inside the sampling scan (fp32
        masters live in the trainer's state, not here).  Int8-quantized
        linear dicts pass through whole: their f32 scales must stay f32
        (bf16 scales would stack ~0.4% error on top of int8's)."""
        if self.compute_dtype is None:
            return params
        from ..nn.quant import is_quantized

        def walk(node):
            if isinstance(node, dict):
                if is_quantized(node):
                    return dict(node)
                return {k: walk(v) for k, v in node.items()}
            x = jnp.asarray(node)
            return (x.astype(self.compute_dtype)
                    if jnp.issubdtype(x.dtype, jnp.floating) else x)

        return walk(params)

    def _next_key(self, key=None):
        if key is not None:
            return key
        self._key, sub = jax.random.split(self._key)
        return sub

    def _get_text_model(self):
        if self._text_disabled:
            raise RuntimeError(
                'this pipeline was built with text_encoder=None (text '
                'disabled) — pass precomputed context embeddings, or '
                "construct with text_encoder='auto'")
        with self._text_lock:  # serving submits from concurrent threads
            if self.text_model is None:
                tower = self.config.t5
                if tower.startswith('clip'):
                    # fail loudly (same policy as the LPIPS tower): a bare
                    # CLIP embedder would initialize RANDOM weights — a
                    # served pipeline would silently condition on an
                    # extractor unrelated to the one it trained with
                    raise RuntimeError(
                        f'pipeline tower {tower!r} has no pretrained CLIP '
                        'weights reachable offline — pass the trained '
                        'tower explicitly (text_encoder=..., e.g. '
                        'clip.load_image_tower(tower.npz) saved by '
                        'tools/train_imgvar.py, or serve.py '
                        '--tower-checkpoint)')
                else:
                    from .t5 import T5TextEncoder, T5_VERSIONS
                    version, _ = T5_VERSIONS[tower]
                    self.text_model = T5TextEncoder(version)
        return self.text_model

    def embed_text(self, text):
        """list[str] | (B, M) token ids | (B, M, t5_dim) embeddings |
        (B, H, W, 3) conditioning images (clip-img towers) | None →
        context or None."""
        if text is None:
            return None
        if isinstance(text, (list, tuple)) and text and isinstance(text[0], str):
            return self._get_text_model()(text)
        arr = jnp.asarray(text)
        if arr.ndim == 2 and jnp.issubdtype(arr.dtype, jnp.integer):
            tower = self._get_text_model()
            if hasattr(tower, 'encode_ids'):
                return tower.encode_ids(arr)
            return tower(arr)  # CLIP text: __call__ takes (B, 77) ids
        if arr.ndim == 4:  # conditioning images — (B, M, D) ctx is 3-D
            return self._get_text_model()(arr)
        return arr

    # -- training --------------------------------------------------------

    def to_latent(self, img, text=None):
        """(reference generate.py:125-131)."""
        z, _, ids = self.vqgan.encode(img)
        return z, ids, self.embed_text(text)

    def tokens2logits(self, tokens, context=None):
        if self.config.num_experts:
            from .moe_transformer import moe_cond_transformer_apply
            return moe_cond_transformer_apply(
                self.params['transformer'], jnp.asarray(tokens), context,
                cfg=self.config.tcfg)[0]
        return cond_transformer_apply(self.params['transformer'],
                                      jnp.asarray(tokens), context,
                                      cfg=self.config.tcfg)

    def forward(self, img, text=None, mask_ratio=0.75, key=None):
        img = vm._as_nhwc(img)
        context = self.embed_text(text)
        return self._loss(self.params, img, context,
                          jnp.asarray(mask_ratio, jnp.float32),
                          self._next_key(key))

    __call__ = forward

    def ids2tokens(self, ids):
        return ids_to_tokens(self.params, jnp.asarray(ids), self.config)

    # -- mesh sharding for inference/serving (extension; VERDICT r3 #5) --

    def shard(self, mesh=None, sequence_parallel=False):
        """Place this pipeline for sharded inference: megatron-style tensor
        parallelism for the stage-2 transformer (vocab head over 'model'),
        expert parallelism for the MoE variant, replicated VQGAN stacks —
        the specs from ``parallel.mesh.pipeline_param_spec``.  With
        ``sequence_parallel`` every subsequent decode also shards the
        token-sequence axis over 'model' (the 512² / 4096-token variant's
        layout).  Registers the mesh as active so the Pallas kernels
        shard themselves.  Returns self; serving can host the result
        directly (``GenerationEngine(pipe.shard(mesh))``)."""
        from ..parallel import mesh as pmesh_mod
        from ..parallel.context import active_mesh, set_active_mesh
        mesh = mesh or active_mesh()
        if mesh is None:
            raise ValueError('shard() needs a mesh: pass one or register it '
                             'via parallel.set_active_mesh')
        spec = pmesh_mod.pipeline_param_spec(self.params)
        self.params = pmesh_mod.shard_params(self.params, mesh, spec)
        self.vqgan.params = self.params['vqgan']
        set_active_mesh(mesh)
        self._act_sharding = (pmesh_mod.sequence_sharding(mesh)
                              if sequence_parallel else None)
        return self

    # -- pipeline parallelism (extension; VERDICT r3 #1) -----------------

    def enable_pipeline_parallel(self, mesh=None, microbatches=2):
        """Run every subsequent decode (generate/sample/paint) with the
        stage-2 layer stack GPipe-pipelined over the mesh 'model' axis —
        for variants too deep for one chip's HBM.  Places the transformer
        params stage-wise (parallel.pipeline_parallel.shard_for_pp); the
        data axis keeps pure DP outside.  Batch sizes must be divisible by
        dp × microbatches.  Returns self.

        ``mesh=None`` uses the active mesh (parallel.set_active_mesh)."""
        from ..parallel import pipeline_parallel as ppar
        from ..parallel.context import active_mesh
        from ..parallel.mesh import MODEL_AXIS
        mesh = mesh or active_mesh()
        if mesh is None:
            raise ValueError('enable_pipeline_parallel needs a mesh: pass '
                             'one or register it via parallel.set_active_mesh')
        stages = mesh.shape.get(MODEL_AXIS, 1)
        if stages < 2:
            raise ValueError(f"mesh 'model' axis is {stages} — pipeline "
                             'parallelism needs >= 2 stages '
                             '(make_mesh(model_parallel=N))')
        if self.config.depth % stages:
            raise ValueError(f'depth {self.config.depth} must be '
                             f'divisible by {stages} pipeline stages')
        params = dict(self.params)
        params['transformer'] = ppar.shard_for_pp(params['transformer'], mesh)
        self.params = params
        self._pp = (mesh, int(microbatches))
        return self

    def disable_pipeline_parallel(self):
        self._pp = None
        return self

    # -- sampling --------------------------------------------------------

    def sample(self, ids, mask_ratio, text=None, topk=1, temperature=1.0,
               key=None, guidance_scale=None):
        """One decode step (reference generate.py:159-181); returns
        (ids_next, img)."""
        context = self.embed_text(text)
        n_masked = max(int(mask_ratio * self.num_tokens), 1)
        ids_next, pred = sample_step(
            self.params, jnp.asarray(ids), self._next_key(key),
            context=context, n_masked=n_masked, temperature=temperature,
            topk=topk, cfg=self.config, guidance_scale=guidance_scale,
            dtype=self.compute_dtype, pp=self._pp)
        img = self.vqgan.decode_from_indice(pred)
        return ids_next, img

    def generate(self, text=None, timesteps=18, temperature=1.0, topk=5,
                 save_interval=2, key=None, guidance_scale=None,
                 num_samples=None, decode_steps='saved', cfg_warmup=0.0,
                 negative_text=None, trajectory='merged'):
        """(reference generate.py:183-198).  Returns a list of image
        batches — one per saved step ('saved', parity) or just the final
        image batch ('final').  ``cfg_warmup``: see generate_ids.
        ``negative_text`` (extension): caption(s) the guidance pushes away
        from, replacing the unconditional branch.

        ``trajectory='merged'`` (default) decodes committed tokens plus the
        current prediction at still-masked positions; ``'preds'`` decodes
        the raw per-step predictions like the reference (generate.py:165) —
        which re-predicts already-committed positions the training loss
        never supervises, visibly degrading late-step images."""
        if negative_text is not None:
            if guidance_scale is None:
                raise ValueError('negative_text requires guidance_scale — '
                                 'without it the negative prompt would be '
                                 'silently ignored')
            if text is None:
                raise ValueError('negative_text requires a (positive) text '
                                 'condition to guide towards')
        context = self.embed_text(text)
        neg_context = self.embed_text(negative_text)
        if neg_context is not None and context is not None:
            neg_context = jnp.broadcast_to(
                neg_context, context.shape) if neg_context.shape[0] == 1 \
                else neg_context
        if context is not None:
            b = context.shape[0]
        else:
            b = num_samples or 1
        init_ids = jnp.full((b, self.num_tokens), self.mask_token_id,
                            dtype=jnp.int32)
        _, preds = generate_ids(
            self.params, self._next_key(key), init_ids, context,
            cfg=self.config, timesteps=timesteps, temperature=temperature,
            topk=topk, guidance_scale=guidance_scale,
            dtype=self.compute_dtype, cfg_warmup=cfg_warmup,
            neg_context=neg_context, trajectory=trajectory, pp=self._pp,
            act_sharding=self._act_sharding)
        if decode_steps == 'final':
            steps = [timesteps - 1]
        else:  # parity: every save_interval-th step (generate.py:195-196)
            steps = list(range(0, timesteps, save_interval))
        # decode saved steps as stacked batches — device-side throughout
        # (host round-trips stall the dispatch pipeline on remote runtimes),
        # chunked per saved step when S·B is large so decoder activations
        # stay bounded
        sel = preds[jnp.asarray(steps)]  # (S, B, L), on device
        s = len(steps)
        if s * b <= 128:
            imgs = self.vqgan.decode_from_indice(
                sel.reshape(s * b, self.num_tokens))
            imgs = imgs.reshape(s, b, *imgs.shape[1:])
            return [imgs[i] for i in range(s)]
        return [self.vqgan.decode_from_indice(sel[i]) for i in range(s)]

    def _rect_latent_mask(self, coord, inside):
        """(reference generate.py:204-210): latent-grid mask from pixel rect
        coord=(x, y, h, w); `inside`=value inside the rect.  ``coord`` may
        also be a sequence of per-sample rects → (B, L) mask."""
        s = self.patch_size
        g = self.image_size // s
        coords = ([coord] if not coord or np.isscalar(coord[0])
                  else list(coord))
        rows = []
        for c in coords:
            x, y, h, w = (int(v) // s for v in c)
            keep = np.full((g, g), 1 - inside, dtype=np.int32)
            keep[y:y + h, x:x + w] = inside
            rows.append(keep.reshape(-1))
        return jnp.asarray(np.stack(rows))

    def paint(self, img, keep_mask, text=None, timesteps=1, topk=1,
              temperature=0.0, key=None, guidance_scale=None):
        """Batched paint with an explicit per-sample latent keep-mask
        (B, L) or (1, L); 1 = keep the original token, 0 = regenerate.
        The mask is a tensor operand (not part of any compiled-program
        signature), so the serving engine coalesces paint requests with
        different rects — and different modes — into one batch.
        ``temperature`` may be per-sample (B,)."""
        _, ids, context = self.to_latent(img, text)
        ids = jnp.where(jnp.asarray(keep_mask).astype(bool), ids,
                        jnp.asarray(self.mask_token_id, ids.dtype))
        _, merged = generate_ids(
            self.params, self._next_key(key), ids, context, cfg=self.config,
            timesteps=timesteps, temperature=temperature, topk=topk,
            guidance_scale=guidance_scale, dtype=self.compute_dtype,
            clamp_remask=True, pp=self._pp,
            act_sharding=self._act_sharding)
        # merged trajectory: kept positions hold the original content, the
        # ≥1 still-masked schedule slot is filled from the last prediction
        return self.vqgan.decode_from_indice(merged[-1])

    def inpaint(self, img, coord, text=None, timesteps=1, topk=1,
                temperature=0.0, key=None, guidance_scale=None):
        """Regenerate inside the rect (reference generate.py:200-217).
        ``coord`` is one (x, y, h, w) pixel rect or a per-sample list."""
        keep = self._rect_latent_mask(coord, inside=0)
        return self.paint(img, keep, text, timesteps, topk, temperature,
                          key, guidance_scale)

    def outpaint(self, img, coord, text=None, timesteps=1, topk=1,
                 temperature=0.0, key=None, guidance_scale=None):
        """Regenerate outside the rect (reference generate.py:219-236)."""
        keep = self._rect_latent_mask(coord, inside=1)
        return self.paint(img, keep, text, timesteps, topk, temperature,
                          key, guidance_scale)

    # -- quantization ----------------------------------------------------

    def quantize(self, mode='w8a8', *, head=True, min_dim=64):
        """Post-training int8 quantization of the stage-2 transformer
        (extension; the reference has none — see nn/quant.py for the TPU
        rationale: s8 x s8 MXU runs at 2x the bf16 peak on v5e).

        ``mode``: 'w8a8' (dynamic per-token activation quant, int8 matmuls)
        or 'w8' (weight-only — halves weight HBM traffic, bf16 compute).
        ``head``: also quantize the (dim, 8192) vocab projection.

        Call AFTER ``from_pretrained`` — loading uses the param tree as a
        template, so quantize is terminal for this object.  The stage-1
        VQGAN (conv decoder, quality-critical) stays in fp.
        """
        from ..nn import quant
        if self.config.num_experts:
            raise NotImplementedError(
                'int8 quantization of the MoE variant is not supported: '
                'expert leaves are (depth, E, in, out) stacks the per-linear '
                'quantizer does not cover, and partially-quantized blocks '
                'would silently skew routing-vs-expert numerics')
        if getattr(self, '_quantized', None):
            raise RuntimeError(
                f'already quantized ({self._quantized!r}) — quantization '
                'is lossy and terminal for this object; build a fresh '
                'Pipeline to pick a different mode')
        tp = dict(self.params['transformer'])
        tp['layers'] = quant.quantize_tree(tp['layers'], mode,
                                           min_dim=min_dim)
        if head:
            tp['to_logits'] = quant.quantize_linear(tp['to_logits'], mode)
        params = dict(self.params)
        params['transformer'] = tp
        self.params = params
        self._quantized = mode
        return self

    # -- checkpointing ---------------------------------------------------

    def from_pretrained(self, path):
        from ..utils.checkpoint import load_params
        try:
            loaded = load_params(path, template=self.params, model='pipeline')
        except (KeyError, ValueError) as e:
            # KeyError: npz/pt strict template load; ValueError: orbax
            # structure mismatch
            if getattr(self, '_quantized', None):
                # template is int8 but the artifact is fp (or vice versa)
                raise RuntimeError(
                    'this pipeline was quantized in place (int8) and the '
                    f'checkpoint does not match its quantized layout ({e}) '
                    '— load the fp checkpoint into a fresh Pipeline and '
                    'call .quantize(), or save/load quantized artifacts '
                    'as a pair') from e
            raise
        self.params = self._maybe_cast(loaded)
        self.vqgan.params = self.params['vqgan']
        return self

    def save_pretrained(self, path):
        from ..utils.checkpoint import save_params
        return save_params(path, self.params)

    @property
    def num_params(self):
        return sum(x.size for x in jax.tree_util.tree_leaves(self.params))

"""Jitted train steps: stage-1 adversarial VQGAN and stage-2 MaskGIT.

Functional ports of the reference training loops (paintmind/utils/trainer.py):

Stage-1 (trainer.py:171-259), per optimizer step:
  D phase: rec = vqgan(img) (no grad), hinge-D loss on D(rec)/D(img) plus
  WGAN-style gradient penalty on interpolates (double grad through D,
  trainer.py:153-169, 193-194) → Adam update of D.
  G phase (with the *updated* D, matching reference ordering): codebook loss
  + L1+MSE recon + LPIPS perceptual + 0.1·non-saturating G loss
  (trainer.py:210-218) → Adam update of the VQGAN.

Stage-2 (trainer.py:377-398): masked-CE pipeline loss with arccos mask-ratio
and batch-level CFG text dropout (handled host-side by the trainer, exactly
like reference trainer.py:387-388) → Lion/AdamW update of transformer +
mask_token only (vqgan and T5 are frozen).

TPU-native mechanics: gradient accumulation is a ``lax.scan`` over
microbatches inside the jitted step; bf16 compute with fp32 master params
("autocast" equivalent: activations are cast, kernels follow activation
dtype, norms/softmax/losses stay fp32); gradient all-reduce across the data
axis is implicit in sharded jit.  Each step returns (new_state, metrics) with
the reference's metric names.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax

from ..models import discriminator as disc
from ..models import lpips as lpips_mod
from ..models import pipeline as pl
from ..models import quantize as vqz
from ..models import vqmodel as vm
from ..nn.core import linear


def _cast(x, dtype):
    return x if dtype is None else x.astype(dtype)


def _tree_zeros_like(tree):
    return jax.tree_util.tree_map(jnp.zeros_like, tree)


def _tree_add(a, b):
    return jax.tree_util.tree_map(jnp.add, a, b)


def _tree_scale(a, s):
    return jax.tree_util.tree_map(lambda x: x * s, a)


def _ema_update(ema, new, decay):
    """decay*ema + (1-decay)*new (extension; the reference has no EMA —
    standard practice for GAN/MaskGIT inference weights)."""
    return jax.tree_util.tree_map(
        lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay), ema, new)


# ---------------------------------------------------------------------------
# Stage-1: VQGAN adversarial step
# ---------------------------------------------------------------------------

def init_vqgan_train_state(key, vq_params, g_tx, d_tx,
                           dcfg=disc.DiscriminatorConfig(), ema_decay=None,
                           codebook_restart_every=None):
    k_d, k_s = jax.random.split(key)
    d_params, d_stats = disc.init_discriminator(k_d, dcfg)
    state = {
        'step': jnp.zeros((), jnp.int32),
        'g_params': vq_params,
        'g_opt': g_tx.init(vq_params),
        'd_params': d_params,
        'd_stats': d_stats,
        'd_opt': d_tx.init(d_params),
        'key': k_s,
    }
    if ema_decay is not None:
        state['g_ema'] = jax.tree_util.tree_map(jnp.array, vq_params)
    if codebook_restart_every is not None:
        n_embed = vq_params['quantize']['codebook'].shape[0]
        state['code_usage'] = jnp.zeros((n_embed,), jnp.int32)
    return state


def make_vqgan_train_step(cfg: vm.VQModelConfig, g_tx, d_tx, *,
                          dcfg=disc.DiscriminatorConfig(), lpips_params=None,
                          d_weight=0.1, grad_accum=1, compute_dtype=None,
                          backend=None, remat=False, ema_decay=None,
                          codebook_restart_every=None, share_forward=True):
    """Returns jittable ``step(state, imgs) -> (state, metrics)``;
    imgs: (grad_accum · micro, H, W, C) fp32 in [-1, 1].  ``remat=True``
    rematerializes the transformer stacks in the backward pass (memory ↔
    FLOPs trade for large batches).

    ``share_forward`` (default): the reference runs the full VQGAN forward
    TWICE per step — once for the D phase, once for the G phase
    (trainer.py:188, 210; a quirk SURVEY §2.5 says not to replicate).  The
    two forwards see identical generator params, so here one ``jax.vjp``
    forward serves both: the D phase consumes ``stop_gradient(rec)``, D is
    updated, and the stored vjp is then pulled with the G-loss cotangent
    computed against the *updated* discriminator — bit-identical math and
    ordering to the reference, one VQGAN forward instead of two (measured
    on v5e: 38.7 → ~46 img/s at batch 16).  The microbatch loop unrolls
    (residuals for all ``grad_accum`` microbatches are alive across the D
    update — use ``remat=True`` to shrink them at large accumulation).
    ``share_forward=False`` keeps the literal two-forward scan form.

    ``codebook_restart_every`` (extension; the reference has no collapse
    countermeasure): every N optimizer steps, codebook rows unused in the
    window are re-seeded with l2-normalized encoder latents drawn from the
    current batch — the standard dead-code restart against codebook
    collapse (round-1 convergence run: perplexity 20 of 8192)."""

    def forward_rec(g_params, img):
        rec, cb_loss = vm.forward(g_params, _cast(img, compute_dtype), cfg,
                                  backend=backend, remat=remat)
        return rec.astype(jnp.float32), cb_loss

    def d_loss_fn(d_params, d_stats, img, rec, key):
        fake, d_stats = disc.discriminator_apply(d_params, d_stats, rec,
                                                 train=True, cfg=dcfg)
        real, d_stats = disc.discriminator_apply(d_params, d_stats, img,
                                                 train=True, cfg=dcfg)
        gp, d_stats = disc.gradient_penalty(d_params, d_stats, img, rec, key,
                                            cfg=dcfg)
        loss = disc.hinge_d_loss(fake, real) + gp
        return loss, d_stats

    def g_loss_fn(g_params, d_params, d_stats, img):
        # encode→decode inline (== vm.forward) so the code indices surface
        # for usage tracking
        z, cb_loss, ids = vm.encode(g_params, _cast(img, compute_dtype), cfg,
                                    backend=backend, remat=remat)
        rec = vm.decode(g_params, z, cfg, backend=backend,
                        remat=remat).astype(jnp.float32)
        rec_loss = (jnp.mean(jnp.abs(rec - img))
                    + jnp.mean(jnp.square(rec - img)))
        if lpips_params is not None:
            per_loss = jnp.mean(lpips_mod.lpips(lpips_params, rec, img))
        else:
            per_loss = jnp.asarray(0.0)
        fake, d_stats = disc.discriminator_apply(d_params, d_stats, rec,
                                                 train=True, cfg=dcfg)
        g_loss = disc.g_nonsaturating_loss(fake)
        total = cb_loss + rec_loss + per_loss + d_weight * g_loss
        metrics = {'rec loss': rec_loss, 'per loss': per_loss,
                   'g loss': g_loss, 'codebook loss': cb_loss}
        return total, (d_stats, metrics, ids)

    def g_head(rec, cb_loss, d_params, d_stats, img):
        """G-phase loss terms as a function of (rec, cb_loss) — the
        cotangent source for the deferred shared-forward pull."""
        rec_loss = (jnp.mean(jnp.abs(rec - img))
                    + jnp.mean(jnp.square(rec - img)))
        if lpips_params is not None:
            per_loss = jnp.mean(lpips_mod.lpips(lpips_params, rec, img))
        else:
            per_loss = jnp.asarray(0.0)
        fake, d_stats = disc.discriminator_apply(d_params, d_stats, rec,
                                                 train=True, cfg=dcfg)
        g_loss = disc.g_nonsaturating_loss(fake)
        total = cb_loss + rec_loss + per_loss + d_weight * g_loss
        metrics = {'rec loss': rec_loss, 'per loss': per_loss,
                   'g loss': g_loss, 'codebook loss': cb_loss}
        return total, (d_stats, metrics)

    def fwd_full(g_params, img):
        z, cb_loss, ids = vm.encode(g_params, _cast(img, compute_dtype), cfg,
                                    backend=backend, remat=remat)
        rec = vm.decode(g_params, z, cfg, backend=backend,
                        remat=remat).astype(jnp.float32)
        return (rec, cb_loss), ids

    def step_shared(state, imgs, gp_keys, key):
        """One VQGAN forward per microbatch: vjp now, pull after the D
        update (reference ordering preserved exactly — see docstring)."""
        n_embed = cfg.n_embed
        recs, cbs, idss, pulls = [], [], [], []
        d_grads = _tree_zeros_like(state['d_params'])
        d_stats = state['d_stats']
        d_loss_sum = jnp.asarray(0.0)
        for i in range(grad_accum):  # unrolled; grad_accum is static
            (rec, cb), pull, ids = jax.vjp(
                lambda p, im=imgs[i]: fwd_full(p, im), state['g_params'],
                has_aux=True)
            rec_sg = jax.lax.stop_gradient(rec)
            (dl, d_stats), dgr = jax.value_and_grad(
                d_loss_fn, has_aux=True)(state['d_params'], d_stats,
                                         imgs[i], rec_sg, gp_keys[i])
            d_grads = _tree_add(d_grads, dgr)
            d_loss_sum = d_loss_sum + dl
            recs.append(rec), cbs.append(cb)
            idss.append(ids), pulls.append(pull)

        d_grads = _tree_scale(d_grads, 1.0 / grad_accum)
        d_updates, d_opt = d_tx.update(d_grads, state['d_opt'],
                                       state['d_params'])
        d_params = optax.apply_updates(state['d_params'], d_updates)

        g_grads = _tree_zeros_like(state['g_params'])
        zero_metrics = {'rec loss': 0.0, 'per loss': 0.0, 'g loss': 0.0,
                        'codebook loss': 0.0, 'loss': 0.0}
        g_metrics = jax.tree_util.tree_map(jnp.asarray, zero_metrics)
        counts = jnp.zeros((n_embed,), jnp.int32)
        for i in range(grad_accum):
            (loss, (d_stats, metrics)), head_grads = jax.value_and_grad(
                g_head, argnums=(0, 1), has_aux=True)(
                    recs[i], cbs[i], d_params, d_stats, imgs[i])
            (gg,) = pulls[i](head_grads)
            g_grads = _tree_add(g_grads, gg)
            g_metrics = _tree_add(g_metrics, {**metrics, 'loss': loss})
            if codebook_restart_every is not None:
                counts = counts.at[idss[i].reshape(-1)].add(1)
        return (d_params, d_stats, d_opt, d_loss_sum, g_grads, g_metrics,
                counts, key)

    def step_two_pass(state, imgs, gp_keys, key):
        """Literal reference form: D phase re-runs the forward (scan)."""
        n_embed = cfg.n_embed

        def d_micro(carry, xs):
            grads_acc, d_stats, loss_acc = carry
            img, k = xs
            rec, _ = forward_rec(state['g_params'], img)
            rec = jax.lax.stop_gradient(rec)
            (loss, d_stats), grads = jax.value_and_grad(
                d_loss_fn, has_aux=True)(state['d_params'], d_stats, img,
                                         rec, k)
            return (_tree_add(grads_acc, grads), d_stats,
                    loss_acc + loss), None

        (d_grads, d_stats, d_loss_sum), _ = jax.lax.scan(
            d_micro,
            (_tree_zeros_like(state['d_params']), state['d_stats'],
             jnp.asarray(0.0)),
            (imgs, gp_keys))
        d_grads = _tree_scale(d_grads, 1.0 / grad_accum)
        d_updates, d_opt = d_tx.update(d_grads, state['d_opt'],
                                       state['d_params'])
        d_params = optax.apply_updates(state['d_params'], d_updates)

        def g_micro(carry, img):
            grads_acc, d_stats_c, metrics_acc, counts = carry
            (loss, (d_stats_c, metrics, ids)), grads = jax.value_and_grad(
                g_loss_fn, has_aux=True)(state['g_params'], d_params,
                                         d_stats_c, img)
            metrics = {**metrics, 'loss': loss}
            metrics_acc = _tree_add(metrics_acc, metrics)
            if codebook_restart_every is not None:
                counts = counts.at[ids.reshape(-1)].add(1)
            return (_tree_add(grads_acc, grads), d_stats_c, metrics_acc,
                    counts), None

        zero_metrics = {'rec loss': 0.0, 'per loss': 0.0, 'g loss': 0.0,
                        'codebook loss': 0.0, 'loss': 0.0}
        zero_metrics = jax.tree_util.tree_map(jnp.asarray, zero_metrics)
        (g_grads, d_stats, g_metrics, counts), _ = jax.lax.scan(
            g_micro, (_tree_zeros_like(state['g_params']), d_stats,
                      zero_metrics, jnp.zeros((n_embed,), jnp.int32)), imgs)
        return (d_params, d_stats, d_opt, d_loss_sum, g_grads, g_metrics,
                counts, key)

    def step(state, imgs):
        b = imgs.shape[0]
        if b % grad_accum:
            raise ValueError(f'batch size {b} not divisible by '
                             f'grad_accum_steps={grad_accum}')
        micro = b // grad_accum
        imgs = imgs.reshape(grad_accum, micro, *imgs.shape[1:])
        key, k_step = jax.random.split(state['key'])
        gp_keys = jax.random.split(k_step, grad_accum)

        n_embed = cfg.n_embed
        phase = step_shared if share_forward else step_two_pass
        (d_params, d_stats, d_opt, d_loss_sum, g_grads, g_metrics, counts,
         key) = phase(state, imgs, gp_keys, key)
        g_grads = _tree_scale(g_grads, 1.0 / grad_accum)
        g_updates, g_opt = g_tx.update(g_grads, state['g_opt'],
                                       state['g_params'])
        g_params = optax.apply_updates(state['g_params'], g_updates)

        metrics = _tree_scale(g_metrics, 1.0 / grad_accum)
        metrics['d loss'] = d_loss_sum / grad_accum
        new_state = {'step': state['step'] + 1, 'g_params': g_params,
                     'g_opt': g_opt, 'd_params': d_params,
                     'd_stats': d_stats, 'd_opt': d_opt, 'key': key}

        if codebook_restart_every is not None:
            usage = state['code_usage'] + counts
            key, k_restart = jax.random.split(key)
            new_state['key'] = key

            def do_restart(args):
                codebook, usage_ = args
                # candidate rows: l2-normalized encoder latents of the last
                # microbatch (codebook rows are l2-normalized at every use,
                # so this is scale-consistent)
                x = vm.encoder_apply(g_params['encoder'],
                                     _cast(imgs[-1], compute_dtype), cfg.enc,
                                     backend=backend)
                lat = vqz.l2norm(linear(g_params['prev_quant'], x))
                lat = lat.reshape(-1, codebook.shape[1])
                pick = jax.random.randint(k_restart, (n_embed,), 0,
                                          lat.shape[0])
                cand = jnp.take(lat, pick, axis=0).astype(codebook.dtype)
                dead = (usage_ == 0)[:, None]
                return (jnp.where(dead, cand, codebook),
                        jnp.zeros_like(usage_),
                        jnp.sum(dead.astype(jnp.int32)))

            def no_restart(args):
                codebook, usage_ = args
                return codebook, usage_, jnp.zeros((), jnp.int32)

            trigger = (new_state['step'] % codebook_restart_every) == 0
            cb, usage, n_restarted = jax.lax.cond(
                trigger, do_restart, no_restart,
                (g_params['quantize']['codebook'], usage))
            new_state['g_params'] = {
                **g_params, 'quantize': {**g_params['quantize'],
                                         'codebook': cb}}
            new_state['code_usage'] = usage
            metrics['restarted codes'] = n_restarted

        if ema_decay is not None:
            new_state['g_ema'] = _ema_update(state['g_ema'],
                                             new_state['g_params'], ema_decay)
        return new_state, metrics

    return step


# ---------------------------------------------------------------------------
# Stage-2: MaskGIT pipeline step
# ---------------------------------------------------------------------------

def _trainable_mask(params):
    """Only transformer + mask_token train (vqgan frozen, reference
    generate.py:56; T5 lives outside the param tree entirely)."""
    return {
        'vqgan': jax.tree_util.tree_map(lambda _: False, params['vqgan']),
        'transformer': jax.tree_util.tree_map(lambda _: True,
                                              params['transformer']),
        'mask_token': True,
    }


def masked_tx(tx, params):
    """Apply updates only to trainable leaves (optax.masked)."""
    return optax.masked(tx, _trainable_mask(params))


def init_pipeline_train_state(key, params, tx, ema_decay=None):
    state = {
        'step': jnp.zeros((), jnp.int32),
        'params': params,
        'opt': tx.init(params),
        'key': key,
    }
    if ema_decay is not None:  # EMA of the trainable subtrees only
        state['ema'] = {
            'transformer': jax.tree_util.tree_map(jnp.array,
                                                  params['transformer']),
            'mask_token': jnp.array(params['mask_token']),
        }
    return state


def make_pipeline_train_step(cfg: pl.PipelineConfig, tx, *, grad_accum=1,
                             compute_dtype=None, backend=None, remat=False,
                             ema_decay=None, transformer_apply=None):
    """Returns jittable ``step(state, imgs, context, mask_ratio)``.
    ``context`` is (B, M, t5_dim) or None — the trainer picks None for the
    whole batch with p=0.1 (CFG dropout, reference trainer.py:387-388);
    ``mask_ratio`` is the per-batch arccos draw (trainer.py:286-288).

    Metrics always carry ``loss``; the MoE variant additionally surfaces
    the routing-health aux (``lb loss``/``router z``/``dropped`` scalars +
    the (E,) ``expert load`` fractions), averaged over microbatches —
    training-time visibility into router collapse / capacity overflow
    (VERDICT r3 #2).

    ``transformer_apply``: stage-2 stack forward override — the
    pipeline-parallel trainer route passes the GPipe apply here
    (pp_cond_transformer_apply, or pp_moe_cond_transformer_apply for the
    MoE variant, which returns (logits, aux) like the unpipelined MoE
    path)."""

    def loss_fn(params, img, context, mask_ratio, key):
        return pl.pipeline_loss(params, _cast(img, compute_dtype),
                                _cast(context, compute_dtype) if context is
                                not None else None,
                                mask_ratio, key, cfg=cfg,
                                deterministic=False, backend=backend,
                                remat=remat, return_aux=True,
                                transformer_apply=transformer_apply)

    def step(state, imgs, context, mask_ratio):
        b = imgs.shape[0]
        if b % grad_accum:
            raise ValueError(f'batch size {b} not divisible by '
                             f'grad_accum_steps={grad_accum}')
        micro = b // grad_accum
        imgs = imgs.reshape(grad_accum, micro, *imgs.shape[1:])
        if context is not None:
            context = context.reshape(grad_accum, micro, *context.shape[1:])
        key, k_step = jax.random.split(state['key'])
        keys = jax.random.split(k_step, grad_accum)

        # aux-metric accumulator structure depends only on the config
        if cfg.num_experts:
            zero_aux = {'lb loss': jnp.zeros((), jnp.float32),
                        'router z': jnp.zeros((), jnp.float32),
                        'dropped': jnp.zeros((), jnp.float32),
                        'expert load': jnp.zeros((cfg.num_experts,),
                                                 jnp.float32)}
        else:
            zero_aux = {}

        def micro_step(carry, xs):
            grads_acc, loss_acc, aux_acc = carry
            if context is None:
                img, k = xs
                ctx = None
            else:
                img, ctx, k = xs
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state['params'], img, ctx, mask_ratio, k)
            return (_tree_add(grads_acc, grads), loss_acc + loss,
                    _tree_add(aux_acc, aux)), None

        xs = (imgs, keys) if context is None else (imgs, context, keys)
        (grads, loss_sum, aux_sum), _ = jax.lax.scan(
            micro_step, (_tree_zeros_like(state['params']),
                         jnp.asarray(0.0), zero_aux), xs)
        grads = _tree_scale(grads, 1.0 / grad_accum)
        updates, opt = tx.update(grads, state['opt'], state['params'])
        params = optax.apply_updates(state['params'], updates)
        new_state = {'step': state['step'] + 1, 'params': params,
                     'opt': opt, 'key': key}
        if ema_decay is not None:
            new_state['ema'] = {
                'transformer': _ema_update(state['ema']['transformer'],
                                           params['transformer'], ema_decay),
                'mask_token': _ema_update(state['ema']['mask_token'],
                                          params['mask_token'], ema_decay),
            }
        metrics = {'loss': loss_sum / grad_accum,
                   **_tree_scale(aux_sum, 1.0 / grad_accum)}
        return new_state, metrics

    return step

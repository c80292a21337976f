"""PatchGAN discriminator (NHWC, functional).

Equivalent of the reference NLayerDiscriminator
(paintmind/stage1/discriminator.py:14-71): 4×4 convs, stride-2 downsampling
then stride-1, ndf=64 doubling to ≤8×, BatchNorm + LeakyReLU(0.2), 1-channel
patch logit map; normal(0, 0.02) conv init, BN weight ~ N(1, 0.02).

BatchNorm is functional: apply returns (logits, new_stats); training uses
batch statistics (torch train-mode semantics) and momentum-0.1 running-stat
updates, eval uses the running stats.  Note: under a data-parallel mesh the
batch statistics are computed over the *global* batch (XLA SPMD reduces
across devices) — sync-BN behavior, vs the reference's per-replica DDP BN;
documented deviation, strictly more stable.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DiscriminatorConfig:
    input_nc: int = 3
    ndf: int = 64
    n_layers: int = 3


def _conv_init(key, shape):
    # reference init_func: normal(0, 0.02)
    return jax.random.normal(key, shape) * 0.02


def init_discriminator(key, cfg: DiscriminatorConfig = DiscriminatorConfig()):
    """Conv kernels are HWIO.  Returns (params, batch_stats)."""
    keys = iter(jax.random.split(key, 2 * (cfg.n_layers + 2) + 2))
    params, stats = [], []
    kw = 4

    def conv(cin, cout, bias):
        p = {'kernel': _conv_init(next(keys), (kw, kw, cin, cout))}
        if bias:
            p['bias'] = jnp.zeros((cout,))
        return p

    def bn(c):
        # reference: BN weight ~ N(1, 0.02), bias 0
        return ({'scale': 1.0 + jax.random.normal(next(keys), (c,)) * 0.02,
                 'bias': jnp.zeros((c,))},
                {'mean': jnp.zeros((c,)), 'var': jnp.ones((c,))})

    # layer 0: conv + leaky (bias, no norm)
    params.append({'conv': conv(cfg.input_nc, cfg.ndf, bias=True)})
    stats.append({})
    nf_mult = 1
    for n in range(1, cfg.n_layers):  # stride-2 blocks with BN (no conv bias)
        nf_prev, nf_mult = nf_mult, min(2 ** n, 8)
        bn_p, bn_s = bn(cfg.ndf * nf_mult)
        params.append({'conv': conv(cfg.ndf * nf_prev, cfg.ndf * nf_mult, False),
                       'bn': bn_p})
        stats.append({'bn': bn_s})
    nf_prev, nf_mult = nf_mult, min(2 ** cfg.n_layers, 8)
    bn_p, bn_s = bn(cfg.ndf * nf_mult)
    params.append({'conv': conv(cfg.ndf * nf_prev, cfg.ndf * nf_mult, False),
                   'bn': bn_p})
    stats.append({'bn': bn_s})
    # final 1-channel logit conv (bias)
    params.append({'conv': conv(cfg.ndf * nf_mult, 1, True)})
    stats.append({})
    return params, stats


def _conv2d(p, x, stride):
    y = jax.lax.conv_general_dilated(
        x, p['kernel'].astype(x.dtype), window_strides=(stride, stride),
        padding=[(1, 1), (1, 1)], dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    if 'bias' in p:
        y = y + p['bias'].astype(x.dtype)
    return y


def _batchnorm(p, s, x, train, momentum=0.1, eps=1e-5):
    x32 = x.astype(jnp.float32)
    if train:
        mean = jnp.mean(x32, axis=(0, 1, 2))
        var = jnp.var(x32, axis=(0, 1, 2))
        n = x.shape[0] * x.shape[1] * x.shape[2]
        unbiased = var * n / max(n - 1, 1)
        new_s = {'mean': (1 - momentum) * s['mean'] + momentum * mean,
                 'var': (1 - momentum) * s['var'] + momentum * unbiased}
    else:
        mean, var = s['mean'], s['var']
        new_s = s
    y = (x32 - mean) * jax.lax.rsqrt(var + eps) * p['scale'] + p['bias']
    return y.astype(x.dtype), new_s


def discriminator_apply(params, stats, x, train=True,
                        cfg: DiscriminatorConfig = DiscriminatorConfig()):
    """x: (B, H, W, C) in [-1, 1] → ((B, h', w', 1) logits, new_stats)."""
    new_stats = []
    n = len(params)
    for i, (p, s) in enumerate(zip(params, stats)):
        # strides: first n_layers convs are stride 2, rest stride 1
        stride = 2 if i < cfg.n_layers else 1
        x = _conv2d(p['conv'], x, stride)
        if 'bn' in p:
            x, s_new = _batchnorm(p['bn'], s['bn'], x, train)
            new_stats.append({'bn': s_new})
        else:
            new_stats.append({})
        if i < n - 1:
            x = jax.nn.leaky_relu(x, 0.2)
    return x, new_stats


def hinge_d_loss(fake, real):
    """(reference trainer.py:26-30)."""
    loss_fake = jnp.mean(jax.nn.relu(1.0 + fake))
    loss_real = jnp.mean(jax.nn.relu(1.0 - real))
    return 0.5 * (loss_real + loss_fake)


def g_nonsaturating_loss(fake):
    """(reference trainer.py:33-36)."""
    return jnp.mean(jax.nn.softplus(-fake))


def gradient_penalty(params, stats, real, fake, key, lambda_term=10.0,
                     cfg: DiscriminatorConfig = DiscriminatorConfig()):
    """WGAN-GP on interpolates (reference trainer.py:153-169): per-sample
    eta ~ U(0,1), grad of sum(D(interp)) wrt interp, channel-dim 2-norm,
    ((‖g‖−1)²)·10.  Returns (penalty, new_stats)."""
    b = real.shape[0]
    eta = jax.random.uniform(key, (b, 1, 1, 1), dtype=real.dtype)
    interp = eta * real + (1.0 - eta) * fake

    def d_sum(x):
        out, st = discriminator_apply(params, stats, x, train=True, cfg=cfg)
        return jnp.sum(out), st

    grads, new_stats = jax.grad(d_sum, has_aux=True)(interp)
    # torch .norm(2, dim=1) over channels — NHWC ⇒ last axis
    norm = jnp.sqrt(jnp.sum(jnp.square(grads.astype(jnp.float32)), axis=-1) + 1e-12)
    return jnp.mean(jnp.square(norm - 1.0)) * lambda_term, new_stats


def convert_discriminator(sd, cfg: DiscriminatorConfig = DiscriminatorConfig()):
    """Reference NLayerDiscriminator state_dict → (params, stats).
    torch conv weight (O,I,H,W) → HWIO."""
    from ..convert.torch_weights import _np as np_

    # torch Sequential indices: [conv,leaky] + n-1 × [conv,bn,leaky] + final conv
    params, stats = [], []
    idx = 0
    params.append({'conv': {'kernel': np_(sd[f'model.{idx}.weight']).transpose(2, 3, 1, 0),
                            'bias': np_(sd[f'model.{idx}.bias'])}})
    stats.append({})
    idx += 2
    for _ in range(cfg.n_layers):
        p = {'conv': {'kernel': np_(sd[f'model.{idx}.weight']).transpose(2, 3, 1, 0)},
             'bn': {'scale': np_(sd[f'model.{idx+1}.weight']),
                    'bias': np_(sd[f'model.{idx+1}.bias'])}}
        s = {'bn': {'mean': np_(sd[f'model.{idx+1}.running_mean']),
                    'var': np_(sd[f'model.{idx+1}.running_var'])}}
        params.append(p)
        stats.append(s)
        idx += 3
    params.append({'conv': {'kernel': np_(sd[f'model.{idx}.weight']).transpose(2, 3, 1, 0),
                            'bias': np_(sd[f'model.{idx}.bias'])}})
    stats.append({})
    return params, stats

"""LPIPS perceptual loss (VGG16 backbone + learned linear heads) in JAX.

TPU-native port of the ``lpips`` package the reference trainer uses
(paintmind/utils/trainer.py:14, 108-110, 214): input in [-1, 1], fixed
channel shift/scale normalization, VGG16 features at relu1_2 / relu2_2 /
relu3_3 / relu4_3 / relu5_3, per-location channel-unit-normalization,
squared difference, 1×1 'lin' convs, spatial mean, sum over the five taps.

Weights: convert once from the torch ``lpips`` package via
``convert_lpips(lpips.LPIPS(net='vgg'))`` (needs network/packages at
conversion time only) and save to .npz; at train time we load the npz.
Without pretrained weights, ``init_lpips`` gives a random-VGG perceptual
loss (random-projection features — usable signal, NOT parity; a warning is
the trainer's job).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 feature config: channel widths per conv, 'M' = 2x2 maxpool
VGG16_CFG = [64, 64, 'M', 128, 128, 'M', 256, 256, 256, 'M',
             512, 512, 512, 'M', 512, 512, 512]
# tap points = indices (in conv-count) after whose relu we take features
TAP_AFTER_CONV = [2, 4, 7, 10, 13]  # relu1_2, relu2_2, relu3_3, relu4_3, relu5_3
TAP_CHANNELS = [64, 128, 256, 512, 512]

# lpips ScalingLayer constants (input in [-1,1])
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def init_lpips(key):
    keys = jax.random.split(key, len([c for c in VGG16_CFG if c != 'M']) + 5)
    ki = iter(keys)
    convs = []
    cin = 3
    for c in VGG16_CFG:
        if c == 'M':
            continue
        k = next(ki)
        fan_in = 3 * 3 * cin
        w = jax.random.normal(k, (3, 3, cin, c)) * np.sqrt(2.0 / fan_in)
        convs.append({'kernel': w, 'bias': jnp.zeros((c,))})
        cin = c
    lins = [{'kernel': jnp.abs(jax.random.normal(next(ki), (1, 1, c, 1))) / c}
            for c in TAP_CHANNELS]
    return {'convs': convs, 'lins': lins}


def _conv3x3(p, x):
    y = jax.lax.conv_general_dilated(
        x, p['kernel'].astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    return y + p['bias'].astype(x.dtype)


def _vgg_features(params, x):
    feats = []
    conv_i = 0
    for c in VGG16_CFG:
        if c == 'M':
            x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                      (1, 2, 2, 1), (1, 2, 2, 1), 'VALID')
            continue
        x = jax.nn.relu(_conv3x3(params['convs'][conv_i], x))
        conv_i += 1
        if conv_i in TAP_AFTER_CONV:
            feats.append(x)
    return feats


def _unit_normalize(x, eps=1e-10):
    n = jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True))
    return x / (n + eps)


def lpips(params, x, y):
    """x, y: (B, H, W, 3) in [-1, 1] → (B,) perceptual distances."""
    shift = jnp.asarray(_SHIFT, x.dtype)
    scale = jnp.asarray(_SCALE, x.dtype)
    fx = _vgg_features(params, (x - shift) / scale)
    fy = _vgg_features(params, (y - shift) / scale)
    total = 0.0
    for a, b, lin in zip(fx, fy, params['lins']):
        d = jnp.square(_unit_normalize(a.astype(jnp.float32))
                       - _unit_normalize(b.astype(jnp.float32)))
        w = lin['kernel'].astype(jnp.float32)[0, 0, :, 0]
        total = total + jnp.mean(jnp.sum(d * w, axis=-1), axis=(1, 2))
    return total


def convert_lpips(torch_lpips_module):
    """torch ``lpips.LPIPS(net='vgg')`` module → our pytree (one-time)."""
    sd = {k: np.array(v.detach().cpu().numpy())
          for k, v in torch_lpips_module.state_dict().items()}
    # lpips stores vgg as net.slice<N>.<torch_seq_idx>.*; order numerically
    def sort_key(k):
        parts = k.split('.')
        return (int(parts[1][len('slice'):]), int(parts[2]))

    slice_keys = sorted((k for k in sd
                         if k.startswith('net.slice') and k.endswith('.weight')),
                        key=sort_key)

    def torch_conv(wk):
        return {'kernel': sd[wk].transpose(2, 3, 1, 0),
                'bias': sd[wk.replace('.weight', '.bias')]}

    convs = [torch_conv(k) for k in slice_keys]
    lins = []
    for li in range(5):
        w = sd[f'lin{li}.model.1.weight']  # (1, C, 1, 1)
        lins.append({'kernel': w.transpose(2, 3, 1, 0)})
    return {'convs': convs, 'lins': lins}


def load_lpips(path):
    from ..utils.checkpoint import load_params
    template = init_lpips(jax.random.PRNGKey(0))
    return load_params(path, template=template)

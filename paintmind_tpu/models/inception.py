"""InceptionV3 pool3 feature extractor (for rFID) in JAX.

The BASELINE driver metric is "rec PSNR/rFID"; rFID is the Fréchet distance
between InceptionV3 pool3 (2048-d) activations of real and reconstructed
images.  This module is a faithful NHWC port of torchvision's ``Inception3``
feature path (conv stem → InceptionA/B/C/D/E towers → global average pool),
with a one-to-one state_dict converter, so real weights drop in the moment a
``torchvision`` checkpoint is available (this build environment has no
network egress and no torchvision weights anywhere — see BASELINE.md).

Until then, ``init_inception(key)`` provides a fixed-seed random-feature
extractor: rFID computed with it ("rFID-rand") is deterministic and
internally consistent (monotone in distribution mismatch — random-projection
Fréchet distances are a recognized degraded substitute), but NOT comparable
to literature FID numbers.  ``utils.metrics.fid`` consumes the features
either way.

Note on variants: literature FID (pytorch-fid / the TF implementation) uses
a TF-ported Inception with minor differences from torchvision's (pool
padding semantics in InceptionA/C, 1008-way logits).  The converter here
targets the torchvision ``Inception_V3_Weights.IMAGENET1K_V1`` layout;
numbers produced with it are torchvision-variant rFID.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_BN_EPS = 1e-3
POOL3_DIM = 2048


# ---------------------------------------------------------------------------
# Primitive: Conv(no bias) + BatchNorm(running stats) + ReLU  ("BasicConv2d")
# ---------------------------------------------------------------------------

def _init_basic_conv(key, cin, cout, kh, kw):
    fan_in = kh * kw * cin
    return {
        'kernel': jax.random.normal(key, (kh, kw, cin, cout),
                                    jnp.float32) * np.sqrt(2.0 / fan_in),
        'scale': jnp.ones((cout,)), 'bias': jnp.zeros((cout,)),
        'mean': jnp.zeros((cout,)), 'var': jnp.ones((cout,)),
    }


def _basic_conv(p, x, stride=(1, 1), padding=((0, 0), (0, 0))):
    y = jax.lax.conv_general_dilated(
        x, p['kernel'].astype(x.dtype), stride, padding,
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    inv = jax.lax.rsqrt(p['var'].astype(jnp.float32) + _BN_EPS)
    y = (y.astype(jnp.float32) - p['mean']) * inv * p['scale'] + p['bias']
    return jax.nn.relu(y).astype(x.dtype)


def _maxpool3x3_s2(x):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, 3, 3, 1), (1, 2, 2, 1), 'VALID')


def _avgpool3x3_s1p1(x):
    # torch AvgPool2d(3, stride=1, padding=1) default count_include_pad=True
    s = jax.lax.reduce_window(x.astype(jnp.float32), 0.0, jax.lax.add,
                              (1, 3, 3, 1), (1, 1, 1, 1),
                              [(0, 0), (1, 1), (1, 1), (0, 0)])
    return (s / 9.0).astype(x.dtype)


def _pad(ph, pw):
    return ((ph, ph), (pw, pw))


# ---------------------------------------------------------------------------
# Tower init
# ---------------------------------------------------------------------------

def _init_tower(key, spec):
    """spec: {name: (cin, cout, kh, kw)} → {name: BasicConv2d params}."""
    keys = jax.random.split(key, len(spec))
    return {name: _init_basic_conv(k, *dims)
            for k, (name, dims) in zip(keys, spec.items())}


def _a_spec(cin, pool):
    return {
        'branch1x1': (cin, 64, 1, 1),
        'branch5x5_1': (cin, 48, 1, 1), 'branch5x5_2': (48, 64, 5, 5),
        'branch3x3dbl_1': (cin, 64, 1, 1),
        'branch3x3dbl_2': (64, 96, 3, 3), 'branch3x3dbl_3': (96, 96, 3, 3),
        'branch_pool': (cin, pool, 1, 1),
    }


def _b_spec(cin):
    return {
        'branch3x3': (cin, 384, 3, 3),
        'branch3x3dbl_1': (cin, 64, 1, 1),
        'branch3x3dbl_2': (64, 96, 3, 3), 'branch3x3dbl_3': (96, 96, 3, 3),
    }


def _c_spec(cin, c7):
    return {
        'branch1x1': (cin, 192, 1, 1),
        'branch7x7_1': (cin, c7, 1, 1),
        'branch7x7_2': (c7, c7, 1, 7), 'branch7x7_3': (c7, 192, 7, 1),
        'branch7x7dbl_1': (cin, c7, 1, 1),
        'branch7x7dbl_2': (c7, c7, 7, 1), 'branch7x7dbl_3': (c7, c7, 1, 7),
        'branch7x7dbl_4': (c7, c7, 7, 1), 'branch7x7dbl_5': (c7, 192, 1, 7),
        'branch_pool': (cin, 192, 1, 1),
    }


def _d_spec(cin):
    return {
        'branch3x3_1': (cin, 192, 1, 1), 'branch3x3_2': (192, 320, 3, 3),
        'branch7x7x3_1': (cin, 192, 1, 1),
        'branch7x7x3_2': (192, 192, 1, 7), 'branch7x7x3_3': (192, 192, 7, 1),
        'branch7x7x3_4': (192, 192, 3, 3),
    }


def _e_spec(cin):
    return {
        'branch1x1': (cin, 320, 1, 1),
        'branch3x3_1': (cin, 384, 1, 1),
        'branch3x3_2a': (384, 384, 1, 3), 'branch3x3_2b': (384, 384, 3, 1),
        'branch3x3dbl_1': (cin, 448, 1, 1),
        'branch3x3dbl_2': (448, 384, 3, 3),
        'branch3x3dbl_3a': (384, 384, 1, 3),
        'branch3x3dbl_3b': (384, 384, 3, 1),
        'branch_pool': (cin, 192, 1, 1),
    }


_LAYOUT = [
    ('Conv2d_1a_3x3', (3, 32, 3, 3)),
    ('Conv2d_2a_3x3', (32, 32, 3, 3)),
    ('Conv2d_2b_3x3', (32, 64, 3, 3)),
    ('Conv2d_3b_1x1', (64, 80, 1, 1)),
    ('Conv2d_4a_3x3', (80, 192, 3, 3)),
    ('Mixed_5b', _a_spec(192, 32)),
    ('Mixed_5c', _a_spec(256, 64)),
    ('Mixed_5d', _a_spec(288, 64)),
    ('Mixed_6a', _b_spec(288)),
    ('Mixed_6b', _c_spec(768, 128)),
    ('Mixed_6c', _c_spec(768, 160)),
    ('Mixed_6d', _c_spec(768, 160)),
    ('Mixed_6e', _c_spec(768, 192)),
    ('Mixed_7a', _d_spec(768)),
    ('Mixed_7b', _e_spec(1280)),
    ('Mixed_7c', _e_spec(2048)),
]


def init_inception(key=None):
    """Random-feature InceptionV3 params (fixed seed 0 by default) — the
    documented rFID substitute when no converted weights exist."""
    key = jax.random.PRNGKey(0) if key is None else key
    keys = jax.random.split(key, len(_LAYOUT))
    params = {}
    for k, (name, spec) in zip(keys, _LAYOUT):
        if isinstance(spec, tuple):
            params[name] = _init_basic_conv(k, *spec)
        else:
            params[name] = _init_tower(k, spec)
    return params


# ---------------------------------------------------------------------------
# Towers forward
# ---------------------------------------------------------------------------

def _inception_a(p, x):
    b1 = _basic_conv(p['branch1x1'], x)
    b5 = _basic_conv(p['branch5x5_2'],
                     _basic_conv(p['branch5x5_1'], x), padding=_pad(2, 2))
    b3 = _basic_conv(p['branch3x3dbl_1'], x)
    b3 = _basic_conv(p['branch3x3dbl_2'], b3, padding=_pad(1, 1))
    b3 = _basic_conv(p['branch3x3dbl_3'], b3, padding=_pad(1, 1))
    bp = _basic_conv(p['branch_pool'], _avgpool3x3_s1p1(x))
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _inception_b(p, x):
    b3 = _basic_conv(p['branch3x3'], x, stride=(2, 2))
    bd = _basic_conv(p['branch3x3dbl_1'], x)
    bd = _basic_conv(p['branch3x3dbl_2'], bd, padding=_pad(1, 1))
    bd = _basic_conv(p['branch3x3dbl_3'], bd, stride=(2, 2))
    return jnp.concatenate([b3, bd, _maxpool3x3_s2(x)], axis=-1)


def _inception_c(p, x):
    b1 = _basic_conv(p['branch1x1'], x)
    b7 = _basic_conv(p['branch7x7_1'], x)
    b7 = _basic_conv(p['branch7x7_2'], b7, padding=_pad(0, 3))
    b7 = _basic_conv(p['branch7x7_3'], b7, padding=_pad(3, 0))
    bd = _basic_conv(p['branch7x7dbl_1'], x)
    bd = _basic_conv(p['branch7x7dbl_2'], bd, padding=_pad(3, 0))
    bd = _basic_conv(p['branch7x7dbl_3'], bd, padding=_pad(0, 3))
    bd = _basic_conv(p['branch7x7dbl_4'], bd, padding=_pad(3, 0))
    bd = _basic_conv(p['branch7x7dbl_5'], bd, padding=_pad(0, 3))
    bp = _basic_conv(p['branch_pool'], _avgpool3x3_s1p1(x))
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _inception_d(p, x):
    b3 = _basic_conv(p['branch3x3_2'],
                     _basic_conv(p['branch3x3_1'], x), stride=(2, 2))
    b7 = _basic_conv(p['branch7x7x3_1'], x)
    b7 = _basic_conv(p['branch7x7x3_2'], b7, padding=_pad(0, 3))
    b7 = _basic_conv(p['branch7x7x3_3'], b7, padding=_pad(3, 0))
    b7 = _basic_conv(p['branch7x7x3_4'], b7, stride=(2, 2))
    return jnp.concatenate([b3, b7, _maxpool3x3_s2(x)], axis=-1)


def _inception_e(p, x):
    b1 = _basic_conv(p['branch1x1'], x)
    b3 = _basic_conv(p['branch3x3_1'], x)
    b3 = jnp.concatenate([
        _basic_conv(p['branch3x3_2a'], b3, padding=_pad(0, 1)),
        _basic_conv(p['branch3x3_2b'], b3, padding=_pad(1, 0))], axis=-1)
    bd = _basic_conv(p['branch3x3dbl_1'], x)
    bd = _basic_conv(p['branch3x3dbl_2'], bd, padding=_pad(1, 1))
    bd = jnp.concatenate([
        _basic_conv(p['branch3x3dbl_3a'], bd, padding=_pad(0, 1)),
        _basic_conv(p['branch3x3dbl_3b'], bd, padding=_pad(1, 0))], axis=-1)
    bp = _basic_conv(p['branch_pool'], _avgpool3x3_s1p1(x))
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


# ImageNet normalization for the torchvision-weight path; inputs in [-1, 1]
_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def preprocess(images, size=299):
    """(B, H, W, 3) in [-1, 1] → resized, ImageNet-normalized (B, 299, 299, 3)."""
    x = (jnp.asarray(images, jnp.float32) + 1.0) / 2.0
    b = x.shape[0]
    x = jax.image.resize(x, (b, size, size, 3), 'bilinear')
    return (x - _IMAGENET_MEAN) / _IMAGENET_STD


@jax.jit
def pool3_features(params, images):
    """images: (B, H, W, 3) in [-1, 1] → (B, 2048) pool3 activations."""
    x = preprocess(images)
    x = _basic_conv(params['Conv2d_1a_3x3'], x, stride=(2, 2))
    x = _basic_conv(params['Conv2d_2a_3x3'], x)
    x = _basic_conv(params['Conv2d_2b_3x3'], x, padding=_pad(1, 1))
    x = _maxpool3x3_s2(x)
    x = _basic_conv(params['Conv2d_3b_1x1'], x)
    x = _basic_conv(params['Conv2d_4a_3x3'], x)
    x = _maxpool3x3_s2(x)
    for name in ('Mixed_5b', 'Mixed_5c', 'Mixed_5d'):
        x = _inception_a(params[name], x)
    x = _inception_b(params['Mixed_6a'], x)
    for name in ('Mixed_6b', 'Mixed_6c', 'Mixed_6d', 'Mixed_6e'):
        x = _inception_c(params[name], x)
    x = _inception_d(params['Mixed_7a'], x)
    x = _inception_e(params['Mixed_7b'], x)
    x = _inception_e(params['Mixed_7c'], x)
    return jnp.mean(x, axis=(1, 2)).astype(jnp.float32)


# ---------------------------------------------------------------------------
# Weight conversion / loading
# ---------------------------------------------------------------------------

def convert_inception(state_dict):
    """torchvision ``Inception3`` state_dict (tensors or numpy) → our pytree.

    Keys look like ``Mixed_5b.branch1x1.conv.weight`` /
    ``...bn.{weight,bias,running_mean,running_var}``; the stem convs are
    ``Conv2d_1a_3x3.conv.weight`` etc.  Aux/fc entries are ignored."""
    sd = {k: np.asarray(getattr(v, 'detach', lambda: v)().cpu().numpy()
                        if hasattr(v, 'detach') else v)
          for k, v in state_dict.items()}

    def basic(prefix):
        return {
            'kernel': sd[f'{prefix}.conv.weight'].transpose(2, 3, 1, 0),
            'scale': sd[f'{prefix}.bn.weight'],
            'bias': sd[f'{prefix}.bn.bias'],
            'mean': sd[f'{prefix}.bn.running_mean'],
            'var': sd[f'{prefix}.bn.running_var'],
        }

    params = {}
    for name, spec in _LAYOUT:
        if isinstance(spec, tuple):
            params[name] = basic(name)
        else:
            params[name] = {b: basic(f'{name}.{b}') for b in spec}
    return params


def load_inception(path):
    from ..utils.checkpoint import load_params
    return load_params(path, template=init_inception())

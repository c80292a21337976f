"""On-device (XLA) batched image preprocessing.

The BASELINE north star asks for stage1_transform/stage2_transform
(resize → crop (+flip) → normalize; reference paintmind/utils/transform.py)
to execute on device: decode bytes → uint8 on host, everything else here as
one jitted batched program — bicubic resize on the VPU, per-sample random
crops via vmapped dynamic_slice, flips, and the [-1, 1] normalization fused.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _crop_one(img, top, left, size):
    return jax.lax.dynamic_slice(img, (top, left, 0),
                                 (size, size, img.shape[-1]))


@functools.partial(jax.jit, static_argnames=('img_size', 'scale', 'is_train',
                                             'hflip', 'dtype'))
def batched_transform(imgs, key=None, *, img_size=256, scale=0.8,
                      is_train=True, hflip=True, dtype=jnp.float32):
    """imgs: (B, H, W, C) uint8 (or float in [0,255]) → (B, img_size,
    img_size, C) in [-1, 1].

    Matches the host transforms (utils/transform.py): exact-size bicubic
    resize to (img_size/scale)² (aspect NOT preserved, like the reference's
    tuple Resize), then random crop + optional horizontal flip (train) or
    center crop (eval)."""
    b = imgs.shape[0]
    resize = int(img_size / scale)
    x = imgs.astype(jnp.float32) / 255.0
    x = jax.image.resize(x, (b, resize, resize, x.shape[-1]), method='cubic')
    x = jnp.clip(x, 0.0, 1.0)

    max_off = resize - img_size
    if is_train:
        if key is None:
            raise ValueError('training transform needs a PRNG key')
        k_top, k_left, k_flip = jax.random.split(key, 3)
        tops = jax.random.randint(k_top, (b,), 0, max_off + 1)
        lefts = jax.random.randint(k_left, (b,), 0, max_off + 1)
        x = jax.vmap(_crop_one, in_axes=(0, 0, 0, None))(x, tops, lefts,
                                                         img_size)
        if hflip:
            flips = jax.random.bernoulli(k_flip, 0.5, (b,))
            x = jnp.where(flips[:, None, None, None], x[:, :, ::-1, :], x)
    else:
        off = max_off // 2
        x = x[:, off:off + img_size, off:off + img_size, :]
    return (x * 2.0 - 1.0).astype(dtype)


def stage1_transform_device(imgs, key=None, img_size=256, is_train=True,
                            scale=0.8, dtype=jnp.float32):
    """On-device stage1_transform (resize/crop/hflip/normalize)."""
    return batched_transform(imgs, key, img_size=img_size, scale=scale,
                             is_train=is_train, hflip=True, dtype=dtype)


def stage2_transform_device(imgs, key=None, img_size=256, is_train=True,
                            scale=0.8, dtype=jnp.float32):
    """On-device stage2_transform (no flip — text-image alignment)."""
    return batched_transform(imgs, key, img_size=img_size, scale=scale,
                             is_train=is_train, hflip=False, dtype=dtype)

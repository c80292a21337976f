"""Resolution adaptation: interpolate learned position embeddings so a
checkpoint trained at one image size initializes a higher-resolution
variant (e.g. the 256² ``vit-s-vqgan`` → the 512² extension, 1024 → 4096
latent tokens; config.py:102-120).

Standard ViT practice (DeiT/MAE fine-tuning): reshape the (1, g², D) table
to its (g, g, D) grid, bicubic-resize to the new grid, flatten back.  All
other weights transfer unchanged — patch size is identical, only the token
count grows.  The reference has no analogue (it has no 512² path at all).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def interpolate_pos_embed(pos, new_len):
    """(1, L, D) learned pos-embed → (1, new_len, D) by bicubic grid
    resize.  L and new_len must both be square grids (ViT patch layout)."""
    _, l, d = pos.shape
    if l == new_len:
        return pos
    g = int(round(math.sqrt(l)))
    ng = int(round(math.sqrt(new_len)))
    if g * g != l or ng * ng != new_len:
        raise ValueError(f'pos-embed lengths must be square grids; '
                         f'got {l} -> {new_len}')
    grid = pos.reshape(g, g, d)
    out = jax.image.resize(grid.astype(jnp.float32), (ng, ng, d),
                           method='cubic')
    return out.reshape(1, new_len, d).astype(pos.dtype)


def adapt_vqmodel_resolution(params, new_num_patches):
    """VQModel params trained at one grid → params for ``new_num_patches``
    (encoder + decoder pos-embeds interpolated, everything else shared)."""
    params = dict(params)
    for tower in ('encoder', 'decoder'):
        t = dict(params[tower])
        t['pos_embed'] = interpolate_pos_embed(t['pos_embed'],
                                               new_num_patches)
        params[tower] = t
    return params


def adapt_pipeline_resolution(params, new_num_tokens):
    """Stage-2 pipeline params → higher token count: vqgan towers plus the
    conditional transformer's sequence pos-embed."""
    params = dict(params)
    params['vqgan'] = adapt_vqmodel_resolution(params['vqgan'],
                                               new_num_tokens)
    tr = dict(params['transformer'])
    tr['pos_embed'] = interpolate_pos_embed(tr['pos_embed'], new_num_tokens)
    params['transformer'] = tr
    return params

"""JAX CLIP text/image embedders.

Ports of the reference's open_clip-based embedders
(paintmind/modules/encoder.py:45-151 — ViT-L-14, laion2b weights; defined in
the reference but unused by any pipeline, kept for conditioning parity):

  * CLIPTextEmbedder: token embedding + learned positions → causal
    pre-LN transformer → ln_final; ``layer='last'|'penultimate'`` selects
    how many resblocks run (encoder.py:63-71, 96-104).
  * CLIPImageEmbedder: bicubic resize to 224 → conv patch embed (14) →
    [CLS; patches] + positions → ln_pre → transformer → patch tokens
    (drops CLS, no ln_post — exactly the reference's
    ``encode_with_transformer``, encoder.py:136-150).

Blocks are standard pre-LN MHA (packed qkv with bias) + GELU MLP — laion2b
open_clip models use exact (not quick) GELU.  ``convert_clip_text`` /
``convert_clip_visual`` map open_clip state_dicts (torch MultiheadAttention
``in_proj_weight`` layout) onto these pytrees.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    width: int = 768
    heads: int = 12
    layers: int = 12
    context_length: int = 77


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 14
    width: int = 1024
    heads: int = 16
    layers: int = 24


def _mha(p, x, heads, mask=None):
    """torch.nn.MultiheadAttention math: packed qkv with bias, out proj."""
    b, n, d = x.shape
    qkv = x @ p['in_proj_w'].astype(x.dtype) + p['in_proj_b'].astype(x.dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    hd = d // heads
    q = q.reshape(b, n, heads, hd)
    k = k.reshape(b, n, heads, hd)
    v = v.reshape(b, n, heads, hd)
    logits = jnp.einsum('bnhd,bmhd->bhnm', q * (hd ** -0.5), k,
                        preferred_element_type=jnp.float32)
    if mask is not None:
        logits = logits + mask
    probs = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(x.dtype)
    out = jnp.einsum('bhnm,bmhd->bnhd', probs, v).reshape(b, n, d)
    return out @ p['out_proj_w'].astype(x.dtype) + p['out_proj_b'].astype(x.dtype)


def _ln(p, x, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mean = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * p['scale'] + p['bias']).astype(x.dtype)


def _resblock(p, x, heads, mask=None):
    x = x + _mha(p['attn'], _ln(p['ln_1'], x), heads, mask)
    h = _ln(p['ln_2'], x)
    h = jax.nn.gelu(h @ p['mlp_fc_w'].astype(x.dtype)
                    + p['mlp_fc_b'].astype(x.dtype), approximate=False)
    return x + (h @ p['mlp_proj_w'].astype(x.dtype)
                + p['mlp_proj_b'].astype(x.dtype))


def _init_resblock(key, width):
    ks = jax.random.split(key, 4)
    s = width ** -0.5
    return {
        'ln_1': {'scale': jnp.ones(width), 'bias': jnp.zeros(width)},
        'attn': {
            'in_proj_w': jax.random.normal(ks[0], (width, 3 * width)) * s,
            'in_proj_b': jnp.zeros(3 * width),
            'out_proj_w': jax.random.normal(ks[1], (width, width)) * s,
            'out_proj_b': jnp.zeros(width),
        },
        'ln_2': {'scale': jnp.ones(width), 'bias': jnp.zeros(width)},
        'mlp_fc_w': jax.random.normal(ks[2], (width, 4 * width)) * s,
        'mlp_fc_b': jnp.zeros(4 * width),
        'mlp_proj_w': jax.random.normal(ks[3], (4 * width, width)) * s,
        'mlp_proj_b': jnp.zeros(width),
    }


# ---------------------------------------------------------------------------
# Text tower
# ---------------------------------------------------------------------------

def init_clip_text(key, cfg: CLIPTextConfig = CLIPTextConfig()):
    ks = jax.random.split(key, cfg.layers + 2)
    return {
        'token_embedding': jax.random.normal(
            ks[0], (cfg.vocab_size, cfg.width)) * 0.02,
        'positional_embedding': jax.random.normal(
            ks[1], (cfg.context_length, cfg.width)) * 0.01,
        'resblocks': [_init_resblock(ks[2 + i], cfg.width)
                      for i in range(cfg.layers)],
        'ln_final': {'scale': jnp.ones(cfg.width), 'bias': jnp.zeros(cfg.width)},
    }


def clip_text_encode(params, token_ids, cfg: CLIPTextConfig = CLIPTextConfig(),
                     layer='last', dtype=jnp.float32):
    """token_ids: (B, 77) int → (B, 77, width) token features
    (reference encoder.py:90-104: causal mask, stop layer_idx blocks early
    for 'penultimate', then ln_final)."""
    x = jnp.take(params['token_embedding'], token_ids, axis=0).astype(dtype)
    x = x + params['positional_embedding'].astype(dtype)
    n = x.shape[1]
    mask = jnp.triu(jnp.full((n, n), -jnp.inf, jnp.float32), k=1)[None, None]
    stop = len(params['resblocks']) - (1 if layer == 'penultimate' else 0)
    for p in params['resblocks'][:stop]:
        x = _resblock(p, x, cfg.heads, mask)
    return _ln(params['ln_final'], x)


# ---------------------------------------------------------------------------
# Visual tower
# ---------------------------------------------------------------------------

def init_clip_visual(key, cfg: CLIPVisionConfig = CLIPVisionConfig()):
    grid = cfg.image_size // cfg.patch_size
    ks = jax.random.split(key, cfg.layers + 3)
    s = cfg.width ** -0.5
    return {
        'conv1': jax.random.normal(
            ks[0], (cfg.patch_size ** 2 * 3, cfg.width)) * s,
        'class_embedding': jax.random.normal(ks[1], (cfg.width,)) * s,
        'positional_embedding': jax.random.normal(
            ks[2], (grid * grid + 1, cfg.width)) * s,
        'ln_pre': {'scale': jnp.ones(cfg.width), 'bias': jnp.zeros(cfg.width)},
        'resblocks': [_init_resblock(ks[3 + i], cfg.width)
                      for i in range(cfg.layers)],
    }


def clip_image_encode(params, images,
                      cfg: CLIPVisionConfig = CLIPVisionConfig(),
                      dtype=jnp.float32):
    """images: (B, H, W, 3) in [-1, 1] → (B, grid², width) patch tokens
    (reference encoder.py:125-150: bicubic resize to 224, CLS dropped, no
    ln_post)."""
    from .vqmodel import patchify
    b = images.shape[0]
    if images.shape[1] != cfg.image_size:
        images = jax.image.resize(
            images.astype(jnp.float32),
            (b, cfg.image_size, cfg.image_size, images.shape[-1]),
            method='cubic')
    x = patchify(images.astype(dtype), cfg.patch_size)
    x = x @ params['conv1'].astype(dtype)
    cls = (params['class_embedding'].astype(dtype)
           + jnp.zeros((b, 1, cfg.width), dtype))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params['positional_embedding'].astype(dtype)
    x = _ln(params['ln_pre'], x)
    for p in params['resblocks']:
        x = _resblock(p, x, cfg.heads)
    return x[:, 1:]


# ---------------------------------------------------------------------------
# Converters (open_clip state_dict layout)
# ---------------------------------------------------------------------------

from ..convert.torch_weights import _np


def _conv_resblock(sd, pre):
    return {
        'ln_1': {'scale': _np(sd[pre + '.ln_1.weight']),
                 'bias': _np(sd[pre + '.ln_1.bias'])},
        'attn': {
            'in_proj_w': _np(sd[pre + '.attn.in_proj_weight']).T,
            'in_proj_b': _np(sd[pre + '.attn.in_proj_bias']),
            'out_proj_w': _np(sd[pre + '.attn.out_proj.weight']).T,
            'out_proj_b': _np(sd[pre + '.attn.out_proj.bias']),
        },
        'ln_2': {'scale': _np(sd[pre + '.ln_2.weight']),
                 'bias': _np(sd[pre + '.ln_2.bias'])},
        'mlp_fc_w': _np(sd[pre + '.mlp.c_fc.weight']).T,
        'mlp_fc_b': _np(sd[pre + '.mlp.c_fc.bias']),
        'mlp_proj_w': _np(sd[pre + '.mlp.c_proj.weight']).T,
        'mlp_proj_b': _np(sd[pre + '.mlp.c_proj.bias']),
    }


def convert_clip_text(sd, prefix=''):
    i, blocks = 0, []
    while f'{prefix}transformer.resblocks.{i}.ln_1.weight' in sd:
        blocks.append(_conv_resblock(sd, f'{prefix}transformer.resblocks.{i}'))
        i += 1
    return {
        'token_embedding': _np(sd[prefix + 'token_embedding.weight']),
        'positional_embedding': _np(sd[prefix + 'positional_embedding']),
        'resblocks': blocks,
        'ln_final': {'scale': _np(sd[prefix + 'ln_final.weight']),
                     'bias': _np(sd[prefix + 'ln_final.bias'])},
    }


def convert_clip_visual(sd, prefix='visual.'):
    i, blocks = 0, []
    while f'{prefix}transformer.resblocks.{i}.ln_1.weight' in sd:
        blocks.append(_conv_resblock(sd, f'{prefix}transformer.resblocks.{i}'))
        i += 1
    conv_w = _np(sd[prefix + 'conv1.weight'])  # (width, 3, p, p)
    width = conv_w.shape[0]
    return {
        'conv1': conv_w.transpose(2, 3, 1, 0).reshape(-1, width),
        'class_embedding': _np(sd[prefix + 'class_embedding']),
        'positional_embedding': _np(sd[prefix + 'positional_embedding']),
        'ln_pre': {'scale': _np(sd[prefix + 'ln_pre.weight']),
                   'bias': _np(sd[prefix + 'ln_pre.bias'])},
        'resblocks': blocks,
    }


def load_image_tower(path, dtype=jnp.float32, heads=None):
    """Rebuild a CLIPImageEmbedder from params saved with
    utils.checkpoint.save_params (e.g. the ``tower.npz`` a
    tools/train_imgvar.py run writes).  Layers/width/patch/grid are
    inferred from parameter shapes; the head count is NOT shape-derivable,
    so it comes from (in priority order) the ``heads`` argument, a
    ``__cfg__/heads`` entry embedded in the artifact (train_imgvar saves
    one), or the ViT convention width // 64 — a tower built with any
    other head count MUST carry one of the first two or attention math
    silently diverges from training."""
    from ..utils.checkpoint import load_flat, unflatten_like
    flat = load_flat(path)
    layer_ids = [int(k.split('/')[1]) for k in flat
                 if k.startswith('resblocks/')]
    if not layer_ids:
        raise ValueError(f'{path}: no resblocks/* entries — not a '
                         'CLIPImageEmbedder artifact')
    n_layers = 1 + max(layer_ids)
    width = int(flat['class_embedding'].shape[0])
    patch = int(round((flat['conv1'].shape[0] // 3) ** 0.5))
    grid = int(round((flat['positional_embedding'].shape[0] - 1) ** 0.5))
    if heads is None:
        if '__cfg__/heads' in flat:
            heads = int(flat['__cfg__/heads'])
        else:
            heads = max(width // 64, 1)
    cfg = CLIPVisionConfig(image_size=patch * grid, patch_size=patch,
                           width=width, heads=heads, layers=n_layers)
    tower = CLIPImageEmbedder(cfg=cfg, dtype=dtype)
    tower.params = unflatten_like(
        tower.params, {k: v for k, v in flat.items()
                       if not k.startswith('__cfg__')})
    return tower


def save_image_tower(path, tower):
    """Save a CLIPImageEmbedder with its config embedded (so
    load_image_tower reconstructs the exact architecture, heads
    included)."""
    from ..utils.checkpoint import save_params
    cfg = tower.cfg
    return save_params(path, {
        **tower.params,
        '__cfg__': {'heads': np.asarray(cfg.heads, np.int32)},
    })


class CLIPTextEmbedder:
    """Reference call contract (encoder.py:45-104): tokenized text →
    (B, 77, width); needs an open_clip tokenizer or precomputed ids."""

    def __init__(self, params=None, cfg=CLIPTextConfig(), layer='last',
                 tokenizer=None, dtype=jnp.float32, seed=0):
        assert layer in ('last', 'penultimate')
        self.cfg, self.layer, self.tokenizer = cfg, layer, tokenizer
        self.params = params or init_clip_text(jax.random.PRNGKey(seed), cfg)
        self._encode = jax.jit(functools.partial(
            clip_text_encode, cfg=cfg, layer=layer, dtype=dtype))

    def __call__(self, text):
        if isinstance(text, (list, tuple)) and text and isinstance(text[0], str):
            if self.tokenizer is None:
                raise RuntimeError(
                    'CLIPTextEmbedder built without a tokenizer (the CLIP '
                    'BPE vocab is an open_clip asset, unavailable offline) '
                    '— pass pre-tokenized (B, 77) int ids, or construct '
                    'with tokenizer=open_clip.tokenize')
            text = self.tokenizer(list(text))
        return self._encode(self.params, jnp.asarray(text, jnp.int32))

    encode = __call__


class CLIPImageEmbedder:
    """Reference call contract (encoder.py:107-151): images in [-1, 1] →
    (B, 256, width) patch tokens."""

    def __init__(self, params=None, cfg=CLIPVisionConfig(),
                 dtype=jnp.float32, seed=0):
        self.cfg = cfg
        self.params = params or init_clip_visual(jax.random.PRNGKey(seed), cfg)
        self._encode = jax.jit(functools.partial(
            clip_image_encode, cfg=cfg, dtype=dtype))

    def __call__(self, images):
        return self._encode(self.params, jnp.asarray(images))

    encode = __call__

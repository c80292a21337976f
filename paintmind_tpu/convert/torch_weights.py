"""Reference (PyTorch) checkpoint → JAX param-pytree conversion.

The reference publishes ``RootYuan/vit-s-vqgan`` as a torch ``state_dict``
(.pt); loading is ``load_state_dict(torch.load(path))``
(reference paintmind/stage1/vqmodel.py:43-44, paintmind/factory.py:16-19).
This module maps those state_dicts onto our pytrees:

  * Linear:  torch (out, in) weight  →  'kernel' (in, out)
  * patch-embed Conv2d: (out, c, kh, kw) → (kh·kw·c, out) matmul kernel,
    matching models/vqmodel.patchify's (p1, p2, c) flatten order
  * transformer layers i = 0..depth-1 → stacked along a leading depth axis
  * SwiGLU: fused 'w12' or split 'w1'/'w2' (xformers packed vs unpacked)
    both accepted; our layout is always fused (in, 2·hidden)

Conversion needs torch only to deserialize; tensors leave as numpy.
"""

from __future__ import annotations

import numpy as np


def _np(t):
    # copy: torch .numpy() shares memory, and in-place torch updates (e.g.
    # BatchNorm running stats) would silently mutate converted weights
    if isinstance(t, np.ndarray):
        return np.array(t)
    return np.array(t.detach().cpu().numpy())


def _linear(sd, prefix, bias=True):
    p = {'kernel': _np(sd[prefix + '.weight']).T}
    if bias and prefix + '.bias' in sd:
        p['bias'] = _np(sd[prefix + '.bias'])
    return p


def _layernorm(sd, prefix):
    return {'scale': _np(sd[prefix + '.weight']), 'bias': _np(sd[prefix + '.bias'])}


def _swiglu(sd, prefix):
    if prefix + '.w12.weight' in sd:
        w12 = _linear(sd, prefix + '.w12')
    else:  # unpacked xformers SwiGLU: w1 / w2
        k = np.concatenate([_np(sd[prefix + '.w1.weight']).T,
                            _np(sd[prefix + '.w2.weight']).T], axis=-1)
        b = np.concatenate([_np(sd[prefix + '.w1.bias']),
                            _np(sd[prefix + '.w2.bias'])], axis=-1)
        w12 = {'kernel': k, 'bias': b}
    return {'w12': w12, 'w3': _linear(sd, prefix + '.w3')}


def _attention(sd, prefix):
    return {
        'to_q': _linear(sd, prefix + '.to_q', bias=False),
        'to_k': _linear(sd, prefix + '.to_k', bias=False),
        'to_v': _linear(sd, prefix + '.to_v', bias=False),
        'to_out': _linear(sd, prefix + '.to_out.0'),
    }


def _stack(per_layer):
    """List of per-layer param dicts → stacked pytree (leading depth axis)."""
    import jax
    return jax.tree_util.tree_map(lambda *xs: np.stack(xs), *per_layer)


def _block(sd, prefix, cross=False):
    p = {
        'norm1': _layernorm(sd, prefix + '.norm1'),
        'attn1': _attention(sd, prefix + '.attn1'),
        'norm2': _layernorm(sd, prefix + '.norm2'),
        'ffnet': _swiglu(sd, prefix + '.ffnet'),
    }
    if cross:
        p['attn2'] = _attention(sd, prefix + '.attn2')
        p['norm3'] = _layernorm(sd, prefix + '.norm3')
    return p


def _depth_of(sd, prefix):
    i = 0
    while f'{prefix}.{i}.norm1.weight' in sd:
        i += 1
    return i


def convert_vqmodel(sd):
    """Reference VQModel state_dict → our param pytree
    (layout: models/vqmodel.init_vqmodel)."""
    sd = {k: v for k, v in sd.items()}
    conv_w = _np(sd['encoder.to_patch_embedding.0.weight'])  # (out,c,kh,kw)
    out_dim = conv_w.shape[0]
    patch_kernel = conv_w.transpose(2, 3, 1, 0).reshape(-1, out_dim)

    enc_depth = _depth_of(sd, 'encoder.transformer.layers')
    dec_depth = _depth_of(sd, 'decoder.transformer.layers')
    return {
        'encoder': {
            'patch_embed': {'kernel': patch_kernel},
            'pos_embed': _np(sd['encoder.position_embedding']),
            'norm_pre': _layernorm(sd, 'encoder.norm_pre'),
            'layers': _stack([_block(sd, f'encoder.transformer.layers.{i}')
                              for i in range(enc_depth)]),
        },
        'decoder': {
            'pos_embed': _np(sd['decoder.position_embedding']),
            'layers': _stack([_block(sd, f'decoder.transformer.layers.{i}')
                              for i in range(dec_depth)]),
            'norm': _layernorm(sd, 'decoder.norm'),
            'proj': _linear(sd, 'decoder.proj'),
        },
        'quantize': {'codebook': _np(sd['quantize.embedding.weight'])},
        'prev_quant': _linear(sd, 'prev_quant'),
        'post_quant': _linear(sd, 'post_quant'),
    }


def convert_cond_transformer(sd, prefix=''):
    """Reference CondTransformer state_dict → our param pytree
    (layout: models/transformer.init_cond_transformer)."""
    pre = prefix
    depth = 0
    while f'{pre}layers.layer{depth}.norm1.weight' in sd:
        depth += 1
    p = {
        'token_proj': _linear(sd, pre + 'token_proj'),
        'pos_embed': _np(sd[pre + 'position_embedding']),
        'layers': _stack([_block(sd, f'{pre}layers.layer{i}', cross=True)
                          for i in range(depth)]),
        'norm': _layernorm(sd, pre + 'norm'),
        'to_logits': _linear(sd, pre + 'to_logits'),
    }
    if pre + 'context_proj.weight' in sd:
        p['context_proj'] = _linear(sd, pre + 'context_proj', bias=False)
    return p


def convert_pipeline(sd):
    """Reference Pipeline state_dict (includes frozen vqgan; T5 weights are
    skipped — the text tower loads from its own assets) → our pytree
    (layout: models/pipeline.Pipeline)."""
    vq_sd = {k[len('vqgan.'):]: v for k, v in sd.items() if k.startswith('vqgan.')}
    return {
        'vqgan': convert_vqmodel(vq_sd),
        'transformer': convert_cond_transformer(sd, 'transformer.'),
        'mask_token': _np(sd['mask_token']),
    }


def load_torch_state_dict(path):
    import torch
    sd = torch.load(path, map_location='cpu', weights_only=True)
    if hasattr(sd, 'state_dict'):
        sd = sd.state_dict()
    return sd

"""Checkpoint IO: npz / orbax for our pytrees, plus reference .pt import.

The reference saves bare ``state_dict`` .pt files and restores with
``load_state_dict(torch.load(path))`` (paintmind/utils/trainer.py:261-264,
paintmind/stage1/vqmodel.py:43-44).  We support three formats:

  * ``*.pt``          — reference torch checkpoints, converted on load
                        (convert/torch_weights); this keeps
                        ``create_model(pretrained=True)`` working against the
                        published RootYuan weights.
  * ``*.npz``         — flat single-file numpy archive (fast, dependency-free).
  * directory         — orbax StandardCheckpointer (async-capable; used by the
                        trainers for full train state: params + opt state +
                        step + PRNG key, which exceeds the reference's
                        model-only snapshots).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

SEP = '/'


BF16_TAG = '::bf16'


def flatten_tree(tree):
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = SEP.join(str(getattr(p, 'key', getattr(p, 'idx', p))) for p in path)
        arr = np.asarray(leaf)
        if arr.dtype == jnp.bfloat16:
            # np.savez stores bf16 as an opaque void16 ('V2') that cannot
            # be cast back on load — store the raw 2-byte payload as
            # uint16 under a tagged key (keeps the artifact half the size
            # of an f32 upcast; the loader views it back)
            key += BF16_TAG
            arr = arr.view(np.uint16)
        flat[key] = arr
    return flat


def unflatten_like(template, flat):
    paths, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path, leaf in paths:
        key = SEP.join(str(getattr(p, 'key', getattr(p, 'idx', p))) for p in path)
        if key in flat:
            value = np.asarray(flat[key])
        elif key + BF16_TAG in flat:
            value = np.asarray(flat[key + BF16_TAG]).view(jnp.bfloat16)
        else:
            raise KeyError(f'checkpoint missing parameter {key!r}')
        if value.dtype.kind == 'V' and value.dtype.itemsize == 2:
            # pre-tag artifact written with raw bf16 bytes (see flatten_tree)
            value = value.view(jnp.bfloat16)
        if value.shape != leaf.shape:
            raise ValueError(f'shape mismatch for {key!r}: checkpoint '
                             f'{value.shape} vs model {leaf.shape}')
        leaves.append(jnp.asarray(value, dtype=leaf.dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def load_flat(path):
    """npz → flat {key: ndarray} with bf16 tags resolved (see BF16_TAG)."""
    out = {}
    with np.load(path) as data:
        for k in data.files:
            v = data[k]
            if k.endswith(BF16_TAG):
                out[k[:-len(BF16_TAG)]] = v.view(jnp.bfloat16)
            elif v.dtype.kind == 'V' and v.dtype.itemsize == 2:
                out[k] = v.view(jnp.bfloat16)  # pre-tag raw bf16 artifact
            else:
                out[k] = v
    return out


def save_params(path, params):
    if str(path).endswith('.npz'):
        np.savez(path, **flatten_tree(params))
    else:
        import orbax.checkpoint as ocp
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.abspath(path),
                   jax.tree_util.tree_map(np.asarray, params))
        ckptr.wait_until_finished()
    return path


def load_params(path, template, model='vqgan'):
    """Load params from .pt / .npz / orbax dir into the template's structure."""
    path = str(path)
    if path.endswith('.pt') or path.endswith('.pth') or path.endswith('.bin'):
        from ..convert import torch_weights as tw
        sd = tw.load_torch_state_dict(path)
        if model == 'vqgan':
            converted = tw.convert_vqmodel(sd)
        elif model == 'pipeline':
            converted = tw.convert_pipeline(sd)
        elif model == 'cond_transformer':
            converted = tw.convert_cond_transformer(sd)
        else:
            raise ValueError(f'unknown model kind {model!r}')
        return unflatten_like(template, flatten_tree(converted))
    if path.endswith('.npz'):
        with np.load(path) as data:
            return unflatten_like(template, dict(data))
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(os.path.abspath(path),
                             jax.tree_util.tree_map(np.asarray, template))
    return jax.tree_util.tree_map(jnp.asarray, restored)

"""Stage-1 reconstruction demo (reference: paintmind/reconstruct.py:23-52).

Open-or-download an image, eval-mode stage1_transform, encode→decode through
the pretrained vit-s-vqgan, and return a side-by-side origin/reconstruct PIL
figure with titles.
"""

from __future__ import annotations

import io

import jax.numpy as jnp
import numpy as np
from PIL import Image, ImageDraw, ImageFont


def restore(x):
    """[-1,1] HWC array → PIL image (reference reconstruct.py:11-16)."""
    x = np.asarray(x)
    if x.ndim == 3 and x.shape[0] in (1, 3) and x.shape[-1] not in (1, 3):
        x = x.transpose(1, 2, 0)
    x = (np.clip(x, -1.0, 1.0) + 1.0) * 0.5
    return Image.fromarray((255 * x).astype(np.uint8))


def download_image(url):
    import urllib.request
    with urllib.request.urlopen(url) as resp:
        return Image.open(io.BytesIO(resp.read()))


def reconstruction(img_path=None, model_name='vit-s-vqgan',
                   titles=('origin', 'reconstruct'), checkpoint_path=None,
                   scale=0.8, device=None, model=None):
    """``device`` is accepted for reference API parity; placement is managed
    by JAX.  Pass ``model`` to reuse an already-constructed VQModel."""
    from . import factory
    from .utils.transform import stage1_transform

    w, h = 256, 256
    if isinstance(img_path, Image.Image):
        img = img_path
    elif str(img_path).startswith('http'):
        img = download_image(img_path)
    else:
        img = Image.open(img_path).convert('RGB')

    x = stage1_transform(is_train=False, scale=scale)(img)

    if model is None:
        model = factory.create_model(arch='vqgan', version=model_name,
                                     pretrained=True,
                                     checkpoint_path=checkpoint_path)
    z, _, _ = model.encode(x[None])
    rec = np.asarray(model.decode(z)[0])

    fig = Image.new('RGB', (2 * w, h))
    fig.paste(restore(x), (0, 0))
    fig.paste(restore(rec), (w, 0))
    try:
        font = ImageFont.truetype('arialbi.ttf', 16)
    except Exception:
        font = None
    for i, title in enumerate(titles):
        ImageDraw.Draw(fig).text((i * w, 0), f'{title}', (255, 255, 255), font=font)
    return fig

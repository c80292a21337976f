#!/usr/bin/env python
"""Build a small real-photo training corpus from the reference README assets.

The reference repo ships five side-by-side origin|reconstruction figures
(`/root/reference/assets/rec_{1..5}.png`, each 512x256 — the LEFT half is the
original 256x256 photograph; reconstruct.py:39-52 pastes origin at x=0) plus
one 768x768 sample image.  Those photographs are the only real images
available in this offline environment, so they seed the from-scratch
training run that makes the driver's quality metrics (rec PSNR / rFID)
measurable against a *trained* tokenizer instead of random init.

Usage:
  python tools/make_photo_corpus.py --out ./data/photos --n-crops 2048
"""

import argparse
import os

import numpy as np
from PIL import Image

REC_FIGURES = [f'/root/reference/assets/rec_{i}.png' for i in range(1, 6)]
EXTRA = ['/root/reference/assets/A_beautiful_girl_celebrating_her_birthday.png']


def load_sources():
    srcs = []
    for p in REC_FIGURES:
        if os.path.exists(p):
            fig = Image.open(p).convert('RGB')
            w, h = fig.size
            srcs.append(fig.crop((0, 0, w // 2, h)))  # left half = origin
    for p in EXTRA:
        if os.path.exists(p):
            srcs.append(Image.open(p).convert('RGB'))
    if not srcs:
        raise SystemExit('no source images found under /root/reference/assets')
    return srcs


def random_crop(img, rng, out_size=256):
    w, h = img.size
    # scale: crop side between 60% and 100% of the short edge, then resize
    short = min(w, h)
    side = int(short * rng.uniform(0.6, 1.0))
    x = rng.integers(0, w - side + 1)
    y = rng.integers(0, h - side + 1)
    crop = img.crop((x, y, x + side, y + side))
    if side != out_size:
        crop = crop.resize((out_size, out_size), Image.BICUBIC)
    if rng.random() < 0.5:
        crop = crop.transpose(Image.FLIP_LEFT_RIGHT)
    return crop


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('--out', required=True)
    ap.add_argument('--n-crops', type=int, default=2048)
    ap.add_argument('--seed', type=int, default=0)
    ap.add_argument('--quality', type=int, default=95)
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    srcs = load_sources()
    rng = np.random.default_rng(args.seed)
    for i in range(args.n_crops):
        src = srcs[i % len(srcs)]
        crop = random_crop(src, rng)
        crop.save(os.path.join(args.out, f'crop_{i:05d}.jpg'),
                  quality=args.quality)
    print(f'wrote {args.n_crops} 256x256 crops from {len(srcs)} source '
          f'photos to {args.out}')


if __name__ == '__main__':
    main()

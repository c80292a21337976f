#!/usr/bin/env python
"""Quantify conditioning in a variations demo grid.

The grid ``tools/train_imgvar.py --demo`` writes is (rows = references,
col 0 = reference image, cols 1..N = guided variations of that reference).
If the model ignores its conditioning, a variation's global color
statistics are no closer to its OWN reference than to any other row's.
This script measures that directly:

  * match   — mean L2 distance between each variation's mean RGB and its
              own reference's mean RGB
  * mismatch — the same distance to every OTHER row's reference (mean)

and reports the ratio.  ratio << 1 means the variations demonstrably
inherit their reference's palette (the round-5 toy-scale imgvar finding,
BASELINE.md); ratio ~= 1 means the conditioning is ignored.

No reference-framework analogue: the reference ships its CLIPImageEmbedder
dead (never trained or sampled — /root/reference/paintmind/modules/
encoder.py:107-151), so there is no grid to compare against.

Usage:
  python tools/eval_variations.py docs/imgvar_demo.png --cols 5
"""

import argparse

import numpy as np
from PIL import Image


def cell_means(grid, rows, cols, pad=2):
    """Mean RGB of each cell in a uniformly padded grid image."""
    h = (grid.shape[0] - pad * (rows + 1)) // rows
    w = (grid.shape[1] - pad * (cols + 1)) // cols
    means = np.zeros((rows, cols, 3))
    for r in range(rows):
        for c in range(cols):
            y = pad + r * (h + pad)
            x = pad + c * (w + pad)
            means[r, c] = grid[y:y + h, x:x + w].reshape(-1, 3).mean(0)
    return means


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('grid', help='variations_demo.png path')
    ap.add_argument('--cols', type=int, default=5,
                    help='grid columns incl. the reference column')
    ap.add_argument('--rows', type=int, default=6)
    ap.add_argument('--pad', type=int, default=2,
                    help='grid padding px (save_image_grid default)')
    args = ap.parse_args()

    grid = np.asarray(Image.open(args.grid).convert('RGB'), np.float64)
    means = cell_means(grid, args.rows, args.cols, args.pad)
    refs = means[:, 0]                   # (R, 3)
    variations = means[:, 1:]            # (R, V, 3)

    # distance of every variation to every row's reference
    d = np.linalg.norm(variations[:, :, None, :] - refs[None, None, :, :],
                       axis=-1)          # (R, V, R)
    eye = np.eye(args.rows, dtype=bool)
    match = d[:, :, :][np.broadcast_to(eye[:, None, :], d.shape)].mean()
    mismatch = d[:, :, :][np.broadcast_to(~eye[:, None, :], d.shape)].mean()

    # rank of the own reference among all rows, per variation (1 = closest)
    ranks = (d < d[np.broadcast_to(eye[:, None, :], d.shape)]
             .reshape(args.rows, -1, 1)).sum(-1) + 1
    top1 = float((ranks == 1).mean())

    print(f'rows={args.rows} variations/row={args.cols - 1}')
    print(f'mean |variation - own ref|   : {match:8.2f}')
    print(f'mean |variation - other refs|: {mismatch:8.2f}')
    print(f'ratio (match/mismatch)       : {match / mismatch:8.3f}'
          '   (<1 = palette inherited)')
    print(f'own-ref top-1 rate           : {top1:8.3f}'
          f'   (chance = {1 / args.rows:.3f})')


if __name__ == '__main__':
    main()

#!/usr/bin/env python
"""Export a checkpoint as a compact float16 .npz asset (half the size of the
training fp32 snapshot; load_params casts back to the model dtype).

Usage:
  python tools/export_asset.py results/.../vit_vq_step_18900.npz \
      paintmind_tpu/assets/vit_vq_photo.npz
"""

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('src')
    ap.add_argument('dst')
    args = ap.parse_args()

    with np.load(args.src) as data:
        out = {}
        for k in data.files:
            v = data[k]
            out[k] = v.astype(np.float16) if v.dtype.kind == 'f' else v
    np.savez_compressed(args.dst, **out)
    import os
    print(f'{args.dst}: {os.path.getsize(args.dst) / 1e6:.1f} MB '
          f'({len(out)} arrays, fp16)')


if __name__ == '__main__':
    main()

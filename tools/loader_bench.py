#!/usr/bin/env python
"""Host data-loading throughput: native pipelined loader (C++ decode +
preprocess worker pool) vs the threaded-PIL DataLoader path.

Usage: python tools/loader_bench.py --dir ./data/photos --batch 128
"""

import argparse
import os
import time


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('--dir', required=True)
    ap.add_argument('--batch', type=int, default=128)
    ap.add_argument('--epochs', type=int, default=2)
    ap.add_argument('--workers', type=int, default=os.cpu_count())
    args = ap.parse_args()

    from PIL import Image

    from paintmind_tpu.native.fastloader import NativeFolderLoader
    from paintmind_tpu.utils.data import DataLoader
    from paintmind_tpu.utils.transform import stage1_transform

    t = stage1_transform(is_train=True)

    class Folder:
        def __init__(self, d):
            self.paths = [os.path.join(d, f) for f in sorted(os.listdir(d))
                          if f.lower().endswith(('.jpg', '.jpeg'))]

        def __len__(self):
            return len(self.paths)

        def __getitem__(self, i):
            return t(Image.open(self.paths[i]).convert('RGB'))

    ds = Folder(args.dir)
    n = len(ds)
    print(f'{n} JPEGs, batch {args.batch}, {args.workers} workers')

    pil_dl = DataLoader(ds, args.batch, shuffle=True,
                        num_workers=args.workers)
    native = NativeFolderLoader(args.dir, args.batch, is_train=True,
                                num_workers=args.workers)

    for name, dl in (('threaded-PIL DataLoader', pil_dl),
                     ('native pipelined loader', native)):
        for _ in dl:  # warm one epoch (page cache, lazy builds)
            pass
        t0 = time.time()
        seen = 0
        for _ in range(args.epochs):
            for b in dl:
                seen += b.shape[0] if hasattr(b, 'shape') else len(b)
        dt = time.time() - t0
        print(f'{name:28s} {seen / dt:9.1f} images/sec host')


if __name__ == '__main__':
    main()

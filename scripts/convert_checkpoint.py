#!/usr/bin/env python
"""Convert reference PyTorch checkpoints (.pt state_dicts, e.g. the
published RootYuan/vit-s-vqgan.pt) to this framework's .npz format, and
optionally LPIPS weights from the torch `lpips` package."""

import argparse


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('src', help='.pt path, or "lpips" to convert LPIPS-VGG')
    p.add_argument('dst', help='output .npz path')
    p.add_argument('--model', default='vqgan',
                   choices=['vqgan', 'pipeline', 'cond_transformer'])
    args = p.parse_args()

    import numpy as np

    if args.src == 'lpips':
        import lpips as torch_lpips  # needs the pip package + VGG weights
        from paintmind_tpu.models.lpips import convert_lpips
        params = convert_lpips(torch_lpips.LPIPS(net='vgg'))
        from paintmind_tpu.utils.checkpoint import flatten_tree
        np.savez(args.dst, **flatten_tree(params))
    else:
        from paintmind_tpu.convert import torch_weights as tw
        from paintmind_tpu.utils.checkpoint import flatten_tree
        sd = tw.load_torch_state_dict(args.src)
        converted = {'vqgan': tw.convert_vqmodel,
                     'pipeline': tw.convert_pipeline,
                     'cond_transformer': tw.convert_cond_transformer}[args.model](sd)
        np.savez(args.dst, **flatten_tree(converted))
    print(f'wrote {args.dst}')


if __name__ == '__main__':
    main()

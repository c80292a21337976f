#!/usr/bin/env python
"""Grade a stage-1 checkpoint: reconstruction PSNR, rFID, and codebook
health on held-out crops of the reference photographs (or any folder).

Usage:
  python tools/eval_checkpoint.py --checkpoint results/.../vit_vq_step_8000.npz
  python tools/eval_checkpoint.py --checkpoint ... --dir ./data/valid --n 64
"""

import argparse
import json
import os
import sys

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)                      # sibling tools
sys.path.insert(0, os.path.dirname(_HERE))     # repo root (paintmind_tpu)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('--checkpoint', required=True)
    ap.add_argument('--version', default='vit-s-vqgan')
    ap.add_argument('--dir', default=None,
                    help='image folder; default = fixed held-out crops of '
                         'the reference photos (seed 123, disjoint from the '
                         'training corpus seed 0)')
    ap.add_argument('--n', type=int, default=64)
    ap.add_argument('--batch', type=int, default=16)
    ap.add_argument('--img-size', type=int, default=256,
                    help='input resolution (512 for vit-s-vqgan-512)')
    ap.add_argument('--valid-split', type=int, default=0, metavar='N',
                    help='with --dir: evaluate the make_split_cache_loaders '
                         'seed-42 held-out head of N images instead of the '
                         'sorted prefix (finetune_512 uses N=16)')
    ap.add_argument('--dtype', default='bf16', choices=['bf16', 'fp32'])
    args = ap.parse_args()

    import jax.numpy as jnp
    import paintmind_tpu as pm
    from paintmind_tpu.utils.metrics import codebook_stats, psnr, rfid

    if args.dir:
        from PIL import Image
        from paintmind_tpu.utils.transform import stage1_transform
        t = stage1_transform(img_size=args.img_size, is_train=False)
        from paintmind_tpu.utils.device_cache import (_list_images,
                                                      split_image_paths)
        if args.valid_split:
            # the SAME split rule the training loaders use — re-deriving
            # it here would risk silently scoring train images as
            # "held-out" if either side drifted
            _, paths = split_image_paths(args.dir,
                                         valid_size=args.valid_split)
        else:
            paths = _list_images(args.dir)
        paths = paths[:args.n]
        real = np.stack([np.asarray(t(Image.open(p).convert('RGB')))
                         for p in paths])
    else:
        from full_bench import _quality_images
        real = _quality_images(rng_seed=123, n=args.n)

    vq = pm.create_model(
        arch='vqgan', version=args.version, pretrained=False,
        checkpoint_path=args.checkpoint,
        compute_dtype=jnp.bfloat16 if args.dtype == 'bf16' else None)

    recs, ids_all = [], []
    for i in range(0, len(real), args.batch):
        chunk = real[i:i + args.batch]
        z, _, ids = vq.encode(chunk)
        recs.append(np.asarray(vq.decode(z), np.float32))
        ids_all.append(np.asarray(ids))
    rec = np.concatenate(recs)
    stats = codebook_stats(np.concatenate(ids_all), vq.config.n_embed)
    fid, variant = rfid(real, rec)
    out = {
        'checkpoint': args.checkpoint,
        'n_images': int(len(real)),
        'rec_psnr_db': psnr(rec, real),
        'rfid': fid, 'rfid_variant': variant,
        'codebook_usage': stats['usage'],
        'codebook_perplexity': stats['perplexity'],
    }
    print(json.dumps(out, indent=2))


if __name__ == '__main__':
    main()

#!/usr/bin/env python
"""Grade a stage-2 pipeline checkpoint: sample N images (16-step MaskGIT),
save a grid, and compute generation FID against real-photo crops.

Usage:
  python tools/eval_generation.py --checkpoint results/.../paintmind_step_6000.npz \
      --stage1-checkpoint results/.../vit_vq_step_16000.npz --n 64
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
    ap.add_argument('--checkpoint', required=True,
                    help='pipeline checkpoint (npz/orbax)')
    ap.add_argument('--stage1-checkpoint', default=None,
                    help='only needed when the pipeline checkpoint does not '
                         'embed the vqgan tower')
    ap.add_argument('--version', default='paintmindv1')
    ap.add_argument('--n', type=int, default=64)
    ap.add_argument('--batch', type=int, default=32)
    ap.add_argument('--timesteps', type=int, default=16)
    ap.add_argument('--topk', type=int, default=5)
    ap.add_argument('--grid-out', default='gen_grid.png')
    ap.add_argument('--real-dir', default=None,
                    help='folder of real images for the FID reference '
                         '(e.g. a held-out corpus split); default = the '
                         'reference-photo crops from full_bench')
    ap.add_argument('--real-tail', type=int, default=0,
                    help='with --real-dir: use only the LAST N files of '
                         'the sorted listing (held-out tail split)')
    ap.add_argument('--guidance', type=float, default=0.0,
                    help='>0: sample a guided equal-class mixture instead '
                         'of unconditional (needs --label-corpus)')
    ap.add_argument('--label-corpus', default=None,
                    help='labeled corpus dir (labels.csv, make_corpus_v2) '
                         'providing the class set for --guidance sampling')
    ap.add_argument('--quantize', choices=('w8', 'w8a8'), default=None,
                    help='int8-quantize the stage-2 transformer before '
                         'sampling — measures the quality cost of the '
                         'quantized serving path (nn/quant.py)')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from paintmind_tpu.config import Config, ver2cfg
    from paintmind_tpu.models.pipeline import Pipeline
    from paintmind_tpu.utils.image_grid import save_image_grid
    from paintmind_tpu.utils.metrics import fid, inception_extractor
    from full_bench import _quality_images

    pipe = Pipeline(config=Config(ver2cfg[args.version]),
                    stage1_pretrained=False,
                    stage1_checkpoint_path=args.stage1_checkpoint,
                    text_encoder=None, compute_dtype=jnp.bfloat16)
    pipe.from_pretrained(args.checkpoint)
    if args.quantize:
        pipe.quantize(args.quantize)

    ctxs = None
    if args.guidance > 0:
        if not args.label_corpus:
            ap.error('--guidance needs --label-corpus for the class set')
        from train_conditional_v2 import class_contexts, load_labels
        _, _, class_names = load_labels(args.label_corpus)
        ctxs = np.asarray(class_contexts(len(class_names)))
        print(f'guided mixture over {len(class_names)} classes '
              f'(scale {args.guidance})', file=sys.stderr)

    samples = []
    for i in range(0, args.n, args.batch):
        b = min(args.batch, args.n - i)
        if ctxs is not None:
            # equal-class mixture, classes round-robin across the run
            cls = (np.arange(i, i + b)) % len(ctxs)
            out = pipe.generate(text=ctxs[cls], timesteps=args.timesteps,
                                topk=args.topk, decode_steps='final',
                                guidance_scale=args.guidance,
                                key=jax.random.PRNGKey(100 + i))[-1]
        else:
            out = pipe.generate(num_samples=b, timesteps=args.timesteps,
                                topk=args.topk, decode_steps='final',
                                key=jax.random.PRNGKey(100 + i))[-1]
        samples.append(np.asarray(out, np.float32))
    gen = np.concatenate(samples)[:args.n]

    save_image_grid(gen[:36], args.grid_out)
    if args.real_dir:
        from PIL import Image

        from paintmind_tpu.utils.device_cache import _list_images
        from paintmind_tpu.utils.transform import stage2_transform
        if os.path.exists(os.path.join(args.real_dir, 'labels.csv')):
            # labeled corpus: tail of the SAME seed-0 shuffled order the
            # conditional trainer splits on (the sorted listing groups by
            # class, so a sorted tail would be a single-class reference)
            from train_conditional_v2 import load_labels
            files, _, _ = load_labels(args.real_dir)
            paths = [os.path.join(args.real_dir, f) for f in files]
        else:
            paths = _list_images(args.real_dir)
        if args.real_tail:
            paths = paths[-args.real_tail:]
        if len(paths) > args.n:  # deterministic subsample
            idx = np.linspace(0, len(paths) - 1, args.n).astype(int)
            paths = [paths[i] for i in idx]
        tf = stage2_transform(img_size=pipe.image_size, is_train=False)
        real = np.stack([np.asarray(tf(Image.open(p).convert('RGB')),
                                    np.float32) for p in paths])
    else:
        real = _quality_images(rng_seed=123, n=args.n)
    features, variant = inception_extractor()
    val = fid(features(real), features(gen))
    print(json.dumps({
        'checkpoint': args.checkpoint, 'n': args.n,
        'guidance': args.guidance,
        'gen_fid': val, 'fid_variant': variant.replace('rfid', 'fid'),
        'grid': args.grid_out,
    }, indent=2))


if __name__ == '__main__':
    main()

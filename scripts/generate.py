#!/usr/bin/env python
"""Text-to-image / inpaint / outpaint CLI on a trained pipeline."""

import argparse


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('prompts', nargs='*', help='text prompts')
    p.add_argument('--checkpoint', default=None,
                   help='pipeline checkpoint (.npz/.pt/orbax dir); default: '
                        'hub pretrained')
    p.add_argument('--version', default='paintmindv1')
    p.add_argument('--timesteps', type=int, default=18)
    p.add_argument('--temperature', type=float, default=1.0)
    p.add_argument('--topk', type=int, default=5)
    p.add_argument('--guidance-scale', type=float, default=None)
    p.add_argument('--negative', default=None,
                   help='negative prompt (guidance pushes away from it)')
    p.add_argument('--cfg-warmup', type=float, default=0.0,
                   help='fraction of early steps run unguided (throughput '
                        'lever; 0 = guidance on every step)')
    p.add_argument('--seed', type=int, default=0)
    p.add_argument('--out', default='samples.png')
    p.add_argument('--mode', default='generate',
                   choices=['generate', 'inpaint', 'outpaint'])
    p.add_argument('--image', default=None, help='input image for in/outpaint')
    p.add_argument('--rect', default='64,64,128,128',
                   help='x,y,h,w pixel rect for in/outpaint')
    args = p.parse_args()

    import jax
    import numpy as np

    import paintmind_tpu as pm
    from paintmind_tpu.utils.image_grid import save_image_grid

    # pretrained=True always: the factory prefers an explicit checkpoint_path
    # over the hub download, so --checkpoint routes to the local file.
    model = pm.create_model(arch='pipeline', version=args.version,
                            pretrained=True,
                            checkpoint_path=args.checkpoint)
    key = jax.random.PRNGKey(args.seed)

    if args.mode == 'generate':
        imgs = model.generate(text=list(args.prompts) or None,
                              timesteps=args.timesteps,
                              temperature=args.temperature, topk=args.topk,
                              guidance_scale=args.guidance_scale, key=key,
                              cfg_warmup=args.cfg_warmup,
                              negative_text=([args.negative]
                                             if args.negative else None),
                              num_samples=max(len(args.prompts), 1),
                              decode_steps='final')
        save_image_grid(np.asarray(imgs[-1], np.float32), args.out)
    else:
        from PIL import Image
        from paintmind_tpu.utils.transform import stage2_transform
        img = stage2_transform(is_train=False)(
            Image.open(args.image).convert('RGB'))[None]
        coord = tuple(int(v) for v in args.rect.split(','))
        fn = model.inpaint if args.mode == 'inpaint' else model.outpaint
        out = fn(img, coord, text=list(args.prompts) or None,
                 timesteps=args.timesteps, topk=args.topk,
                 temperature=args.temperature, key=key,
                 guidance_scale=args.guidance_scale)
        save_image_grid(np.asarray(out, np.float32), args.out)
    print(f'wrote {args.out}')


if __name__ == '__main__':
    main()

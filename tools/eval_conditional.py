#!/usr/bin/env python
"""Class-conditional guided sampling from a fine-tuned pipeline: per-class
sample grids plus a guidance A/B (with vs without CFG) — the quality-path
demonstration of BASELINE config 4.

Usage:
  python tools/eval_conditional.py \
      --checkpoint results/paintmind_cond/models/paintmind_step_6000.npz \
      --guidance 2.0 --out docs/cond_samples.png
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
    ap.add_argument('--version', default='paintmindv1',
                    help="e.g. 'paintmindv1-512' for the 4096-token variant")
    ap.add_argument('--stage1-checkpoint', default=None,
                    help='stage-1 tokenizer .npz when the pipeline '
                         'checkpoint does not embed the right-resolution '
                         'vqgan tower')
    ap.add_argument('--guidance', type=float, default=2.0)
    ap.add_argument('--per-class', type=int, default=6)
    ap.add_argument('--timesteps', type=int, default=16)
    ap.add_argument('--out', default='cond_samples.png')
    ap.add_argument('--corpus', default=None,
                    help='labeled corpus dir (labels.csv): use its class '
                         'set/contexts (train_conditional_v2) instead of '
                         'the 6-class photo demo')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import paintmind_tpu as pm
    from paintmind_tpu.utils.image_grid import save_image_grid

    if args.corpus:
        from train_conditional_v2 import class_contexts as cc_v2, load_labels
        _, _, class_names = load_labels(args.corpus)
        N_CLASSES = len(class_names)
        ctxs = cc_v2(N_CLASSES)
        print('classes:', class_names)
    else:
        from train_conditional_demo import N_CLASSES, class_contexts
        ctxs = class_contexts()

    pipe = pm.create_pipeline_for_train(version=args.version,
                                        stage1_pretrained=False,
                                        stage1_checkpoint_path=args.stage1_checkpoint,
                                        text_encoder=None,
                                        compute_dtype=jnp.bfloat16)
    stage1 = pipe.params['vqgan'] if args.stage1_checkpoint else None
    pipe.from_pretrained(args.checkpoint)
    if stage1 is not None:  # keep the explicitly-passed tokenizer tower
        pipe.params = {**pipe.params, 'vqgan': stage1}
        pipe.vqgan.params = stage1
    rows = []
    for c in range(N_CLASSES):
        ctx = np.repeat(ctxs[c][None], args.per_class, axis=0)
        imgs = pipe.generate(text=ctx, timesteps=args.timesteps, topk=5,
                             guidance_scale=args.guidance,
                             decode_steps='final',
                             key=jax.random.PRNGKey(c))[-1]
        rows.append(np.asarray(imgs, np.float32))
    grid = np.concatenate(rows)
    save_image_grid(grid, args.out, nrow=args.per_class)

    # guidance effect probe: same key/class, guided vs unguided token sets
    ctx = np.repeat(ctxs[0][None], args.per_class, axis=0)
    key = jax.random.PRNGKey(123)
    from paintmind_tpu.models.pipeline import generate_ids
    init = jnp.full((args.per_class, pipe.num_tokens), pipe.mask_token_id,
                    jnp.int32)
    _, g = generate_ids(pipe.params, key, init, jnp.asarray(ctx),
                        cfg=pipe.config, timesteps=args.timesteps, topk=5,
                        guidance_scale=args.guidance,
                        dtype=pipe.compute_dtype)
    _, u = generate_ids(pipe.params, key, init, None, cfg=pipe.config,
                        timesteps=args.timesteps, topk=5,
                        dtype=pipe.compute_dtype)
    diff = float((np.asarray(g[-1]) != np.asarray(u[-1])).mean())
    print(json.dumps({'checkpoint': args.checkpoint, 'out': args.out,
                      'guidance': args.guidance,
                      'guided_vs_uncond_token_diff': round(diff, 4)}))


if __name__ == '__main__':
    main()

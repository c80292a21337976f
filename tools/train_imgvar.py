#!/usr/bin/env python
"""Image-variations training: stage-2 conditioned on CLIP image tokens.

Trains the ``paintmindv1-imgvar`` pipeline (config.py registry): each image
is conditioned on the CLIP-visual patch tokens of ITSELF (the standard
variations objective — at sampling time a reference image's tokens steer
generation, and different sampler keys give variations).  The conditioning
tower is frozen; with no open_clip weights reachable offline it runs with
fixed-seed random parameters — a deterministic feature extractor whose
residual stream still carries the patch content (the tower params are saved
next to the checkpoints so sampling recreates the identical extractor).

The cross-attention context dim of CLIP ViT-L visual (1024) equals t5-l's,
so a trained ``paintmindv1`` checkpoint warm-starts this run one-to-one
(--init).

Usage:
  python tools/train_imgvar.py --data ./data/corpus_v2 \
      --init results/paintmind_v2/models/paintmind_step_19880.npz \
      --steps 6000
"""

import argparse
import os
import sys

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)                      # sibling tools
sys.path.insert(0, os.path.dirname(_HERE))     # repo root (paintmind_tpu)


class SelfConditionedLoader:
    """Wrap an image loader so each batch conditions on itself:
    yields (imgs, imgs) — the trainer's text slot carries the conditioning
    images, embedded by the frozen tower via the text_embedder hook."""

    def __init__(self, inner):
        self.inner = inner

    def __len__(self):
        return len(self.inner)

    def __iter__(self):
        for imgs in self.inner:
            yield imgs, imgs


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('--data', required=True, help='image corpus dir')
    ap.add_argument('--init', default=None,
                    help='paintmindv1(-compatible) checkpoint to warm-start '
                         'from (context dim 1024 matches)')
    ap.add_argument('--resume', default=None,
                    help='orbax state dir (paintmind_state_N); --steps stays '
                         'the TOTAL step target')
    ap.add_argument('--stage1', default=None,
                    help='stage-1 tokenizer checkpoint (.npz); default = '
                         'shipped asset')
    ap.add_argument('--steps', type=int, default=6000)
    ap.add_argument('--batch-size', type=int, default=16)
    ap.add_argument('--lr', type=float, default=5e-5)
    ap.add_argument('--lr-min', type=float, default=1e-5)
    ap.add_argument('--warmup-steps', type=int, default=200)
    ap.add_argument('--cfg-p', type=float, default=0.1)
    ap.add_argument('--tower-layers', type=int, default=8,
                    help='random-weight CLIP visual blocks to run; fewer '
                         'layers keep a cleaner signal in the residual '
                         'stream than the full 24 (weights are random '
                         'offline, not pretrained)')
    ap.add_argument('--tower-seed', type=int, default=7)
    ap.add_argument('--valid-size', type=int, default=32)
    ap.add_argument('--save-every', type=int, default=2000)
    ap.add_argument('--keep-last', type=int, default=None,
                   help='retention: keep only the newest N '
                        'checkpoint generations')
    ap.add_argument('--sample-every', type=int, default=2000)
    ap.add_argument('--log-every', type=int, default=50)
    ap.add_argument('--demo', type=int, default=4,
                    help='after training: N variations each for 6 held-out '
                         'images (0 disables)')
    ap.add_argument('--demo-guidance', type=float, default=2.0)
    ap.add_argument('--result-folder', default='./results/paintmind_imgvar')
    ap.add_argument('--log-dir', default='./log/paintmind_imgvar')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import paintmind_tpu as pm
    from paintmind_tpu.models.clip import (CLIPImageEmbedder,
                                           CLIPVisionConfig,
                                           save_image_tower)
    from paintmind_tpu.utils.compile_cache import enable_persistent_cache
    from paintmind_tpu.utils.device_cache import DeviceCacheLoader
    from paintmind_tpu.utils.image_grid import save_image_grid

    enable_persistent_cache()

    tower = CLIPImageEmbedder(
        cfg=CLIPVisionConfig(layers=args.tower_layers),
        dtype=jnp.bfloat16, seed=args.tower_seed)
    os.makedirs(os.path.join(args.result_folder, 'models'), exist_ok=True)
    tower_path = os.path.join(args.result_folder, 'models', 'tower.npz')
    save_image_tower(tower_path, tower)
    print(f'frozen conditioning tower ({args.tower_layers} blocks, '
          f'seed {args.tower_seed}) saved to {tower_path}')

    stage1 = args.stage1 or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        'paintmind_tpu', 'assets', 'vit_vq_photo.npz')
    model = pm.create_pipeline_for_train(
        version='paintmindv1-imgvar', stage1_pretrained=False,
        stage1_checkpoint_path=stage1, text_encoder=tower)
    if args.init:
        model.from_pretrained(args.init)

    from paintmind_tpu.utils.device_cache import _list_images
    paths = _list_images(args.data)
    # >=1 so paths[:-n_valid] can never silently become the EMPTY
    # train split (len//10 == 0 on tiny corpora)
    n_valid = max(min(args.valid_size, len(paths) // 10), 1)
    train_loader = SelfConditionedLoader(DeviceCacheLoader(
        paths[:-n_valid], args.batch_size, is_train=True, hflip=False,
        seed=11))
    valid_loader = SelfConditionedLoader(DeviceCacheLoader(
        paths[-n_valid:], min(8, n_valid), is_train=False, seed=11))

    resume_step = 0
    if args.resume:
        import re
        m = re.search(r'(\d+)$', os.path.basename(args.resume.rstrip('/')))
        if not m:
            raise SystemExit(f'cannot infer step from {args.resume!r}')
        resume_step = int(m.group(1))
    n_steps = len(train_loader.inner)
    epochs = max((args.steps - resume_step) // max(n_steps, 1), 1)
    print(f'{epochs} epochs of {n_steps} steps'
          + (f' (resuming at {resume_step})' if resume_step else ''))

    trainer = pm.PaintMindTrainer(
        model, dataset=None, num_epoch=epochs, optim_name='adamw',
        lr=args.lr, lr_min=args.lr_min, warmup_steps=args.warmup_steps,
        decay_steps=args.steps, batch_size=args.batch_size,
        grad_accum_steps=1, mixed_precision='bf16', remat=True,
        ema_decay=0.999, cfg_p=args.cfg_p, save_every=args.save_every, keep_last=args.keep_last,
        sample_every=args.sample_every, log_every=args.log_every,
        result_folder=args.result_folder, log_dir=args.log_dir,
        text_embedder=tower,
        train_loader=train_loader, valid_loader=valid_loader)
    if args.resume:
        trainer.resume(args.resume)
    trainer.train()

    if args.demo:
        refs = next(iter(valid_loader))[0][:6]
        ctx = tower(refs)  # (6, 256, 1024)
        rep = jnp.repeat(ctx, args.demo, axis=0)
        gens = model.generate(text=rep, timesteps=18, topk=5,
                              guidance_scale=args.demo_guidance,
                              decode_steps='final',
                              key=jax.random.PRNGKey(123))[-1]
        gens = np.asarray(gens, np.float32).reshape(
            len(refs), args.demo, *refs.shape[1:])
        rows = np.concatenate(
            [np.asarray(refs, np.float32)[:, None], gens], axis=1)
        out = os.path.join(args.result_folder, 'variations_demo.png')
        save_image_grid(rows.reshape(-1, *refs.shape[1:]), out,
                        nrow=args.demo + 1)
        print(f'variations demo (ref | {args.demo} variations): {out}')


if __name__ == '__main__':
    main()

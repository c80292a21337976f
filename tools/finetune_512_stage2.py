#!/usr/bin/env python
"""Fine-tune the stage-2 512² variant (4096 latent tokens) from a trained
256² conditional pipeline (VERDICT r2 #9: "4096-token sampler quality").

Loads a 256² ``paintmindv1`` checkpoint, interpolates BOTH the vqgan
pos-embeds and the conditional transformer's sequence pos-embed to the
64×64 grid (convert/resolution.adapt_pipeline_resolution), swaps in a
512-fine-tuned stage-1 tokenizer, and fine-tunes ``paintmindv1-512`` on
512² crops of the labeled corpus with the same per-class pseudo-caption
contexts as the 256² run (class associations carry over).

Usage:
  python tools/finetune_512.py ...                       # stage-1 first
  python tools/finetune_512_stage2.py --data ./data/corpus_v2_512 \
      --init results/paintmind_v2/models/paintmind_step_19880.npz \
      --stage1-512 results/vqgan_512/models/vit_vq_step_3000.npz
"""

import argparse
import os
import sys

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)                      # sibling tools
sys.path.insert(0, os.path.dirname(_HERE))     # repo root (paintmind_tpu)

from train_conditional_v2 import class_contexts, load_labels


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('--data', required=True,
                    help='512² labeled corpus dir (labels.csv)')
    ap.add_argument('--init', required=True,
                    help='256² paintmindv1 checkpoint (.npz) to adapt')
    ap.add_argument('--stage1-512', required=True,
                    help='512-fine-tuned vit-s-vqgan-512 checkpoint (.npz)')
    ap.add_argument('--steps', type=int, default=2000)
    ap.add_argument('--batch-size', type=int, default=4)
    ap.add_argument('--grad-accum', type=int, default=2)
    ap.add_argument('--lr', type=float, default=3e-5)
    ap.add_argument('--lr-min', type=float, default=1e-5)
    ap.add_argument('--warmup-steps', type=int, default=100)
    ap.add_argument('--cfg-p', type=float, default=0.1)
    ap.add_argument('--valid-size', type=int, default=16)
    ap.add_argument('--save-every', type=int, default=1000)
    ap.add_argument('--keep-last', type=int, default=None,
                   help='retention: keep only the newest N '
                        'checkpoint generations')
    ap.add_argument('--log-every', type=int, default=50)
    ap.add_argument('--result-folder', default='./results/paintmind_512')
    ap.add_argument('--log-dir', default='./log/paintmind_512')
    ap.add_argument('--resume', default=None,
                    help='orbax state dir (paintmind_state_N) to resume '
                         'from; --steps stays the TOTAL step target (the '
                         'restored optimizer count continues the SAME '
                         'cosine horizon, so a continuation never idles '
                         'at lr-min)')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import paintmind_tpu as pm
    from paintmind_tpu.convert.resolution import adapt_pipeline_resolution
    from paintmind_tpu.utils.compile_cache import enable_persistent_cache
    from paintmind_tpu.utils.device_cache import DeviceCacheLoader

    enable_persistent_cache()

    files, classes, class_names = load_labels(args.data)
    n_classes = len(class_names)
    print(f'{len(files)} images, {n_classes} classes: {class_names}')
    paths = [os.path.join(args.data, f) for f in files]

    ctxs = class_contexts(n_classes)
    ctxs_dev = jax.device_put(ctxs)
    classes_dev = jax.device_put(jnp.asarray(classes))

    def embed(indices):
        if isinstance(indices, jax.Array):
            return jnp.take(ctxs_dev, jnp.take(classes_dev, indices), axis=0)
        return ctxs[classes[np.asarray(indices)]]

    # 256² conditional params -> 4096-token grid (host-side pytree surgery)
    scratch = pm.create_pipeline_for_train(
        version='paintmindv1', stage1_pretrained=False, text_encoder=None)
    scratch.from_pretrained(args.init)
    s1 = pm.Config(pm.ver2cfg['vit-s-vqgan-512'])
    tokens512 = (s1.enc['image_size'] // s1.enc['patch_size']) ** 2
    adapted = adapt_pipeline_resolution(scratch.params, tokens512)
    del scratch

    model = pm.create_pipeline_for_train(
        version='paintmindv1-512', stage1_pretrained=False,
        stage1_checkpoint_path=args.stage1_512, text_encoder=None)
    # transformer/mask_token from the adapted 256² run; vqgan tower stays
    # the 512-fine-tuned tokenizer just loaded (NOT the interpolated one)
    model.params = {**adapted, 'vqgan': model.params['vqgan']}
    model.vqgan.params = model.params['vqgan']

    # >=1 so paths[:-n_valid] can never silently become the EMPTY
    # train split (len//10 == 0 on tiny corpora)
    n_valid = max(min(args.valid_size, len(paths) // 10), 1)
    micro = args.batch_size
    train_loader = DeviceCacheLoader(paths[:-n_valid], micro * args.grad_accum,
                                     img_size=512, is_train=True, hflip=False,
                                     seed=11, return_indices=True)
    valid_loader = DeviceCacheLoader(paths[-n_valid:], min(4, n_valid),
                                     img_size=512, is_train=False, seed=11)

    resume_step = 0
    if args.resume:
        import re
        m = re.search(r'(\d+)$', os.path.basename(args.resume.rstrip('/')))
        if not m:
            raise SystemExit(f'cannot infer step from {args.resume!r}')
        resume_step = int(m.group(1))
    steps_per_epoch = max(len(train_loader), 1) * args.grad_accum
    epochs = max((args.steps - resume_step) // steps_per_epoch, 1)
    print(f'{epochs} epochs of {steps_per_epoch} microbatch steps'
          + (f' (resuming at {resume_step})' if resume_step else ''))

    trainer = pm.PaintMindTrainer(
        model, dataset=None, num_epoch=epochs, optim_name='adamw',
        lr=args.lr, lr_min=args.lr_min, warmup_steps=args.warmup_steps,
        decay_steps=args.steps, batch_size=micro,
        grad_accum_steps=args.grad_accum, mixed_precision='bf16', remat=True,
        ema_decay=0.999, cfg_p=args.cfg_p, save_every=args.save_every, keep_last=args.keep_last,
        sample_every=10**9, log_every=args.log_every,
        result_folder=args.result_folder, log_dir=args.log_dir,
        text_embedder=embed,
        train_loader=train_loader, valid_loader=valid_loader)
    if args.resume:
        trainer.resume(args.resume)
        print(f'resumed from {args.resume} at microbatch step {trainer.steps}')
    trainer.train()


if __name__ == '__main__':
    main()

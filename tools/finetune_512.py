#!/usr/bin/env python
"""Fine-tune the 512² stage-1 variant from a 256² checkpoint (VERDICT r2 #9).

Loads a trained 256² vit-s-vqgan, interpolates the encoder/decoder
pos-embeds to the 4096-token grid (convert/resolution), and fine-tunes
``vit-s-vqgan-512`` on 512² crops with rematerialization (the 4096-token
attention does not fit un-remat'ed at useful batch sizes).

Usage:
  python tools/make_corpus_v2.py --out ./data/corpus_v2_512 --n 2048 --img-size 512
  python tools/finetune_512.py --data ./data/corpus_v2_512 \
      --init paintmind_tpu/assets/vit_vq_photo.npz --steps 3000
"""

import argparse
import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)                      # sibling tools
sys.path.insert(0, os.path.dirname(_HERE))     # repo root (paintmind_tpu)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('--data', required=True, help='512² corpus folder')
    ap.add_argument('--init', required=True,
                    help='256² vit-s-vqgan checkpoint (.npz)')
    ap.add_argument('--steps', type=int, default=3000)
    ap.add_argument('--batch-size', type=int, default=4)
    ap.add_argument('--grad-accum', type=int, default=2)
    ap.add_argument('--lr', type=float, default=3e-5)
    ap.add_argument('--d-weight', type=float, default=0.1)
    ap.add_argument('--perceptual', default='random')
    ap.add_argument('--save-every', type=int, default=1500)
    ap.add_argument('--keep-last', type=int, default=None,
                   help='retention: keep only the newest N '
                        'checkpoint generations')
    ap.add_argument('--sample-every', type=int, default=750)
    ap.add_argument('--result-folder', default='./results/vqgan_512')
    ap.add_argument('--log-dir', default='./log/vqgan_512')
    args = ap.parse_args()

    import paintmind_tpu as pm
    from paintmind_tpu.convert.resolution import adapt_vqmodel_resolution
    from paintmind_tpu.models.vqmodel import VQModel
    from paintmind_tpu.parallel import make_mesh, set_active_mesh
    from paintmind_tpu.utils.compile_cache import enable_persistent_cache
    from paintmind_tpu.utils.device_cache import make_split_cache_loaders

    enable_persistent_cache()
    mesh = make_mesh()
    set_active_mesh(mesh)

    # 256² weights → 512² grid (4096 tokens)
    base = pm.create_model(arch='vqgan', version='vit-s-vqgan',
                           pretrained=False, checkpoint_path=args.init)
    params512 = adapt_vqmodel_resolution(base.params, 64 * 64)
    model = VQModel(pm.ver2cfg['vit-s-vqgan-512'], params=params512)

    train_loader, valid_loader = make_split_cache_loaders(
        args.data, args.batch_size * args.grad_accum, args.batch_size,
        img_size=512, valid_size=16)

    steps_per_epoch = max(len(train_loader), 1) * args.grad_accum
    epochs = max(args.steps // steps_per_epoch, 1)
    print(f'{epochs} epochs × {steps_per_epoch} microbatch steps')

    trainer = pm.VQGANTrainer(
        model, dataset=None, num_epoch=epochs, lr=args.lr, lr_min=1e-5,
        warmup_steps=100, warmup_lr_init=1e-6, decay_steps=args.steps,
        batch_size=args.batch_size, grad_accum_steps=args.grad_accum,
        mixed_precision='bf16', save_every=args.save_every, keep_last=args.keep_last,
        sample_every=args.sample_every, result_folder=args.result_folder,
        log_dir=args.log_dir, perceptual_weights=args.perceptual,
        d_weight=args.d_weight, remat=True, ema_decay=0.999,
        codebook_restart_every=500, log_every=25, mesh=mesh,
        train_loader=train_loader, valid_loader=valid_loader)
    trainer.train()


if __name__ == '__main__':
    main()

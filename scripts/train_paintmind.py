#!/usr/bin/env python
"""Stage-2 MaskGIT training CLI (README recipe defaults:
reference README.md:168-191 — adamw/lion, lr 1e-4→1e-5, warmup 10k,
wd 0.05, decay 80k, batch 16, accum 8, bf16)."""

import argparse


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--dataset', required=True,
                   help='coco:<root> | imagenet:<root> | diffusiondb:<ver> '
                        '| folder:<dir> (captionless → unconditional)')
    p.add_argument('--version', default='paintmindv1')
    p.add_argument('--stage1-checkpoint', default=None,
                   help='local stage-1 weights; without it the published '
                        'pretrained vit-s-vqgan is downloaded (reference '
                        'default) unless --stage1-random is set')
    p.add_argument('--stage1-random', action='store_true',
                   help='train against a RANDOM frozen tokenizer '
                        '(debug/smoke only — generated images will be '
                        'garbage)')
    p.add_argument('--epochs', type=int, default=40)
    p.add_argument('--optim', default='lion', choices=['lion', 'adamw'])
    p.add_argument('--batch-size', type=int, default=16)
    p.add_argument('--grad-accum', type=int, default=8)
    p.add_argument('--lr', type=float, default=1e-4)
    p.add_argument('--lr-min', type=float, default=1e-5)
    p.add_argument('--warmup-steps', type=int, default=10000)
    p.add_argument('--decay-steps', type=int, default=80000)
    p.add_argument('--weight-decay', type=float, default=0.05)
    p.add_argument('--mixed-precision', default='bf16')
    p.add_argument('--result-folder', default='./results/paintmind')
    p.add_argument('--log-dir', default='./log')
    p.add_argument('--save-every', type=int, default=10000)
    p.add_argument('--keep-last', type=int, default=None,
                   help='retention: keep only the newest N '
                        'checkpoint generations')
    p.add_argument('--sample-every', type=int, default=1000)
    p.add_argument('--resume', default=None)
    p.add_argument('--num-workers', type=int, default=8)
    p.add_argument('--remat', action='store_true',
                   help='rematerialize transformer blocks (fits batch 16 '
                        'without accumulation in 16G HBM)')
    p.add_argument('--ema-decay', type=float, default=None)
    p.add_argument('--cfg-p', type=float, default=0.1,
                   help='caption-dropout probability (CFG training)')
    p.add_argument('--valid-size', type=int, default=10)
    p.add_argument('--native-loader', action='store_true',
                   help='use the C++ pipelined loader (folder:<dir> of '
                        'JPEGs only; unconditional)')
    p.add_argument('--device-cache', action='store_true',
                   help='cache the whole corpus in HBM (uint8) and augment '
                        'on device (folder:<dir>; unconditional)')
    args = p.parse_args()

    import paintmind_tpu as pm
    from paintmind_tpu.config import ver2cfg
    from paintmind_tpu.utils.transform import stage2_transform

    # image size follows the version's stage-1 tokenizer config
    stage1_version = ver2cfg[args.version]['stage1']
    img_size = ver2cfg[stage1_version]['enc']['image_size']
    transform = stage2_transform(img_size=img_size, is_train=True)
    kind, _, root = args.dataset.partition(':')
    if kind == 'coco':
        from paintmind_tpu.utils.datasets import CoCo
        dataset = CoCo(root, transform=transform)
    elif kind == 'imagenet':
        from paintmind_tpu.utils.datasets import ImageNet
        dataset = ImageNet(root, transform=transform)
    elif kind == 'diffusiondb':
        from paintmind_tpu.utils.datasets import DiffusionDB
        dataset = DiffusionDB(root or 'large_random_100k',
                              transform=transform)
    elif kind == 'folder':
        from paintmind_tpu.utils.datasets import ImageFolder
        dataset = ImageFolder(root, transform=transform)
    else:
        raise SystemExit(f'unknown dataset spec {args.dataset!r}')

    # register the mesh BEFORE any device-cache upload so the corpus is
    # replicated over it instead of landing on one default device (ADVICE r2)
    from paintmind_tpu.parallel import make_mesh, set_active_mesh
    mesh = make_mesh()
    set_active_mesh(mesh)

    train_loader = valid_loader = None
    # hflip=False in both fast paths: stage-2 transform parity (no flip;
    # reference transform.py:23-34 — flips would break text-image alignment)
    if args.device_cache:
        if kind != 'folder':
            raise SystemExit('--device-cache needs a folder:<dir> dataset')
        from paintmind_tpu.utils.device_cache import make_split_cache_loaders
        train_loader, valid_loader = make_split_cache_loaders(
            dataset.paths, args.batch_size * args.grad_accum,
            args.batch_size, valid_size=args.valid_size, hflip=False,
            img_size=img_size)
    elif args.native_loader:
        if kind != 'folder':
            raise SystemExit('--native-loader needs a folder:<dir> dataset')
        from paintmind_tpu.native.fastloader import make_split_loaders
        train_loader, valid_loader = make_split_loaders(
            dataset.paths, args.batch_size * args.grad_accum,
            args.batch_size, valid_size=args.valid_size, hflip=False,
            img_size=img_size, num_workers=args.num_workers)

    model = pm.create_pipeline_for_train(
        version=args.version,
        stage1_pretrained=not args.stage1_random,
        stage1_checkpoint_path=args.stage1_checkpoint)
    trainer = pm.PaintMindTrainer(
        model, dataset, num_epoch=args.epochs, optim_name=args.optim,
        lr=args.lr, lr_min=args.lr_min, warmup_steps=args.warmup_steps,
        decay_steps=args.decay_steps, weight_decay=args.weight_decay,
        batch_size=args.batch_size, grad_accum_steps=args.grad_accum,
        mixed_precision=args.mixed_precision, save_every=args.save_every, keep_last=args.keep_last,
        sample_every=args.sample_every, result_folder=args.result_folder,
        log_dir=args.log_dir, num_workers=args.num_workers,
        remat=args.remat, ema_decay=args.ema_decay, cfg_p=args.cfg_p,
        valid_size=args.valid_size, train_loader=train_loader,
        valid_loader=valid_loader, mesh=mesh)
    if args.resume:
        trainer.resume(args.resume)
    trainer.train()


if __name__ == '__main__':
    main()

#!/usr/bin/env python
"""Class-conditional stage-2 training on a labeled corpus (corpus_v2).

Like tools/train_conditional_demo.py but driven by the ``labels.csv`` a
corpus generator writes (tools/make_corpus_v2.py): each image is
conditioned on a fixed pseudo-caption embedding for its class, with
reference CFG dropout.  Guided sampling then steers generation to any
class — BASELINE config 4 (t2i conditioning + CFG) with a corpus diverse
enough that generation quality is no longer data-limited (VERDICT r2 #3).

Usage:
  python tools/train_conditional_v2.py --data ./data/corpus_v2 \
      --init results/paintmind_v2/models/... --steps 20000
"""

import argparse
import csv
import os
import sys

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)                      # sibling tools
sys.path.insert(0, os.path.dirname(_HERE))     # repo root (paintmind_tpu)

CTX_LEN = 8  # short fixed pseudo-caption


def load_labels(data_dir):
    """(sorted file list, class_id per file, class names) from labels.csv."""
    path = os.path.join(data_dir, 'labels.csv')
    with open(path, newline='') as f:
        rows = list(csv.DictReader(f))
    by_name = {r['file']: int(r['class_id']) for r in rows}
    names = {}
    for r in rows:
        names[int(r['class_id'])] = r['class']
    files = sorted(by_name)
    classes = np.asarray([by_name[f] for f in files], np.int32)
    # fixed shuffle: the sorted listing groups by class, which would make a
    # tail validation split single-class
    perm = np.random.default_rng(0).permutation(len(files))
    files = [files[i] for i in perm]
    classes = classes[perm]
    class_names = [names[i] for i in sorted(names)]
    return files, classes, class_names


def class_contexts(n_classes, t5_dim=1024, seed=7):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_classes, CTX_LEN, t5_dim)).astype(
        np.float32)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('--data', required=True,
                    help='corpus dir containing labels.csv')
    ap.add_argument('--init', default=None,
                    help='pipeline checkpoint to fine-tune from (optional)')
    ap.add_argument('--resume', default=None,
                    help='orbax state dir (paintmind_state_N) to resume '
                         'from; --steps stays the TOTAL step target so the '
                         'LR schedule matches the interrupted run')
    ap.add_argument('--stage1', default=None,
                    help='stage-1 tokenizer checkpoint (.npz); default = '
                         'shipped asset')
    ap.add_argument('--steps', type=int, default=20000)
    ap.add_argument('--batch-size', type=int, default=16)
    ap.add_argument('--lr', type=float, default=1e-4)
    ap.add_argument('--lr-min', type=float, default=1e-5)
    ap.add_argument('--warmup-steps', type=int, default=500)
    ap.add_argument('--cfg-p', type=float, default=0.1)
    ap.add_argument('--valid-size', type=int, default=64)
    ap.add_argument('--save-every', type=int, default=4000)
    ap.add_argument('--keep-last', type=int, default=None,
                   help='retention: keep only the newest N '
                        'checkpoint generations')
    ap.add_argument('--sample-every', type=int, default=2000)
    ap.add_argument('--log-every', type=int, default=50,
                    help='metric-fetch cadence; 1 would sync the device '
                         'every step (measured 2x slower)')
    ap.add_argument('--result-folder', default='./results/paintmind_v2')
    ap.add_argument('--log-dir', default='./log/paintmind_v2')
    ap.add_argument('--version', default='paintmindv1',
                    help="pipeline version from the registry — e.g. "
                         "'paintmindv1-moe' trains the expert-routed "
                         'variant through the identical harness (router '
                         'health lands in the metric logs)')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import paintmind_tpu as pm
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
        """Trainer text hook: TRAIN item indices → class contexts
        (device-side gather; no per-step host round trip).  Only the train
        loader passes indices (it is the list PREFIX, so positions equal
        global positions); the valid loader runs unconditional eval —
        per-class guided grids come from tools/eval_conditional.py."""
        if isinstance(indices, jax.Array):
            return jnp.take(ctxs_dev, jnp.take(classes_dev, indices), axis=0)
        return ctxs[classes[np.asarray(indices)]]

    stage1 = args.stage1 or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        'paintmind_tpu', 'assets', 'vit_vq_photo.npz')
    model = pm.create_pipeline_for_train(version=args.version,
                                         stage1_pretrained=False,
                                         stage1_checkpoint_path=stage1,
                                         text_encoder=None)
    if args.init:
        model.from_pretrained(args.init)

    # held-out tail split; hflip=False (stage-2 transform parity)
    # >=1 so paths[:-n_valid] can never silently become the EMPTY
    # train split (len//10 == 0 on tiny corpora)
    n_valid = max(min(args.valid_size, len(paths) // 10), 1)
    train_loader = DeviceCacheLoader(paths[:-n_valid], args.batch_size,
                                     is_train=True, hflip=False, seed=11,
                                     return_indices=True)
    valid_loader = DeviceCacheLoader(paths[-n_valid:], min(16, n_valid),
                                     is_train=False, seed=11)

    resume_step = 0
    if args.resume:
        import re
        m = re.search(r'(\d+)$', os.path.basename(args.resume.rstrip('/')))
        if not m:
            raise SystemExit(f'cannot infer step from {args.resume!r}')
        resume_step = int(m.group(1))
    epochs = max((args.steps - resume_step) // max(len(train_loader), 1), 1)
    print(f'{epochs} epochs of {len(train_loader)} steps'
          + (f' (resuming at {resume_step})' if resume_step else ''))

    trainer = pm.PaintMindTrainer(
        model, dataset=None, num_epoch=epochs, optim_name='adamw',
        lr=args.lr, lr_min=args.lr_min, warmup_steps=args.warmup_steps,
        decay_steps=args.steps, batch_size=args.batch_size,
        grad_accum_steps=1, mixed_precision='bf16', remat=True,
        ema_decay=0.999, cfg_p=args.cfg_p, save_every=args.save_every, keep_last=args.keep_last,
        sample_every=args.sample_every, log_every=args.log_every,
        result_folder=args.result_folder,
        log_dir=args.log_dir, text_embedder=embed,
        train_loader=train_loader, valid_loader=valid_loader)
    if args.resume:
        trainer.resume(args.resume)
    trainer.train()


if __name__ == '__main__':
    main()

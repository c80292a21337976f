#!/usr/bin/env python
"""Class-conditional fine-tune of the stage-2 pipeline + guided sampling.

Demonstrates the conditional/CFG path end-to-end with TRAINED weights:
each corpus crop is conditioned on a fixed pseudo-caption embedding for its
source photograph (make_photo_corpus writes crop i from source i % 6), with
reference CFG dropout (cfg_p).  After fine-tuning, sampling with
guidance_scale steers generation to a chosen source's style — the
quality-path proof for BASELINE config 4 (t2i with caption conditioning +
classifier-free guidance).

Usage:
  python tools/train_conditional_demo.py --data ./data/photos \
      --init results/paintmind_photo/models/paintmind_step_16128.npz \
      --steps 6000
"""

import argparse
import os
import sys

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)                      # sibling tools
sys.path.insert(0, os.path.dirname(_HERE))     # repo root (paintmind_tpu)

N_CLASSES = 6
CTX_LEN = 8  # short fixed pseudo-caption


def class_contexts(t5_dim=1024, seed=7):
    """Fixed per-class context embeddings (the 'captions')."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((N_CLASSES, CTX_LEN, t5_dim)).astype(
        np.float32)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('--data', required=True)
    ap.add_argument('--init', required=True,
                    help='pipeline checkpoint to fine-tune from')
    ap.add_argument('--steps', type=int, default=6000)
    ap.add_argument('--batch-size', type=int, default=16)
    ap.add_argument('--lr', type=float, default=5e-5)
    ap.add_argument('--cfg-p', type=float, default=0.1)
    ap.add_argument('--result-folder', default='./results/paintmind_cond')
    ap.add_argument('--log-dir', default='./log/paintmind_cond')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import paintmind_tpu as pm
    from paintmind_tpu.utils.device_cache import (DeviceCacheLoader,
                                                  _list_images)

    # the % N_CLASSES label map is only correct for a corpus built from all
    # six reference sources (make_photo_corpus assigns crop i to source
    # i % len(sources)) — fail loudly rather than train on garbage labels
    try:
        from make_photo_corpus import load_sources
        n_sources = len(load_sources())
        if n_sources != N_CLASSES:
            raise SystemExit(
                f'corpus built from {n_sources} sources but the class map '
                f'assumes {N_CLASSES}; rebuild the corpus or adjust '
                'N_CLASSES')
    except SystemExit:
        raise
    except Exception:
        print('note: reference sources unavailable — cannot cross-check '
              f'the {N_CLASSES}-class label map')

    ctxs = class_contexts()
    ctxs_dev = jax.device_put(ctxs)  # uploaded once

    def embed(indices):
        """Trainer text hook: item indices → class contexts.  Device
        indices gather on device (no per-step host round trip — see the
        transfer-retention note in utils/device_cache.py)."""
        if isinstance(indices, jax.Array):
            return jnp.take(ctxs_dev, indices % N_CLASSES, axis=0)
        return ctxs[np.asarray(indices) % N_CLASSES]

    model = pm.create_pipeline_for_train(stage1_pretrained=False,
                                         text_encoder=None)
    model.from_pretrained(args.init)

    # hflip=False: conditioning parity (stage-2 transform has no flip)
    train_loader = DeviceCacheLoader(args.data, args.batch_size,
                                     is_train=True, hflip=False, seed=11,
                                     return_indices=True)
    # tiny eval set: the first crop of each source (crop i ↔ class i % 6)
    valid_loader = DeviceCacheLoader(_list_images(args.data)[:N_CLASSES],
                                     N_CLASSES, is_train=False, seed=11,
                                     return_indices=True)
    epochs = max(args.steps // len(train_loader), 1)

    trainer = pm.PaintMindTrainer(
        model, dataset=None, num_epoch=epochs, optim_name='adamw',
        lr=args.lr, lr_min=1e-5, warmup_steps=200, decay_steps=args.steps,
        batch_size=args.batch_size, grad_accum_steps=1,
        mixed_precision='bf16', remat=True, ema_decay=0.999,
        cfg_p=args.cfg_p, save_every=2000, sample_every=2000,
        result_folder=args.result_folder, log_dir=args.log_dir,
        text_embedder=embed, train_loader=train_loader,
        valid_loader=valid_loader)
    trainer.train()


if __name__ == '__main__':
    main()

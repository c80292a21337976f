#!/usr/bin/env python
"""Serve text-to-image generation + reconstruction over HTTP.

Example:
  python scripts/serve.py --checkpoint ./results/pipeline.npz --port 8000
  curl -s localhost:8000/generate -d '{"timesteps": 16, "seed": 0}'
"""

import argparse


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--version', default='paintmindv1')
    p.add_argument('--checkpoint', default=None,
                   help='pipeline checkpoint (.npz/.pt/orbax dir)')
    p.add_argument('--stage1-checkpoint', default=None,
                   help='stage-1 VQGAN checkpoint when serving without a '
                        'full pipeline checkpoint')
    p.add_argument('--host', default='127.0.0.1')
    p.add_argument('--port', type=int, default=8000)
    p.add_argument('--max-batch', type=int, default=16)
    p.add_argument('--max-wait-ms', type=float, default=20.0)
    p.add_argument('--max-queue', type=int, default=None,
                   help='bound the request queue; full queue returns 503')
    p.add_argument('--timesteps', type=int, default=16)
    p.add_argument('--topk', type=int, default=5)
    p.add_argument('--no-text-encoder', action='store_true',
                   help='serve unconditional / precomputed-context requests '
                        'only (skips T5 construction)')
    p.add_argument('--tower-checkpoint', default=None,
                   help='conditioning-tower params (.npz) — e.g. the '
                        'tower.npz saved by tools/train_imgvar.py for an '
                        'image-variations pipeline (/variations endpoint)')
    p.add_argument('--quantize', choices=('w8', 'w8a8'), default=None,
                   help='int8-quantize the stage-2 transformer after '
                        'loading (nn/quant.py): w8a8 = int8 MXU matmuls '
                        '(max throughput), w8 = weight-only (halves weight '
                        'HBM traffic — best for small-batch latency)')
    args = p.parse_args()

    import jax.numpy as jnp
    from paintmind_tpu.config import Config, ver2cfg
    from paintmind_tpu.models.pipeline import Pipeline
    from paintmind_tpu.serving import serve

    if args.tower_checkpoint:
        from paintmind_tpu.models.clip import load_image_tower
        text_encoder = load_image_tower(args.tower_checkpoint,
                                        dtype=jnp.bfloat16)
    else:
        text_encoder = None if args.no_text_encoder else 'auto'
    pipe = Pipeline(
        config=Config(ver2cfg[args.version]),
        stage1_pretrained=False,
        stage1_checkpoint_path=args.stage1_checkpoint,
        text_encoder=text_encoder,
        compute_dtype=jnp.bfloat16)
    if args.checkpoint:
        pipe.from_pretrained(args.checkpoint)
    if args.quantize:
        pipe.quantize(args.quantize)
    serve(pipe, args.host, args.port, max_batch=args.max_batch,
          max_wait_ms=args.max_wait_ms, max_queue=args.max_queue,
          defaults={'timesteps': args.timesteps, 'topk': args.topk})


if __name__ == '__main__':
    main()

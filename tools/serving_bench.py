#!/usr/bin/env python
"""Serving-tier throughput on the real chip: concurrent generate requests
through GenerationEngine's dynamic batching.

Usage: python tools/serving_bench.py --requests 128 --max-batch 32
       python tools/serving_bench.py --mode paint --requests 64

``--mode paint`` submits concurrent inpaint/outpaint requests with
DIFFERENT rects and modes: the rect is a per-sample latent keep-mask
operand (not part of the batching signature), so they all coalesce into
full batches — the round-3 serving fix (VERDICT r2 #6).
"""

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('--requests', type=int, default=128)
    ap.add_argument('--max-batch', type=int, default=32)
    ap.add_argument('--max-wait-ms', type=float, default=100.0)
    ap.add_argument('--timesteps', type=int, default=16)
    ap.add_argument('--mode', default='generate',
                    choices=['generate', 'paint'])
    ap.add_argument('--checkpoint', default=None)
    ap.add_argument('--quantize', choices=('w8', 'w8a8'), default=None,
                    help='int8-quantize the stage-2 transformer first '
                         '(serving A/B for nn/quant.py)')
    args = ap.parse_args()

    import jax.numpy as jnp
    import numpy as np

    from paintmind_tpu.models.pipeline import Pipeline
    from paintmind_tpu.serving import (GenerateRequest, GenerationEngine,
                                       PaintRequest)

    pipe = Pipeline(stage1_pretrained=False, text_encoder=None,
                    compute_dtype=jnp.bfloat16)
    if args.checkpoint:
        pipe.from_pretrained(args.checkpoint)
    if args.quantize:
        pipe.quantize(args.quantize)

    rng = np.random.default_rng(0)
    ctxs = [rng.standard_normal((77, 1024)).astype(np.float32)
            for _ in range(8)]

    def make_request(i):
        if args.mode == 'paint':
            # every request gets a DIFFERENT pixel rect and alternating
            # inpaint/outpaint mode — none of which enter the signature
            s = pipe.image_size
            x0, y0 = int(rng.integers(0, s // 2)), int(rng.integers(0, s // 2))
            h = int(rng.integers(32, s - y0))
            w = int(rng.integers(32, s - x0))
            img = rng.standard_normal((s, s, 3)).astype(np.float32) * 0.3
            return PaintRequest(image=np.clip(img, -1, 1),
                                coord=(x0, y0, h, w),
                                mode='inpaint' if i % 2 == 0 else 'outpaint',
                                timesteps=args.timesteps)
        return GenerateRequest(context=ctxs[i % len(ctxs)],
                               timesteps=args.timesteps)

    with GenerationEngine(pipe, max_batch=args.max_batch,
                          max_wait_ms=args.max_wait_ms) as eng:
        # warm the bucket compile with one full batch
        warm = [eng.submit(make_request(i)) for i in range(args.max_batch)]
        for f in warm:
            f.result(timeout=600)
        eng.reset_stats()  # exclude compile-inflated warm-up latencies

        t0 = time.time()
        futs = [eng.submit(make_request(i)) for i in range(args.requests)]
        for f in futs:
            f.result(timeout=600)
        dt = time.time() - t0
        stats = eng.stats()

    print(json.dumps({
        'mode': args.mode,
        'requests': args.requests,
        'throughput_req_per_s': round(args.requests / dt, 2),
        'latency_p50_s': round(stats['latency_p50_s'], 2),
        'latency_p95_s': round(stats['latency_p95_s'], 2),
        'mean_batch_occupancy': round(stats['mean_batch_occupancy'], 1),
        'padded_slots': stats['padded_slots'],
    }, indent=2))


if __name__ == '__main__':
    main()

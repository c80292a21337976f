#!/usr/bin/env python
"""Serving-tier throughput on the real chip: concurrent generate requests
through GenerationEngine's dynamic batching.

Usage: python tools/serving_bench.py --requests 128 --max-batch 32
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
    ap.add_argument('--checkpoint', default=None)
    args = ap.parse_args()

    import jax.numpy as jnp
    import numpy as np

    from paintmind_tpu.models.pipeline import Pipeline
    from paintmind_tpu.serving import GenerateRequest, GenerationEngine

    pipe = Pipeline(stage1_pretrained=False, text_encoder=None,
                    compute_dtype=jnp.bfloat16)
    if args.checkpoint:
        pipe.from_pretrained(args.checkpoint)

    rng = np.random.default_rng(0)
    ctxs = [rng.standard_normal((77, 1024)).astype(np.float32)
            for _ in range(8)]

    with GenerationEngine(pipe, max_batch=args.max_batch,
                          max_wait_ms=args.max_wait_ms) as eng:
        # warm the bucket compile with one full batch
        warm = [eng.submit(GenerateRequest(context=ctxs[0],
                                           timesteps=args.timesteps))
                for _ in range(args.max_batch)]
        for f in warm:
            f.result(timeout=600)
        eng.reset_stats()  # exclude compile-inflated warm-up latencies

        t0 = time.time()
        futs = [eng.submit(GenerateRequest(context=ctxs[i % len(ctxs)],
                                           timesteps=args.timesteps))
                for i in range(args.requests)]
        for f in futs:
            f.result(timeout=600)
        dt = time.time() - t0
        stats = eng.stats()

    print(json.dumps({
        'requests': args.requests,
        'throughput_req_per_s': round(args.requests / dt, 2),
        'latency_p50_s': round(stats['latency_p50_s'], 2),
        'latency_p95_s': round(stats['latency_p95_s'], 2),
        'mean_batch_occupancy': round(stats['mean_batch_occupancy'], 1),
        'padded_slots': stats['padded_slots'],
    }, indent=2))


if __name__ == '__main__':
    main()

#!/usr/bin/env python
"""Sampler throughput tuning sweep (VERDICT r2 #2).

Measures steady-state images/sec of the 16-step sampler over the levers
that do not change sampler semantics:

  * batch size (MXU utilization rises with batch until HBM pressure)
  * attention backend: Pallas flash vs plain-XLA attention at seq 1024
  * flash block_q (512 default; 1024 = whole sequence in one block)

Run on the real chip; prints one line per config.
"""

import argparse
import time


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('--batches', default='64,96,128')
    ap.add_argument('--backends', default='flash,xla')
    ap.add_argument('--timesteps', type=int, default=16)
    ap.add_argument('--reps', type=int, default=2)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from paintmind_tpu.models.pipeline import Pipeline, generate_ids
    from paintmind_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    pipe = Pipeline(stage1_pretrained=False, text_encoder=None,
                    compute_dtype=jnp.bfloat16)

    def fence(x):
        return float(jnp.sum(x.astype(jnp.float32)))

    results = []
    for backend in args.backends.split(','):
        for batch in (int(b) for b in args.batches.split(',')):
            ctx = jnp.asarray(np.random.default_rng(0).standard_normal(
                (batch, 77, 1024)).astype(np.float32))
            ids0 = jnp.full((batch, pipe.num_tokens), pipe.mask_token_id,
                            jnp.int32)
            try:
                t0 = time.time()
                ids, _ = generate_ids(
                    pipe.params, jax.random.PRNGKey(0), ids0, ctx,
                    cfg=pipe.config, timesteps=args.timesteps, topk=5,
                    dtype=jnp.bfloat16, backend=backend)
                fence(ids)
                warm = time.time() - t0
                t0 = time.time()
                for i in range(args.reps):
                    ids, _ = generate_ids(
                        pipe.params, jax.random.PRNGKey(i + 1), ids0, ctx,
                        cfg=pipe.config, timesteps=args.timesteps, topk=5,
                        dtype=jnp.bfloat16, backend=backend)
                    fence(ids)
                dt = (time.time() - t0) / args.reps
                ips = batch / dt
                print(f'backend={backend:5s} batch={batch:4d}: '
                      f'{dt:.3f}s/gen -> {ips:6.2f} img/s '
                      f'(compile+first {warm:.1f}s)', flush=True)
                results.append((backend, batch, ips))
            except Exception as e:
                print(f'backend={backend:5s} batch={batch:4d}: FAILED '
                      f'{type(e).__name__}: {e}', flush=True)
    if results:
        best = max(results, key=lambda r: r[2])
        print(f'best: backend={best[0]} batch={best[1]} {best[2]:.2f} img/s')


if __name__ == '__main__':
    main()

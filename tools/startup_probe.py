"""Phase-by-phase breakdown of bench.py's startup path on the real chip.

The round-4 driver artifact showed compile_first_s=160.4 with a fully
populated persistent cache (zero new entries written), and a warm-restart
probe SLOWER than cold (250s) — so the time is not XLA compile.  This tool
times each phase independently and counts persistent-cache hits/misses so
BASELINE.md claims can be reconciled with what the driver can reproduce
(VERDICT r4 #1).

Usage:  python tools/startup_probe.py [--batch 64]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=64)
    args = ap.parse_args()

    t = {}
    wall0 = time.time()

    t0 = time.time()
    import jax
    import jax.numpy as jnp
    import numpy as np
    t['import_jax'] = time.time() - t0

    from paintmind_tpu.utils.compile_cache import (enable_persistent_cache,
                                                   install_cache_counter)
    counter = install_cache_counter(keep_other=True)
    cache = enable_persistent_cache()

    t0 = time.time()
    devs = jax.devices()
    t['device_discovery'] = time.time() - t0
    print(f'devices: {devs} | cache: {cache}', file=sys.stderr, flush=True)

    # phase: tiny program end-to-end (measures base tunnel dispatch latency)
    t0 = time.time()
    float(jnp.sum(jnp.ones((8, 8))))
    t['tiny_program'] = time.time() - t0

    # phase: raw upload bandwidth through the tunnel (64 MB)
    buf = np.ones((16, 1024, 1024), np.float32)
    t0 = time.time()
    d = jax.device_put(buf)
    float(jnp.sum(d[0, 0]))
    t['upload_64MB'] = time.time() - t0

    # phase: pipeline construction = param init (PRNG programs + placement)
    t0 = time.time()
    from paintmind_tpu.models.pipeline import Pipeline
    t['import_pipeline'] = time.time() - t0
    t0 = time.time()
    pipe = Pipeline(stage1_pretrained=False, text_encoder=None,
                    compute_dtype=jnp.bfloat16)
    t['pipeline_ctor'] = time.time() - t0
    h0, m0 = counter.hits, counter.misses

    ctx = jnp.asarray(np.random.default_rng(0).standard_normal(
        (args.batch, 77, 1024)).astype(np.float32))

    # phase: first generate, fenced
    t0 = time.time()
    out = pipe.generate(text=ctx, timesteps=16, topk=5,
                        decode_steps='final', key=jax.random.PRNGKey(0))
    float(jnp.sum(out[-1].astype(jnp.float32)))
    t['first_generate'] = time.time() - t0
    h1, m1 = counter.hits, counter.misses

    # phase: second generate (steady state)
    t0 = time.time()
    out = pipe.generate(text=ctx, timesteps=16, topk=5,
                        decode_steps='final', key=jax.random.PRNGKey(1))
    float(jnp.sum(out[-1].astype(jnp.float32)))
    t['second_generate'] = time.time() - t0

    t['total'] = time.time() - wall0
    print(f'cache counters: ctor hits={h0} misses={m0}; '
          f'first-generate hits={h1 - h0} misses={m1 - m0}; '
          f'total hits={counter.hits} misses={counter.misses}',
          file=sys.stderr, flush=True)
    if counter.other:
        print(f'other cache-log lines ({len(counter.other)}):',
              file=sys.stderr)
        for m in counter.other[:10]:
            print('  ', m, file=sys.stderr)
    for k, v in t.items():
        print(f'{k:>18}: {v:8.2f}s', file=sys.stderr, flush=True)


if __name__ == '__main__':
    main()

"""Is a persistent-cache HIT cheaper than a compile on the axon runtime?

Builds a deliberately compile-heavy program (long unrolled chain of
distinct-shape matmuls), compiles it once (cache miss), and prints the
wall time.  Run the script twice: the second run is a pure cache hit —
if hit time ≈ miss time, the PJRT plugin's executable-deserialize path is
as expensive as compiling (i.e. the persistent cache cannot shield
startup on this runtime), which is what the round-5 warm probes suggest
(116 hits / 0 misses and 31s..315s first-call latency for the same
program).

Usage: python tools/cache_hit_ab.py [--tag N]  (run twice, compare)
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--tag', type=int, default=0,
                    help='changes shapes so each tag is a distinct program')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from paintmind_tpu.utils.compile_cache import enable_persistent_cache
    cache = enable_persistent_cache()
    print('devices:', jax.devices(), '| cache:', cache, file=sys.stderr)

    base = 256 + args.tag  # distinct shapes per tag → distinct cache key

    @jax.jit
    def chain(x):
        # 120 distinct-shaped matmul pairs: enough XLA work to measure
        for i in range(120):
            w = jnp.full((x.shape[-1], base + (i % 7) * 8), 0.01,
                         jnp.bfloat16)
            x = jnp.tanh(x @ w)
        return jnp.sum(x.astype(jnp.float32))

    x = jnp.ones((64, base), jnp.bfloat16)
    t0 = time.time()
    v = float(chain(x))
    t_first = time.time() - t0
    t0 = time.time()
    float(chain(x))
    t_steady = time.time() - t0
    print(f'tag={args.tag} first={t_first:.1f}s steady={t_steady:.3f}s '
          f'value={v:.3f}')


if __name__ == '__main__':
    main()

"""Throughput micro-bench for the `paintmindv1-moe` pipeline variant on the
local chip: unconditional 16-step sampler at full dims (dim 1024, depth 12,
8 experts top-2), bf16 compute — the MoE counterpart of bench.py's dense
headline row.  Routing dispatch/combine are dense one-hot einsums, so the
per-step FLOPs exceed the dense model's (~+2 active-expert SwiGLUs worth of
MXU work at the same token count); the interesting number is how much of
that lands on the MXU vs dispatch overhead."""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from paintmind_tpu.utils.compile_cache import enable_persistent_cache
from paintmind_tpu.models import pipeline as pl
import paintmind_tpu.config as pmc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=16)
    ap.add_argument('--timesteps', type=int, default=16)
    ap.add_argument('--reps', type=int, default=3)
    args = ap.parse_args()

    enable_persistent_cache()
    cfg = pl.PipelineConfig.from_dict(pmc.ver2cfg['paintmindv1-moe'])
    params = pl.init_pipeline(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    init_ids = jnp.full((args.batch, cfg.num_tokens), cfg.mask_token_id,
                        jnp.int32)

    def run(k):
        ids, _ = pl.generate_ids(params, k, init_ids, None, cfg=cfg,
                                 timesteps=args.timesteps, topk=5,
                                 dtype=jnp.bfloat16)
        # block_until_ready does not reliably block on the remote-TPU
        # runtime (see bench.py) — fence with a scalar host transfer
        return float(jnp.sum(ids.astype(jnp.float32)))

    t0 = time.perf_counter()
    run(jax.random.PRNGKey(1))
    print(f'compile+first {time.perf_counter() - t0:.1f}s')
    best = float('inf')
    for i in range(args.reps):
        t0 = time.perf_counter()
        run(jax.random.PRNGKey(2 + i))
        best = min(best, time.perf_counter() - t0)
    ips = args.batch / best
    print(f'moe batch {args.batch}: best {best:.3f}s/gen -> '
          f'{ips:.2f} images/sec/chip')


if __name__ == '__main__':
    main()

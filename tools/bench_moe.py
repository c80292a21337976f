"""Throughput micro-bench for the `paintmindv1-moe` pipeline variant on the
local chip, plus a dispatch-cost breakdown (VERDICT r3 #3).

Two layers of measurement:

  * ``--breakdown``: at full stage-2 dims (dim 1024, mlp 4096, 8 experts
    top-2, T = batch·1024 tokens) time one ``moe_swiglu`` under each
    dispatch form ('dense' one-hot einsums vs 'gather' scatter/gather) and
    the expert FFN alone (``vmap(swiglu)`` on the (E, C, D) buffer) — the
    difference full − experts is the routing-dispatch overhead.  The dense
    form's (T, E, C) tensors are O(T²) since capacity C ∝ T; gather moves
    O(T·k·D) bytes.
  * default: unconditional 16-step sampler images/sec at full dims — the
    MoE counterpart of bench.py's dense headline row, with ``--dispatch``
    selecting the routing form end-to-end.
"""

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
from paintmind_tpu.nn import moe
from paintmind_tpu.nn.mlp import swiglu
import paintmind_tpu.config as pmc


def _fence(x):
    return float(jnp.sum(jnp.asarray(x, jnp.float32)))


def _time(fn, *args, reps=5):
    _fence(fn(*args))                    # compile
    best = float('inf')
    for _ in range(reps):
        t0 = time.perf_counter()
        _fence(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def breakdown(batch):
    """Per-layer moe_swiglu cost split: full(dense) vs full(gather) vs
    expert-FFN-only, at stage-2 dims."""
    dim, mlp_dim, e, k, cf = 1024, 4096, 8, 2, 1.25
    t = batch * 1024
    p = moe.init_moe_swiglu(jax.random.PRNGKey(0), dim, mlp_dim, e,
                            param_dtype=jnp.bfloat16)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (t, dim)), jnp.bfloat16)
    cap = max(1, int(t * k / e * cf + 0.999))
    xe = jnp.asarray(np.random.default_rng(1).standard_normal(
        (e, cap, dim)), jnp.bfloat16)

    t_dense = _time(jax.jit(lambda xx: moe.moe_swiglu(
        p, xx, num_selected=k, capacity_factor=cf, dispatch='dense')[0]), x)
    t_gather = _time(jax.jit(lambda xx: moe.moe_swiglu(
        p, xx, num_selected=k, capacity_factor=cf, dispatch='gather')[0]), x)
    t_expert = _time(jax.jit(lambda xx: jax.vmap(swiglu)(p['experts'], xx)),
                     xe)
    print(f'moe_swiglu layer @ T={t} D={dim} E={e} C={cap} (bf16):')
    print(f'  dense dispatch  total {t_dense * 1e3:8.2f} ms '
          f'(dispatch overhead {(t_dense - t_expert) * 1e3:.2f} ms, '
          f'{100 * (t_dense - t_expert) / t_dense:.0f}% of layer)')
    print(f'  gather dispatch total {t_gather * 1e3:8.2f} ms '
          f'(dispatch overhead {(t_gather - t_expert) * 1e3:.2f} ms, '
          f'{100 * (t_gather - t_expert) / max(t_gather, 1e-9):.0f}% of layer)')
    print(f'  expert FFN only       {t_expert * 1e3:8.2f} ms')
    print(f'  gather speedup over dense: {t_dense / t_gather:.2f}x')


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=16)
    ap.add_argument('--timesteps', type=int, default=16)
    ap.add_argument('--reps', type=int, default=3)
    ap.add_argument('--dispatch', choices=('auto', 'dense', 'gather'),
                    default='auto')
    ap.add_argument('--breakdown', action='store_true',
                    help='per-layer dispatch-vs-expert cost split instead '
                         'of the sampler bench')
    args = ap.parse_args()

    enable_persistent_cache()
    if args.breakdown:
        breakdown(args.batch)
        return

    d = dict(pmc.ver2cfg['paintmindv1-moe'])
    d['moe_dispatch'] = args.dispatch
    cfg = pl.PipelineConfig.from_dict(d)
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
    print(f'moe batch {args.batch} ({args.dispatch}): best {best:.3f}s/gen '
          f'-> {ips:.2f} images/sec/chip')


if __name__ == '__main__':
    main()

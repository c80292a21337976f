#!/usr/bin/env python
"""Decompose the headline sampler's per-step cost on the real chip.

The 16-step t2i generate (bench.py) is one scanned program, so a wall-clock
profile can't attribute time to components — and jax.profiler device traces
are unreliable over this hosted-runtime tunnel.  Instead, time ablated
programs that each KEEP a prefix of the per-step work (outputs are summed
into the scan carry so XLA cannot dead-code-eliminate the stage under test):

  backbone       16 x (ids_to_tokens + transformer stack + final LN)
  +head          ... + the (B*L, 8192) vocab projection
  +sampler       ... + fused gumbel top-k sampling head
  full_step      ... + re-mask (sort + scatter) == generate_ids minus decode
  decode         one VQGAN decode of the final ids
  sampler_only   16 x fused sampling head on FIXED logits (kernel alone)
  remask_only    16 x top_k(scores, L) sort + scatter on fixed scores
  remask_rank    16 x the sort-free rank-compare re-mask (current default)

Differences between consecutive rows give the per-component cost.  Run when
the chip is otherwise idle; takes ~10 min including compiles (cached).

Usage: python tools/sampler_breakdown.py [--batch 64] [--reps 3]
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('--batch', type=int, default=64)
    ap.add_argument('--timesteps', type=int, default=16)
    ap.add_argument('--reps', type=int, default=3)
    ap.add_argument('--topk', type=int, default=5)
    ap.add_argument('--cpu', action='store_true',
                    help='force the CPU backend (env JAX_PLATFORMS is '
                         'overridden by the hosted-TPU harness)')
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
    import numpy as np

    from paintmind_tpu.models.pipeline import (
        Pipeline, _schedule_arrays, ids_to_tokens, sample_step)
    from paintmind_tpu.models.transformer import cond_transformer_apply
    from paintmind_tpu.nn.core import layernorm
    from paintmind_tpu.nn.transformer import stack_apply
    from paintmind_tpu.ops.sampling import fused_gumbel_topk_sample
    from paintmind_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    pipe = Pipeline(stage1_pretrained=False, text_encoder=None,
                    compute_dtype=jnp.bfloat16)
    cfg = pipe.config
    tcfg = cfg.tcfg
    b, l, v = args.batch, cfg.num_tokens, tcfg.num_classes
    t = args.timesteps
    params = pipe.params
    dtype = jnp.bfloat16

    ctx = jnp.asarray(np.random.default_rng(0).standard_normal(
        (b, 77, 1024)).astype(np.float32))
    init_ids = jnp.full((b, l), cfg.mask_token_id, jnp.int32)
    n_masked, temps = _schedule_arrays(t, 1.0, l)
    keys = jax.random.split(jax.random.PRNGKey(0), t)
    fixed_logits = (jax.random.normal(jax.random.PRNGKey(1), (b, l, v),
                                      jnp.float32) * 4.0).astype(jnp.bfloat16)
    fixed_scores = jax.random.uniform(jax.random.PRNGKey(2), (b, l))

    if args.cpu:
        # the TPU on-core PRNG has no CPU lowering (even interpreted):
        # substitute the exact XLA sampler so the tool structure still runs
        from paintmind_tpu.models.pipeline import _gumbel, _topk_filter

        def sample_fn(logits, key, temp, k):
            filt = _topk_filter(logits, k)
            pred = jnp.argmax(filt / jnp.maximum(temp, 1e-10)
                              + _gumbel(key, filt.shape), axis=-1)
            probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            conf = jnp.take_along_axis(probs, pred[..., None], axis=-1)[..., 0]
            return pred.astype(jnp.int32), conf
    else:
        def sample_fn(logits, key, temp, k):
            return fused_gumbel_topk_sample(logits, key, temp, k=k)

    def fence(x):
        return float(jnp.sum(x.astype(jnp.float32)))

    def timeit(fn, *a):
        fence(fn(*a))  # compile + first exec
        best = float('inf')
        for _ in range(args.reps):
            t0 = time.time()
            fence(fn(*a))
            best = min(best, time.time() - t0)
        return best

    tp = jax.tree.map(lambda w: w.astype(dtype), params['transformer'])
    # slim pytree for ids_to_tokens: passing the FULL params through a
    # closure would bake 265M fp32 constants into the HLO upload
    emb = {'vqgan': {'quantize': {'codebook':
                                  params['vqgan']['quantize']['codebook']}},
           'mask_token': params['mask_token']}

    def hidden(tp, emb, ids, context):
        x = ids_to_tokens(emb, ids, cfg).astype(dtype)
        from paintmind_tpu.nn.core import linear
        x = linear(tp['token_proj'], x)
        x = x + tp['pos_embed'].astype(x.dtype)
        c = context.astype(x.dtype)
        x = stack_apply(tp['layers'], x, c, heads=tcfg.num_head,
                        dropout_rate=0.0, deterministic=True)
        return layernorm(tp['norm'], x)

    def perturb(ids, acc):
        # Thread the carry into the step input: without this the prefix
        # rows read only loop-invariant operands and XLA hoists the whole
        # transformer out of the scan, timing ONE evaluation instead of 16
        # (observed: "backbone" == one forward).  A carry-dependent ±1 id
        # shift keeps the dependency chain with zero measurable extra work.
        bump = (jnp.round(acc).astype(jnp.int32) % 2)[:, None]
        return (ids + bump) % (cfg.mask_token_id + 1)

    @jax.jit
    def backbone(tp, emb, ids, context):
        def body(acc, _):
            h = hidden(tp, emb, perturb(ids, acc), context)
            return jnp.sum(h, axis=(1, 2)).astype(jnp.float32), None
        return jax.lax.scan(body, jnp.zeros((b,), jnp.float32),
                            jnp.arange(t))[0]

    @jax.jit
    def plus_head(tp, emb, ids, context):
        def body(acc, _):
            logits = cond_transformer_apply(tp, ids_to_tokens(
                emb, perturb(ids, acc), cfg).astype(dtype), context, cfg=tcfg)
            return jnp.sum(logits[:, 0, :8], axis=-1).astype(jnp.float32), None
        return jax.lax.scan(body, jnp.zeros((b,), jnp.float32),
                            jnp.arange(t))[0]

    @jax.jit
    def plus_sampler(tp, emb, ids, context):
        def body(acc, xs):
            key, temp = xs
            logits = cond_transformer_apply(tp, ids_to_tokens(
                emb, perturb(ids, acc), cfg).astype(dtype), context, cfg=tcfg)
            pred, conf = sample_fn(logits, key, temp, args.topk)
            return (jnp.sum(conf, axis=-1)
                    + pred[:, 0].astype(jnp.float32)), None
        return jax.lax.scan(body, jnp.zeros((b,), jnp.float32),
                            (keys, temps))[0]

    @jax.jit
    def full_step(params, ids, context):
        def body(c, xs):
            key, n_m, temp = xs
            ids_next, _ = sample_step(params, c, key, context=context,
                                      n_masked=n_m, temperature=temp,
                                      topk=args.topk, cfg=cfg, dtype=dtype)
            return ids_next, None
        return jax.lax.scan(body, ids, (keys, n_masked, temps))[0]

    @jax.jit
    def sampler_only(logits):
        def body(acc, xs):
            key, temp = xs
            pred, conf = sample_fn(logits, key, temp, args.topk)
            return (acc + jnp.sum(conf, axis=-1)
                    + pred[:, 0].astype(jnp.float32)), None
        return jax.lax.scan(body, jnp.zeros((b,), jnp.float32),
                            (keys, temps))[0]

    @jax.jit
    def remask_only(scores, ids):
        def body(c, n_m):
            _, order = jax.lax.top_k(scores + c[:, :1].astype(scores.dtype),
                                     l)
            ranked = jnp.take_along_axis(ids, order, axis=1)
            new = jnp.where(jnp.arange(l)[None, :] < n_m,
                            jnp.asarray(cfg.mask_token_id, ids.dtype), ranked)
            out = ids.at[jnp.arange(b)[:, None], order].set(new)
            return out, None
        return jax.lax.scan(body, ids, n_masked)[0]

    @jax.jit
    def remask_rank_only(scores, ids):
        def body(c, n_m):
            s = scores + c[:, :1].astype(scores.dtype)
            si, sj = s[:, :, None], s[:, None, :]
            idx = jnp.arange(l, dtype=jnp.int32)
            before = idx[None, None, :] < idx[None, :, None]
            rank = jnp.sum(((sj > si) | ((sj == si) & before))
                           .astype(jnp.int32), axis=-1)
            out = jnp.where(rank < n_m,
                            jnp.asarray(cfg.mask_token_id, ids.dtype), ids)
            return out, None
        return jax.lax.scan(body, ids, n_masked)[0]

    def decode_only(ids):
        return pipe.vqgan.decode_from_indice(ids)

    rows = {}
    rows['backbone'] = timeit(backbone, tp, emb, init_ids, ctx)
    rows['+head'] = timeit(plus_head, tp, emb, init_ids, ctx)
    rows['+sampler'] = timeit(plus_sampler, tp, emb, init_ids, ctx)
    rows['full_step'] = timeit(full_step, params, init_ids, ctx)
    rows['sampler_only'] = timeit(sampler_only, fixed_logits)
    rows['remask_only'] = timeit(remask_only, fixed_scores, init_ids)
    rows['remask_rank'] = timeit(remask_rank_only, fixed_scores, init_ids)
    rows['decode'] = timeit(decode_only, init_ids)

    print(json.dumps({k: round(s, 4) for k, s in rows.items()}, indent=1))
    print(f"head       = {rows['+head'] - rows['backbone']:+.3f}s")
    print(f"sampler    = {rows['+sampler'] - rows['+head']:+.3f}s")
    print(f"remask     = {rows['full_step'] - rows['+sampler']:+.3f}s")
    print(f"full+dec   = {rows['full_step'] + rows['decode']:.3f}s "
          f"(bench.py steady ~4.66s at batch 64)")


if __name__ == '__main__':
    main()

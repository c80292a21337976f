#!/usr/bin/env python
"""Micro + macro benchmark for the int8 quantized path on the real chip.

1. Micro: raw MXU matmul throughput bf16 vs s8xs8->s32 at transformer
   shapes — establishes whether XLA lowers int8 dots to the double-rate
   MXU path on this chip (v5e: ~394 int8 vs ~197 bf16 TOPS peak).
2. Macro: the 16-step sampler at batch 64, bf16 vs w8 vs w8a8
   (same program bench.py times), plus logit agreement between the
   quantized and bf16 transformers on identical inputs.

Usage: python tools/bench_int8.py [--skip-macro]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _fence(x):
    import jax.numpy as jnp
    return float(jnp.sum(x.astype(jnp.float32)))


def micro():
    import jax
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(0)
    results = {}
    # (M, K, N): sampler-shaped GEMMs — batch64 x 1024 tokens = 65536 rows
    for m, k, n in ((65536, 1024, 1024), (65536, 1024, 5472),
                    (65536, 1024, 8192)):
        a8 = jnp.asarray(rng.integers(-127, 128, (m, k)), jnp.int8)
        b8 = jnp.asarray(rng.integers(-127, 128, (k, n)), jnp.int8)
        abf = a8.astype(jnp.bfloat16)
        bbf = b8.astype(jnp.bfloat16)

        # scalar reduce INSIDE the jitted program: the fence then transfers
        # one scalar for both paths — an outside-jit fence would read the
        # s32 output at 2x the bytes of bf16 and bias the very ratio this
        # measures (the reduce itself fuses into the matmul consumer)
        f_bf = jax.jit(lambda x, y: jnp.sum(
            jnp.dot(x, y, preferred_element_type=jnp.bfloat16)
            .astype(jnp.float32)))
        f_i8 = jax.jit(lambda x, y: jnp.sum(
            jax.lax.dot_general(x, y, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
            .astype(jnp.float32)))

        for name, f, x, y in (('bf16', f_bf, abf, bbf),
                              ('int8', f_i8, a8, b8)):
            float(f(x, y))  # compile+warm
            reps = []
            for _ in range(6):
                t0 = time.time()
                float(f(x, y))
                reps.append(time.time() - t0)
            dt = min(reps)
            tops = 2 * m * k * n / dt / 1e12
            results[f'{name} {m}x{k}x{n}'] = round(tops, 1)
            print(f'{name} ({m}, {k}) @ ({k}, {n}): {dt * 1e3:.2f} ms '
                  f'-> {tops:.1f} TOPS', flush=True)
    return results


def macro(checkpoint=None):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from paintmind_tpu.models.pipeline import Pipeline
    from paintmind_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    batch, timesteps = 64, 16
    ctx = jnp.asarray(np.random.default_rng(0).standard_normal(
        (batch, 77, 1024)).astype(np.float32))
    results = {}
    logits_ref = None
    for mode in (None, 'w8', 'w8a8'):
        pipe = Pipeline(stage1_pretrained=False, text_encoder=None,
                        compute_dtype=jnp.bfloat16)
        if checkpoint:  # real weights → the agreement numbers are the
            pipe.from_pretrained(checkpoint)  # deployment quality signal
        if mode:
            pipe.quantize(mode)
        # logit agreement on a fixed input (same seed-0 weights every loop)
        ids = jnp.full((2, pipe.num_tokens), pipe.mask_token_id, jnp.int32)
        tok = pipe.ids2tokens(ids)
        lg = np.asarray(pipe.tokens2logits(tok, ctx[:2]), np.float32)
        if logits_ref is None:
            logits_ref = lg
        else:
            rel = (np.linalg.norm(lg - logits_ref)
                   / np.linalg.norm(logits_ref))
            agree = float((lg.argmax(-1) == logits_ref.argmax(-1)).mean())
            results[f'{mode} logit_rel_err'] = round(float(rel), 4)
            results[f'{mode} argmax_agree'] = round(agree, 4)
            print(f'{mode}: logit rel err {rel:.4f}, '
                  f'argmax agreement {agree:.4f}', flush=True)

        t0 = time.time()
        out = pipe.generate(text=ctx, timesteps=timesteps, topk=5,
                            decode_steps='final', key=jax.random.PRNGKey(0))
        _fence(out[-1])
        print(f'{mode or "bf16"}: compile+first {time.time() - t0:.1f}s',
              flush=True)
        reps = []
        for i in range(4):
            t0 = time.time()
            out = pipe.generate(text=ctx, timesteps=timesteps, topk=5,
                                decode_steps='final',
                                key=jax.random.PRNGKey(i + 1))
            _fence(out[-1])
            reps.append(time.time() - t0)
        ips = batch / min(reps)
        results[f'{mode or "bf16"} img/s'] = round(ips, 2)
        print(f'{mode or "bf16"}: best {min(reps):.3f}s '
              f'-> {ips:.2f} img/s/chip', flush=True)
        del pipe
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--skip-macro', action='store_true')
    ap.add_argument('--skip-micro', action='store_true')
    ap.add_argument('--checkpoint', default=None,
                    help='trained pipeline .npz — the macro logit-agreement '
                         'numbers then measure real-weight quality')
    ap.add_argument('--out', default=None, help='write results JSON here')
    args = ap.parse_args()

    import jax
    print('devices:', jax.devices(), flush=True)
    results = {}
    if not args.skip_micro:
        results.update(micro())
    if not args.skip_macro:
        results.update(macro(args.checkpoint))
    print(json.dumps(results, indent=1))
    if args.out:
        with open(args.out, 'w') as f:
            json.dump(results, f, indent=1)


if __name__ == '__main__':
    main()

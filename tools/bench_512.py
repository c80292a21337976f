#!/usr/bin/env python
"""512² (4096-token) sampler benchmark, with the sequence-parallel path.

The 512² variant is the reason ``Pipeline.shard(mesh,
sequence_parallel=True)`` exists: 4096-token activations are 4× the 256²
grid, and sharding the token axis over 'model' splits both the attention
FLOPs and the activation HBM.  This tool (VERDICT r4 #3):

  * benches ``paintmindv1-512`` 16-step sampling on the current backend —
    plain, and through the ``shard(..., sequence_parallel=True)`` path so
    the compiled program carries the sequence-sharding constraints
    (on the single real chip the 'model' axis is 1, so the constraint is
    a layout no-op; on a multi-chip mesh the same program splits the
    sequence);
  * with ``--check`` verifies plain-vs-sequence-parallel decode parity on
    a virtual multi-device CPU mesh (run with
    ``JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8``
    via tests/conftest semantics, or pass --devices).

Usage:
  python tools/bench_512.py [--batch 16] [--reps 3] [--checkpoint X.npz]
  JAX_PLATFORMS='' python tools/bench_512.py --check --model-parallel 4
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(version, checkpoint, compute_dtype):
    import paintmind_tpu as pm
    pipe = pm.create_model(arch='pipeline', version=version,
                           pretrained=False, text_encoder=None,
                           compute_dtype=compute_dtype)
    if checkpoint:
        pipe.from_pretrained(checkpoint)
    return pipe


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('--version', default='paintmindv1-512')
    ap.add_argument('--checkpoint', default=None,
                    help='trained 512² pipeline .npz (optional: throughput '
                         'is weight-independent)')
    ap.add_argument('--batch', type=int, default=16)
    ap.add_argument('--timesteps', type=int, default=16)
    ap.add_argument('--reps', type=int, default=3)
    ap.add_argument('--model-parallel', type=int, default=1,
                    help='mesh model axis for the sequence-parallel run')
    ap.add_argument('--check', action='store_true',
                    help='CPU-mesh correctness: plain vs sequence-parallel '
                         'decode parity (forces jax_platforms=cpu)')
    args = ap.parse_args()

    if args.check:
        # append, don't setdefault: a pre-existing XLA_FLAGS (common on
        # TPU hosts) would otherwise silently drop the 8-device forcing
        flag = '--xla_force_host_platform_device_count=8'
        prev = os.environ.get('XLA_FLAGS', '')
        if flag not in prev:
            os.environ['XLA_FLAGS'] = (prev + ' ' + flag).strip()
    import jax
    if args.check:
        jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp

    from paintmind_tpu.parallel import mesh as pmesh
    from paintmind_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    print('devices:', jax.devices(), file=sys.stderr)

    dtype = jnp.float32 if args.check else jnp.bfloat16
    ctx = jnp.asarray(np.random.default_rng(0).standard_normal(
        (args.batch, 8, 1024)).astype(np.float32))
    key = jax.random.PRNGKey(0)

    def fence(out):
        return float(jnp.sum(out[-1].astype(jnp.float32)))

    def run(pipe, k):
        # --check uses deterministic decode (temperature 0, topk 1) so the
        # sharded/plain trajectories are comparable token-for-token
        return pipe.generate(text=ctx, timesteps=args.timesteps,
                             topk=1 if args.check else 5,
                             temperature=0.0 if args.check else 1.0,
                             decode_steps='final', key=jax.random.PRNGKey(k))

    if args.check:
        mp = args.model_parallel if args.model_parallel > 1 else 4
        pipe = build(args.version, args.checkpoint, None)
        ref = run(pipe, 0)[-1]
        mesh = pmesh.make_mesh(jax.devices()[:8], model_parallel=mp)
        pipe.shard(mesh, sequence_parallel=True)
        out = run(pipe, 0)[-1]
        err = float(np.max(np.abs(np.asarray(out, np.float32)
                                  - np.asarray(ref, np.float32))))
        print(f'sequence-parallel ({mp}-way) vs plain 512² decode: '
              f'max abs err {err:.2e}')
        assert err < 1e-2, err
        print('OK')
        return

    results = {}
    for tag, seq_par in (('plain', False), ('sequence-parallel', True)):
        pipe = build(args.version, args.checkpoint, dtype)
        if seq_par:
            mesh = pmesh.make_mesh(
                jax.devices()[:max(args.model_parallel, 1)],
                model_parallel=max(args.model_parallel, 1))
            pipe.shard(mesh, sequence_parallel=True)
        t0 = time.time()
        fence(run(pipe, 0))
        print(f'[{tag}] compile+first {time.time() - t0:.1f}s',
              file=sys.stderr)
        reps = []
        for i in range(args.reps):
            t0 = time.time()
            fence(run(pipe, i + 1))
            reps.append(time.time() - t0)
        dt = min(reps)
        ips = args.batch / dt
        results[tag] = ips
        print(f'[{tag}] best {dt:.3f}s/gen (mean {np.mean(reps):.3f}) '
              f'-> {ips:.2f} images/sec/chip', file=sys.stderr)
        from paintmind_tpu.parallel.context import set_active_mesh
        set_active_mesh(None)

    import json
    print(json.dumps({'metric': f'images/sec/chip 512x512 '
                                f'{args.timesteps}-step t2i '
                                f'(batch {args.batch}, bf16)',
                      **{k.replace('-', '_'): round(v, 3)
                         for k, v in results.items()}}))


if __name__ == '__main__':
    main()

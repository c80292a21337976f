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

Structure (round 5, VERDICT r4 #1): the parent process never imports JAX —
it runs the cold measurement and the warm-restart probe as SEQUENTIAL
subprocesses, so the warm probe never contends with a parent that still
holds the remote-TPU tunnel (the round-4 artifact's 250 s "warm" probe ran
concurrently with the parent's live client and measured contention, not
warm start).  Each child prints a phase breakdown + persistent-cache
hit/miss counters to stderr so the artifact itself shows where the time
went: on this hosted runtime the first-call latency is dominated by tunnel
dispatch latency and cached-executable loading, NOT XLA compilation —
phase-probed at a quiet tunnel: devices 10 s, first dispatch 7 s, param
init 10 s, first generate 24.5 s (115 cache hits / 6 misses), steady-state
4.48 s (tools/startup_probe.py).  Driver-time numbers scale with whatever
load the shared tunnel is under.

``cfg_value`` (VERDICT r4 #4) is one guided rep at guidance_scale=2.0 at
the best batch.  Note: contexts are precomputed random embeddings in BOTH
the plain and guided paths — no T5 forward is included (real T5 weights
are unreachable offline; BASELINE.md).
"""

from __future__ import annotations

import json
import subprocess
import sys
import time

TORCH_CPU_BASELINE = 0.0053  # images/sec, see module docstring


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def child(mode, args):
    """One measured process: builds the pipeline, runs the sampler.

    mode='cold': batch sweep + best-of-4 steady state + one guided rep;
    prints a JSON result line (marker-prefixed) on stdout.
    mode='warm': one generate at args.batch against the (populated)
    persistent cache; prints the same marker JSON with phase timings.
    """
    t_proc0 = time.time()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from paintmind_tpu.models.pipeline import Pipeline
    from paintmind_tpu.utils.compile_cache import (enable_persistent_cache,
                                                   install_cache_counter)

    # mark='generate_ids': everything before that hit/miss record in a
    # first call is Python tracing + lowering; everything after is the
    # runtime loading (or compiling) the executable
    counter = install_cache_counter(mark='generate_ids', propagate=False)

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
    t0 = time.time()
    devs = jax.devices()
    t_devices = time.time() - t0
    log(f'[{mode}] devices: {devs} | compile cache: {cache} '
        f'({t_devices:.1f}s discovery)')
    signal.alarm(0)

    t0 = time.time()
    pipe = Pipeline(stage1_pretrained=False, text_encoder=None,
                    compute_dtype=jnp.bfloat16)
    t_params = time.time() - t0
    if args.quant:
        pipe.quantize(args.quant)
        log(f'[{mode}] stage-2 transformer quantized: {args.quant}')
    log(f'[{mode}] pipeline built (param init) {t_params:.1f}s | '
        f'cache hits={counter.hits} misses={counter.misses}')
    timesteps = 16

    # NOTE: block_until_ready does not reliably block on the remote-TPU
    # runtime here — force a scalar host transfer to fence the device.
    def fence(out):
        return float(jnp.sum(out[-1].astype(jnp.float32)))

    def gen(ctx, key, **kw):
        return pipe.generate(text=ctx, timesteps=timesteps, topk=5,
                             decode_steps='final',
                             key=jax.random.PRNGKey(key), **kw)

    if mode == 'warm':
        batch = args.batch
        ctx = jnp.asarray(np.random.default_rng(0).standard_normal(
            (batch, 77, 1024)).astype(np.float32))
        t0 = time.time()
        fence(gen(ctx, 0))
        t_first = time.time() - t0
        # split: Python trace+lower vs the runtime loading the (cached)
        # executable — on this hosted runtime the load step dominates and
        # its latency tracks shared-server load, not anything local
        trace_s = load_s = None
        if counter.mark_t is not None:
            trace_s = round(counter.mark_t - t0, 1)
            load_s = round(t0 + t_first - counter.mark_t, 1)
        log(f'[warm] first generate {t_first:.1f}s '
            f'(trace+lower {trace_s}s, executable load+run {load_s}s) | '
            f'cache hits={counter.hits} misses={counter.misses}')
        print('@@RESULT@@' + json.dumps({
            'warm_first_s': round(t_first, 1),
            'warm_trace_s': trace_s, 'warm_exec_load_s': load_s,
            'warm_devices_s': round(t_devices, 1),
            'warm_params_s': round(t_params, 1),
            'warm_in_process_total_s': round(time.time() - t_proc0, 1),
            'cache_hits': counter.hits, 'cache_misses': counter.misses,
        }))
        return

    best = 0.0
    best_cfg = None
    t_first = None
    # batch 64 was the measured optimum; smaller batches are fallbacks so a
    # memory regression still produces a number
    for batch in (64, 32, 8):
        ctx = jnp.asarray(np.random.default_rng(0).standard_normal(
            (batch, 77, 1024)).astype(np.float32))
        try:
            t0 = time.time()
            fence(gen(ctx, 0))
            t_first = time.time() - t0
            log(f'[cold] batch {batch}: compile+first {t_first:.1f}s | '
                f'cache hits={counter.hits} misses={counter.misses}')
            # best-of-N: the hosted chip sits behind a shared tunnel and
            # individual calls absorb occasional server-side hiccups; the
            # fastest rep is the closest estimate of true device throughput
            # (mean also logged for transparency)
            n = 4
            reps = []
            for i in range(n):
                t0 = time.time()
                fence(gen(ctx, i + 1))
                reps.append(time.time() - t0)
            dt = min(reps)
            ips = batch / dt
            log(f'[cold] batch {batch}: best {dt:.3f}s/gen (mean '
                f'{sum(reps) / n:.3f}) -> {ips:.2f} images/sec/chip')
            if ips > best:
                best, best_cfg = ips, batch
            break  # largest working batch wins; no need to sweep down
        except Exception as e:  # OOM at large batch etc. → try smaller
            log(f'[cold] batch {batch}: failed ({type(e).__name__}: {e})')

    # BASELINE config 4 (VERDICT r4 #4): guided sampling, CFG scale 2.0 —
    # two transformer passes per step (measured bound ≈ plain/2.38, see
    # BASELINE.md CFG analysis).  Contexts are precomputed embeddings; no
    # T5 forward (weights env-gated).
    cfg_value = None
    if best_cfg is not None:
        try:
            ctx = jnp.asarray(np.random.default_rng(0).standard_normal(
                (best_cfg, 77, 1024)).astype(np.float32))
            fence(gen(ctx, 100, guidance_scale=2.0))  # compile pass
            reps = []
            for i in range(2):
                t0 = time.time()
                fence(gen(ctx, 101 + i, guidance_scale=2.0))
                reps.append(time.time() - t0)
            cfg_value = best_cfg / min(reps)
            log(f'[cold] guided (cfg 2.0) batch {best_cfg}: best '
                f'{min(reps):.3f}s/gen -> {cfg_value:.2f} images/sec/chip '
                '(precomputed embeddings, no T5 forward)')
        except Exception as e:
            log(f'[cold] guided rep failed ({type(e).__name__}: {e})')

    print('@@RESULT@@' + json.dumps({
        'best': best, 'best_cfg': best_cfg,
        'compile_first_s': None if t_first is None else round(t_first, 1),
        'cfg_value': None if cfg_value is None else round(cfg_value, 3),
        'cache_hits': counter.hits, 'cache_misses': counter.misses,
    }))


def parse_child(proc_out):
    for line in reversed(proc_out.splitlines()):
        if line.startswith('@@RESULT@@'):
            return json.loads(line[len('@@RESULT@@'):])
    return None


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument('--quant', choices=('w8', 'w8a8'), default=None,
                    help='int8-quantize the stage-2 transformer first '
                         '(nn/quant.py); default stays the bf16 headline')
    ap.add_argument('--child', choices=('cold', 'warm'), default=None,
                    help='internal: run one measured subprocess')
    ap.add_argument('--batch', type=int, default=64,
                    help='internal: warm-probe batch')
    args = ap.parse_args()

    if args.child:
        child(args.child, args)
        return

    # parent: NO jax import — run cold then warm sequentially so the warm
    # probe gets the tunnel to itself (round-4's concurrent probe measured
    # parent/child contention: 250 s "warm" vs 160 s cold).
    base = [sys.executable, __file__] + (
        ['--quant', args.quant] if args.quant else [])
    r = subprocess.run(base + ['--child', 'cold'], text=True,
                       stdout=subprocess.PIPE, stderr=None, timeout=3600)
    cold = parse_child(r.stdout)
    if not cold or cold.get('best_cfg') is None:
        raise SystemExit('cold benchmark child produced no result')

    # the remote runtime's executable-load step sporadically queues behind
    # other tenants of the shared compile server for minutes (measured:
    # the same pure-cache-hit program loaded in 471.8s and then 2.6s in
    # back-to-back runs — tools/cache_hit_ab.py).  A stalled probe
    # (zero cache misses yet minutes-long first call) is retried once and
    # both attempts are reported.
    warm = None
    warm_total = None
    attempts = []
    for attempt in range(2):
        try:
            t0 = time.time()
            r = subprocess.run(
                base + ['--child', 'warm', '--batch', str(cold['best_cfg'])],
                text=True, stdout=subprocess.PIPE, stderr=None, timeout=1800)
            took = time.time() - t0
            res = parse_child(r.stdout)
            if not res:
                log(f'warm probe attempt {attempt + 1} produced no result')
                continue
            attempts.append(res['warm_first_s'])
            if warm is None or res['warm_first_s'] < warm['warm_first_s']:
                warm, warm_total = res, took
            log(f'warm restart (attempt {attempt + 1}): {took:.1f}s process '
                f"total (imports + devices {res['warm_devices_s']}s + params "
                f"{res['warm_params_s']}s), {res['warm_first_s']}s cached "
                'compile + first image batch')
            if res['warm_first_s'] < 120 or res['cache_misses'] > 0:
                break  # genuine measurement — a retry would not add info
            log('warm probe saw zero cache misses but a minutes-long first '
                'call: shared-compile-server stall, retrying once')
        except Exception as e:
            log(f'warm probe failed: {e}')

    tag = f'int8-{args.quant}' if args.quant else 'bf16'
    out = {
        'metric': f'images/sec/chip 256x256 16-step t2i '
                  f"(batch {cold['best_cfg']}, {tag})",
        'value': round(cold['best'], 3),
        'unit': 'images/sec/chip',
        'vs_baseline': round(cold['best'] / TORCH_CPU_BASELINE, 1),
        'cfg_value': cold.get('cfg_value'),
        'compile_first_s': cold.get('compile_first_s'),
        'cache_hits': cold.get('cache_hits'),
        'cache_misses': cold.get('cache_misses'),
    }
    if warm:
        out['warm_first_s'] = warm['warm_first_s']
        out['warm_restart_total_s'] = round(warm_total, 1)
        out['warm_devices_s'] = warm['warm_devices_s']
        out['warm_params_s'] = warm['warm_params_s']
        out['warm_trace_s'] = warm.get('warm_trace_s')
        out['warm_exec_load_s'] = warm.get('warm_exec_load_s')
        if len(attempts) > 1:
            out['warm_attempts_s'] = attempts
    print(json.dumps(out))


if __name__ == '__main__':
    main()

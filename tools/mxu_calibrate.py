"""MXU calibration: measured bf16 vs int8 matmul ceilings on this chip.

Evidence for the BASELINE.md precision-headroom claim: on this hosted v5e
the practical matmul ceiling is ~100 T-ops/s for BOTH bf16 and int8 — int8
is not a throughput lever, so the stage-2 sampler stays bf16.

Usage: PYTHONPATH=.:$PYTHONPATH python tools/mxu_calibrate.py
"""

from __future__ import annotations

import functools
import time

import numpy as np


def _chain(x, w, n, out_dtype):
    import jax.numpy as jnp
    for _ in range(n):
        x = jnp.dot(x, w, preferred_element_type=out_dtype)
        if out_dtype != x.dtype:
            x = x.astype(w.dtype)  # requantize/cast so the chain continues
    return x


def measure(m, k, n_mats, dtype_name, reps=3):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    if dtype_name == 'int8':
        x = jnp.asarray(rng.integers(-127, 127, (m, k)), jnp.int8)
        w = jnp.asarray(rng.integers(-127, 127, (k, k)), jnp.int8)
        out_dtype = jnp.int32
    else:
        x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((k, k)), jnp.bfloat16)
        out_dtype = jnp.float32

    f = jax.jit(functools.partial(_chain, n=n_mats, out_dtype=out_dtype))
    float(jnp.sum(f(x, w).astype(jnp.float32)))  # compile + warm
    t0 = time.time()
    for _ in range(reps):
        float(jnp.sum(f(x, w).astype(jnp.float32)))  # fence via host scalar
    dt = (time.time() - t0) / reps
    tops = 2.0 * m * k * k * n_mats / dt / 1e12
    return dt, tops


def main():
    print(f"{'dtype':>6} {'M':>6} {'K':>5} {'chain':>5} {'time':>8} {'T-ops/s':>8}")
    for dtype in ('bf16', 'int8'):
        for m, k in [(8192, 1024), (16384, 1024), (8192, 2048)]:
            n_mats = 64
            dt, tops = measure(m, k, n_mats, dtype)
            print(f'{dtype:>6} {m:>6} {k:>5} {n_mats:>5} {dt*1000:7.1f}ms '
                  f'{tops:8.1f}')


if __name__ == '__main__':
    main()

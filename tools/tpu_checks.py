"""On-chip kernel checks (run manually on the real TPU; CPU CI covers the
XLA paths).  Usage: PYTHONPATH=.:$PYTHONPATH python tools/tpu_checks.py"""

from __future__ import annotations

import time

import numpy as np


def fence(x):
    import jax.numpy as jnp
    return float(jnp.sum(x.astype(jnp.float32)))


def check_flash_attention():
    import jax, jax.numpy as jnp
    from paintmind_tpu.ops.flash_attention import flash_attention, _xla_reference
    rng = np.random.default_rng(0)
    for (b, n, m, h, d) in [(2, 1024, 1024, 8, 64), (2, 1024, 77, 16, 64)]:
        q = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((b, m, h, d)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((b, m, h, d)), jnp.float32)
        out = flash_attention(q, k, v, d ** -0.5)
        with jax.default_matmul_precision('highest'):
            ref = _xla_reference(q, k, v, d ** -0.5)
        mae = float(jnp.mean(jnp.abs(out - ref)))
        print(f'flash_attention b={b} n={n} m={m} h={h}: mae={mae:.2e}')
        assert mae < 5e-3, mae
        # backward kernel vs XLA-reference grads
        def loss_flash(q_, k_, v_):
            return jnp.sum(jnp.square(flash_attention(q_, k_, v_, d ** -0.5)))

        def loss_ref(q_, k_, v_):
            with jax.default_matmul_precision('highest'):
                return jnp.sum(jnp.square(_xla_reference(q_, k_, v_, d ** -0.5)))

        gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for name, a, bb in zip('qkv', gf, gr):
            rel = float(jnp.mean(jnp.abs(a - bb)) / (jnp.mean(jnp.abs(bb)) + 1e-9))
            print(f'  d{name} rel err: {rel:.2e}')
            assert rel < 2e-2, (name, rel)
    print('flash_attention OK (fwd + pallas bwd)')


def check_vq_lookup():
    import jax.numpy as jnp
    from paintmind_tpu.ops.vq_lookup import fused_nearest_codes
    from paintmind_tpu.models.quantize import l2norm
    rng = np.random.default_rng(1)
    z = l2norm(jnp.asarray(rng.standard_normal((4, 1024, 32)), jnp.float32))
    e = l2norm(jnp.asarray(rng.standard_normal((8192, 32)), jnp.float32))
    idx = fused_nearest_codes(z, e)
    ref = jnp.argmax(jnp.einsum('bld,nd->bln', z, e), axis=-1)
    match = float(jnp.mean((idx == ref).astype(jnp.float32)))
    print(f'vq_lookup agreement: {match:.4f}')
    assert match > 0.999, match
    print('vq_lookup OK')


def check_fused_sampling():
    import jax, jax.numpy as jnp
    from paintmind_tpu.ops.sampling import fused_gumbel_topk_sample
    rng = np.random.default_rng(2)
    logits = jnp.asarray(rng.standard_normal((8, 1024, 8192)) * 3, jnp.float32)
    key = jax.random.PRNGKey(0)
    pred, conf = fused_gumbel_topk_sample(logits, key, 1.0, k=5)
    # every pred is within the row's top-5
    top5 = jax.lax.top_k(logits, 5)[1]
    in_top5 = jnp.any(top5 == pred[..., None], axis=-1)
    frac = float(jnp.mean(in_top5.astype(jnp.float32)))
    print(f'pred in top-5: {frac:.4f}')
    assert frac == 1.0, frac
    # conf == softmax prob of pred
    probs = jax.nn.softmax(logits, axis=-1)
    ref_conf = jnp.take_along_axis(probs, pred[..., None], -1)[..., 0]
    mae = float(jnp.mean(jnp.abs(conf - ref_conf)))
    print(f'conf mae vs softmax gather: {mae:.2e}')
    assert mae < 1e-5, mae
    # temp→0 ⇒ argmax
    pred0, _ = fused_gumbel_topk_sample(logits, key, 1e-8, k=5)
    agree = float(jnp.mean((pred0 == jnp.argmax(logits, -1)).astype(jnp.float32)))
    print(f'temp→0 argmax agreement: {agree:.4f}')
    assert agree > 0.999
    # determinism
    pred2, _ = fused_gumbel_topk_sample(logits, key, 1.0, k=5)
    assert bool(jnp.all(pred2 == pred))
    # distribution: repeated draws over one logits row follow the
    # top-5 softmax (gumbel-max property); TV distance small
    row = logits[0, 0]
    top_vals, top_idx = jax.lax.top_k(row, 5)
    target = np.asarray(jax.nn.softmax(top_vals))
    draws = 4000
    many = jnp.broadcast_to(row, (draws, row.shape[0]))
    preds, _ = fused_gumbel_topk_sample(many, jax.random.PRNGKey(7), 1.0, k=5)
    counts = np.array([(np.asarray(preds) == int(i)).mean() for i in top_idx])
    tv = 0.5 * np.abs(counts - target).sum()
    print(f'fused sampler TV distance vs top-5 softmax: {tv:.4f}')
    assert tv < 0.03, tv
    # duplicate logits at the k boundary (the bf16 path rounds values
    # together): tie-break must keep exactly k, lowest index first
    row = np.full((8192,), -50.0, np.float32)
    row[:4] = [5.0, 4.0, 4.0, 4.0]
    tied = jnp.asarray(np.tile(row, (512, 1)))
    tpred, _ = fused_gumbel_topk_sample(tied, jax.random.PRNGKey(3), 100.0, k=3)
    ids = set(np.asarray(tpred).ravel().tolist())
    print(f'tied-logits k=3 sampled support: {sorted(ids)}')
    assert ids <= {0, 1, 2} and len(ids) == 3, ids
    print('fused_sampling OK')


def check_int8_linear():
    """int8 quantized linear on the MXU: w8a8 matches the fp32 product
    within the quantization-noise bound, and the s8 x s8 dot actually
    lowers (s32 output dtype)."""
    import jax, jax.numpy as jnp
    from paintmind_tpu.nn import quant
    from paintmind_tpu.nn.core import init_linear, linear
    p = init_linear(jax.random.PRNGKey(0), 1024, 1024)
    x = jax.random.normal(jax.random.PRNGKey(1), (64, 1024), jnp.bfloat16)
    with jax.default_matmul_precision('highest'):
        want = linear(p, x.astype(jnp.float32))
    for mode, tol in (('w8', 0.01), ('w8a8', 0.03)):
        q = quant.quantize_linear(p, mode)
        got = jax.jit(linear)(q, x).astype(jnp.float32)
        rel = float(jnp.linalg.norm(got - want) / jnp.linalg.norm(want))
        print(f'int8 {mode}: rel err {rel:.4f}')
        assert rel < tol, (mode, rel)
    hlo = jax.jit(linear).lower(
        quant.quantize_linear(p, 'w8a8'), x).compile().as_text()
    assert any('s32[' in l and 'dot' in l for l in hlo.splitlines()), \
        'w8a8 dot did not lower to an integer-accumulating matmul'
    print('int8 linear OK (s32-accumulating dot present)')


def bench_generate():
    import jax, jax.numpy as jnp
    from paintmind_tpu.models.pipeline import Pipeline
    pipe = Pipeline(stage1_pretrained=False, text_encoder=None,
                    compute_dtype=jnp.bfloat16)
    for batch in (8, 32):
        ctx = jnp.asarray(np.random.default_rng(0).standard_normal(
            (batch, 77, 1024)).astype(np.float32))
        t0 = time.time()
        out = pipe.generate(text=ctx, timesteps=16, topk=5,
                            decode_steps='final', key=jax.random.PRNGKey(0))
        fence(out[-1])
        print(f'batch {batch} compile+first: {time.time() - t0:.1f}s')
        n = 3
        t0 = time.time()
        for i in range(n):
            out = pipe.generate(text=ctx, timesteps=16, topk=5,
                                decode_steps='final',
                                key=jax.random.PRNGKey(i + 1))
            fence(out[-1])
        dt = (time.time() - t0) / n
        print(f'batch {batch}: {dt:.3f}s/gen -> {batch / dt:.2f} img/s/chip')


if __name__ == '__main__':
    check_flash_attention()
    check_vq_lookup()
    check_fused_sampling()
    check_int8_linear()
    bench_generate()

"""Pallas kernel logic verified on CPU via the interpreter — CI coverage
for the TPU kernels (the fused sampler needs the on-core PRNG and is
covered on-chip by tools/tpu_checks.py instead)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from paintmind_tpu.models.quantize import l2norm
from paintmind_tpu.ops import flash_attention as fa
from paintmind_tpu.ops import vq_lookup as vql


@pytest.fixture(autouse=True)
def interpret_mode():
    # NOTE: the jitted wrappers cache per shape; this file uses shapes no
    # other test touches so the flag is honored at trace time.
    fa._INTERPRET = True
    vql._INTERPRET = True
    yield
    fa._INTERPRET = False
    vql._INTERPRET = False


def test_vq_lookup_kernel(rng):
    z = l2norm(jnp.asarray(rng.standard_normal((2, 40, 32)), jnp.float32))
    e = l2norm(jnp.asarray(rng.standard_normal((256, 32)), jnp.float32))
    idx = vql.fused_nearest_codes(z, e)
    ref = jnp.argmax(jnp.einsum('bld,nd->bln', z, e), -1)
    assert np.array_equal(np.asarray(idx), np.asarray(ref))


@pytest.mark.parametrize('n,m', [(128, 77), (256, 256), (130, 40)])
def test_flash_forward_kernel(rng, n, m):
    q = jnp.asarray(rng.standard_normal((1, n, 2, 64)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, m, 2, 64)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, m, 2, 64)), jnp.float32)
    out = fa.flash_attention(q, k, v, 0.125)
    ref = fa._xla_reference(q, k, v, 0.125)
    assert float(jnp.abs(out - ref).mean()) < 1e-6


def test_topk_keep_mask_exact_k_with_ties(rng):
    """ADVICE r1: duplicate logits (bf16 rounding) must not let >k
    candidates survive the fused sampler's top-k filter."""
    from paintmind_tpu.ops.sampling import topk_keep_mask

    # ties straddling the k boundary: [5, 4, 4, 4, -50...], k=3
    row = np.full((512,), -50.0, np.float32)
    row[:4] = [5.0, 4.0, 4.0, 4.0]
    l = jnp.asarray(np.tile(row, (8, 1)))
    keep = np.asarray(topk_keep_mask(l, 3))
    assert (keep.sum(-1) == 3).all()
    assert keep[:, :3].all() and not keep[:, 3].any()  # lowest-index ties win

    # random logits — both bf16-rounded (many exact duplicates) and raw
    # fp32 (near-equal values an epsilon scheme would mis-order): exactly
    # k survive, the same set numpy's stable count-based top-k keeps
    cases = [
        jnp.asarray(rng.standard_normal((16, 512)) * 8,
                    jnp.bfloat16).astype(jnp.float32),
        jnp.asarray(rng.standard_normal((16, 512)) * 3, jnp.float32),
        jnp.asarray(rng.integers(0, 4, (16, 512)), jnp.float32),  # mass ties
    ]
    for lb in cases:
        for k in (1, 5, 25):
            keep = np.asarray(topk_keep_mask(lb, k))
            assert (keep.sum(-1) == k).all(), keep.sum(-1)
            a = np.asarray(lb, np.float32)
            # stable sort on (-value, index): first k = reference order
            order = np.lexsort((np.tile(np.arange(512), (16, 1)), -a),
                               axis=-1)
            for r in range(16):
                assert set(np.nonzero(keep[r])[0]) == set(order[r, :k])


def test_flash_backward_kernel(rng):
    q = jnp.asarray(rng.standard_normal((1, 128, 2, 64)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 77, 2, 64)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 77, 2, 64)), jnp.float32)

    def loss_f(fn):
        return lambda q_, k_, v_: jnp.sum(jnp.square(fn(q_, k_, v_, 0.125)))

    gf = jax.grad(loss_f(fa.flash_attention), argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_f(fa._xla_reference), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        rel = float(jnp.abs(a - b).mean() / (jnp.abs(b).mean() + 1e-12))
        assert rel < 1e-5, rel

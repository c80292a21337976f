"""MoE SwiGLU + expert-parallel stage-2 variant (nn/moe.py,
models/moe_transformer.py): routing correctness against the dense FFN,
capacity semantics, EP-sharded == replicated numerics on the 8-device
mesh, and a training-step smoke (routing losses differentiable)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from paintmind_tpu.nn import moe
from paintmind_tpu.nn.mlp import init_swiglu, swiglu
from paintmind_tpu.models import moe_transformer as mt
from paintmind_tpu.parallel import mesh as pmesh

needs_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                             reason='needs 8 virtual devices')

DIM, MLP = 16, 32


def _mae(a, b):
    return float(np.max(np.abs(np.asarray(a) - np.asarray(b))))


def test_single_expert_equals_dense_swiglu(rng):
    """E=1, k=1, capacity >= T: routing is the identity and the MoE layer
    must reproduce the dense SwiGLU with the same expert weights."""
    p = moe.init_moe_swiglu(jax.random.PRNGKey(0), DIM, MLP, num_experts=1)
    x = jnp.asarray(rng.standard_normal((4, 6, DIM)).astype(np.float32))
    y, aux = moe.moe_swiglu(p, x, num_selected=1, capacity_factor=2.0)
    dense_p = jax.tree_util.tree_map(lambda v: v[0], p['experts'])
    ref = swiglu(dense_p, x)
    assert _mae(y, ref) < 1e-6
    assert float(aux['dropped']) == 0.0
    assert abs(float(aux['lb_loss']) - 1.0) < 1e-6  # E=1: exactly balanced


def test_top1_routing_selects_argmax_expert(rng):
    """With k=1 and ample capacity, each token's output equals the dense
    SwiGLU of its argmax-routed expert scaled by the (renormalized = 1.0)
    gate."""
    e = 4
    p = moe.init_moe_swiglu(jax.random.PRNGKey(1), DIM, MLP, num_experts=e)
    x = jnp.asarray(rng.standard_normal((8, DIM)).astype(np.float32))
    y, aux = moe.moe_swiglu(p, x, num_selected=1, capacity_factor=8.0)
    logits = x @ np.asarray(p['router']['kernel'], np.float32)
    choice = np.argmax(np.asarray(logits), -1)
    for t in range(8):
        ep = jax.tree_util.tree_map(lambda v: v[choice[t]], p['experts'])
        ref = swiglu(ep, x[t:t + 1])[0]
        assert _mae(y[t], ref) < 1e-5, t
    assert float(aux['dropped']) == 0.0


def test_capacity_drops_overflow_tokens(rng):
    """Force every token onto one expert with capacity 1: exactly one
    (token, slot) assignment survives per expert queue."""
    e = 2
    p = moe.init_moe_swiglu(jax.random.PRNGKey(2), DIM, MLP, num_experts=e)
    # router strongly prefers expert 0 for every token
    k = np.zeros((DIM, e), np.float32)
    k[:, 0] = 1.0
    p['router']['kernel'] = jnp.asarray(k)
    x = jnp.abs(jnp.asarray(rng.standard_normal((8, DIM)).astype(np.float32)))
    # capacity_factor chosen so cap = 1 (T*k/E * cf = 8*1/2*0.25 = 1)
    y, aux = moe.moe_swiglu(p, x, num_selected=1, capacity_factor=0.25)
    nonzero_rows = int(np.sum(np.any(np.abs(np.asarray(y)) > 0, axis=-1)))
    assert nonzero_rows == 1  # expert 0's single slot; expert 1 unrouted
    assert float(aux['dropped']) == pytest.approx(7 / 8)


def test_top2_gates_renormalized_and_mix(rng):
    """k=2 output = g1'·E_a(x) + g2'·E_b(x) with g' the renormalized top-2
    softmax gates."""
    e = 4
    p = moe.init_moe_swiglu(jax.random.PRNGKey(3), DIM, MLP, num_experts=e)
    x = jnp.asarray(rng.standard_normal((5, DIM)).astype(np.float32))
    y, _ = moe.moe_swiglu(p, x, num_selected=2, capacity_factor=8.0)
    logits = np.asarray(x @ np.asarray(p['router']['kernel'], np.float32))
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    for t in range(5):
        top2 = np.argsort(probs[t])[::-1][:2]
        g = probs[t][top2] / probs[t][top2].sum()
        ref = sum(g[i] * np.asarray(swiglu(
            jax.tree_util.tree_map(lambda v: v[top2[i]], p['experts']),
            x[t:t + 1])[0]) for i in range(2))
        assert _mae(y[t], ref) < 1e-5, t


@needs_8
def test_ep_sharded_matches_replicated(rng):
    """Experts sharded over the 'model' axis produce the same logits as
    replicated execution (XLA inserts the dispatch collectives)."""
    cfg = mt.MoECondTransformerConfig(in_dim=8, dim=DIM, len_seq=16,
                                      dim_head=8, mlp_dim=MLP, num_head=2,
                                      depth=2, dropout=0.0, context_dim=24,
                                      num_classes=64, num_experts=8,
                                      num_selected=2, capacity_factor=2.0)
    params = mt.init_moe_cond_transformer(jax.random.PRNGKey(4), cfg)
    x = jnp.asarray(rng.standard_normal((4, 16, 8)).astype(np.float32))
    ctx = jnp.asarray(rng.standard_normal((4, 5, 24)).astype(np.float32))

    ref, aux_ref = mt.moe_cond_transformer_apply(params, x, ctx, cfg=cfg,
                                                 backend='xla')

    mesh = pmesh.make_mesh(jax.devices()[:8], model_parallel=4)
    spec = pmesh.moe_cond_transformer_param_spec(params)
    sharded = pmesh.shard_params(params, mesh, spec)
    out, aux = jax.jit(lambda p, a, c: mt.moe_cond_transformer_apply(
        p, a, c, cfg=cfg, backend='xla'))(
        sharded, jax.device_put(x, NamedSharding(mesh, P('data'))),
        jax.device_put(ctx, NamedSharding(mesh, P('data'))))
    assert _mae(out, ref) < 1e-4
    assert abs(float(aux['lb_loss']) - float(aux_ref['lb_loss'])) < 1e-5


def test_moe_train_step_smoke(rng):
    """Masked-CE + routing losses are finite and differentiable; a few
    steps reduce the loss."""
    import optax
    cfg = mt.MoECondTransformerConfig(in_dim=8, dim=DIM, len_seq=16,
                                      dim_head=8, mlp_dim=MLP, num_head=2,
                                      depth=2, dropout=0.0, context_dim=24,
                                      num_classes=32, num_experts=4,
                                      num_selected=2, capacity_factor=2.0)
    params = mt.init_moe_cond_transformer(jax.random.PRNGKey(5), cfg)
    tokens = jnp.asarray(rng.standard_normal((4, 16, 8)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 32, (4, 16)), jnp.int32)
    mask = jnp.asarray(rng.integers(0, 2, (4, 16)), jnp.bool_)
    ctx = jnp.asarray(rng.standard_normal((4, 5, 24)).astype(np.float32))

    tx = optax.adam(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        (loss, metrics), grads = jax.value_and_grad(
            lambda p: mt.moe_masked_loss(p, tokens, labels, mask, ctx,
                                         cfg=cfg), has_aux=True)(params)
        updates, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), opt, loss, metrics

    params, opt, l0, m0 = step(params, opt)
    assert np.isfinite(float(l0))
    assert np.isfinite(float(m0['lb_loss']))
    for _ in range(8):
        params, opt, loss, _ = step(params, opt)
    assert float(loss) < float(l0)


def test_moe_version_registered():
    import paintmind_tpu.config as pmc
    cfg = pmc.ver2cfg['paintmindv1-moe']
    assert cfg['num_experts'] == 8 and cfg['dim'] == 1024

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


# ---------------------------------------------------------------------------
# MoE as a first-class Pipeline version: init / loss / train step / sampler /
# factory route all dispatch on cfg.num_experts (models/pipeline.py).
# ---------------------------------------------------------------------------

import paintmind_tpu.config as pmc
from paintmind_tpu.models import pipeline as pl

TINY_VQ = {
    'n_embed': 64, 'embed_dim': 8, 'beta': 0.25,
    'enc': {'image_size': 32, 'patch_size': 8, 'dim': 32, 'depth': 1,
            'num_head': 2, 'mlp_dim': 64, 'in_channels': 3, 'dim_head': 16,
            'dropout': 0.0},
    'dec': {'image_size': 32, 'patch_size': 8, 'dim': 32, 'depth': 1,
            'num_head': 2, 'mlp_dim': 64, 'out_channels': 3, 'dim_head': 16,
            'dropout': 0.0},
}
pmc.register_version('test-vqgan-moe', TINY_VQ)
pmc.register_version('test-pipe-moe', {
    'stage1': 'test-vqgan-moe', 't5': 't5-l', 'dim': 32, 'dim_head': 16,
    'mlp_dim': 64, 'num_head': 2, 'depth': 2, 'dropout': 0.0,
    'num_experts': 4, 'num_selected': 2, 'capacity_factor': 2.0,
})

MOE_PIPE = pl.PipelineConfig.from_dict(pmc.ver2cfg['test-pipe-moe'])


@pytest.fixture(scope='module')
def moe_pipe_params():
    return pl.init_pipeline(jax.random.PRNGKey(11), MOE_PIPE)


def test_moe_pipeline_config_dispatch():
    assert isinstance(MOE_PIPE.tcfg, mt.MoECondTransformerConfig)
    assert MOE_PIPE.tcfg.num_experts == 4
    # dense config stays dense
    dense = pl.PipelineConfig.from_dict(
        {**pmc.ver2cfg['test-pipe-moe'], 'num_experts': 0})
    assert not isinstance(dense.tcfg, mt.MoECondTransformerConfig)


def test_moe_pipeline_loss_and_grads(moe_pipe_params, rng):
    img = jnp.asarray(rng.standard_normal(
        (2, 32, 32, 3)).astype(np.float32)) * 0.5
    ctx = jnp.asarray(rng.standard_normal((2, 5, 1024)).astype(np.float32))
    loss, grads = jax.value_and_grad(pl.pipeline_loss)(
        moe_pipe_params, img, ctx, 0.6, jax.random.PRNGKey(0), cfg=MOE_PIPE)
    assert np.isfinite(float(loss))
    # router gradients flow (the routing losses reach the router kernel)
    rk = grads['transformer']['layers']['ffnet']['router']['kernel']
    assert float(jnp.max(jnp.abs(rk))) > 0
    # frozen vqgan: zero grads
    vg = jax.tree_util.tree_leaves(grads['vqgan'])
    assert all(float(jnp.max(jnp.abs(g))) == 0 for g in vg)


def test_moe_pipeline_train_step(moe_pipe_params):
    import optax
    from paintmind_tpu.train import steps
    tx = optax.adam(1e-3)
    state = steps.init_pipeline_train_state(jax.random.PRNGKey(1),
                                            moe_pipe_params, tx)
    step = jax.jit(steps.make_pipeline_train_step(MOE_PIPE, tx, grad_accum=2))
    imgs = jnp.zeros((4, 32, 32, 3), jnp.float32)
    ctx = jnp.ones((4, 5, 1024), jnp.float32) * 0.1
    state, metrics = step(state, imgs, ctx, 0.7)
    assert np.isfinite(float(metrics['loss']))
    assert int(state['step']) == 1


def test_moe_pipeline_generate_and_cfg(moe_pipe_params):
    b, L = 2, MOE_PIPE.num_tokens
    init_ids = jnp.full((b, L), MOE_PIPE.mask_token_id, jnp.int32)
    ctx = jnp.ones((b, 5, 1024), jnp.float32) * 0.1
    ids, traj = pl.generate_ids(moe_pipe_params, jax.random.PRNGKey(2),
                                init_ids, None, cfg=MOE_PIPE, timesteps=3,
                                topk=4, sampler='exact')
    assert ids.shape == (b, L) and traj.shape == (3, b, L)
    # the merged trajectory's last step is the decodable sample: no masks
    # (final committed ids keep the schedule's >=1 re-masked slot by design)
    assert int(jnp.sum(traj[-1] == MOE_PIPE.mask_token_id)) == 0
    # guided path (two-pass logits mixing) and per-sample scales
    _, traj_g = pl.generate_ids(moe_pipe_params, jax.random.PRNGKey(2),
                                init_ids, ctx, cfg=MOE_PIPE, timesteps=3,
                                topk=4, sampler='exact',
                                guidance_scale=jnp.asarray([1.0, 3.0]))
    assert int(jnp.sum(traj_g[-1] == MOE_PIPE.mask_token_id)) == 0
    # scale=0 guided == unconditional-with-context-ignored identity:
    # uncond + 0·(cond − uncond) must equal the uncond pass
    ids_0, _ = pl.generate_ids(moe_pipe_params, jax.random.PRNGKey(2),
                               init_ids, ctx, cfg=MOE_PIPE, timesteps=3,
                               topk=4, sampler='exact', guidance_scale=0.0)
    ids_u, _ = pl.generate_ids(moe_pipe_params, jax.random.PRNGKey(2),
                               init_ids, None, cfg=MOE_PIPE, timesteps=3,
                               topk=4, sampler='exact')
    assert np.array_equal(np.asarray(ids_0), np.asarray(ids_u))


def test_moe_pipeline_factory_and_spec():
    from paintmind_tpu.factory import create_model
    model = create_model('pipeline', 'test-pipe-moe', pretrained=False,
                         text_encoder=None, seed=3)
    tp = model.params['transformer']
    assert 'router' in tp['layers']['ffnet']
    spec = pmesh.pipeline_param_spec(model.params)
    # EP spec: expert leaves shard axis 1 over 'model'
    espec = spec['transformer']['layers']['ffnet']['experts']
    leaf = jax.tree_util.tree_leaves(espec,
                                     is_leaf=lambda x: isinstance(x, P))[0]
    assert leaf[1] == pmesh.MODEL_AXIS
    with pytest.raises(NotImplementedError):
        model.quantize()


@needs_8
def test_moe_pipeline_ep_sampler_matches_replicated(moe_pipe_params, rng):
    """The EP/TP-sharded pipeline produces the replicated sampler-step
    logits (1e-4 — float nondeterminism across shardings), and the full
    sharded generate_ids runs to completion on the mesh."""
    b, L = 4, MOE_PIPE.num_tokens
    tokens = jnp.asarray(rng.standard_normal(
        (b, L, MOE_PIPE.vqc.embed_dim)).astype(np.float32))
    logits_ref = np.asarray(pl._transformer_logits(
        moe_pipe_params, tokens, None, None, cfg=MOE_PIPE, backend='xla'))
    mesh = pmesh.make_mesh(jax.devices()[:8], model_parallel=4)
    sharded = pmesh.shard_params(moe_pipe_params, mesh,
                                 pmesh.pipeline_param_spec(moe_pipe_params))
    logits_sh = np.asarray(jax.jit(
        lambda p, t: pl._transformer_logits(p, t, None, None, cfg=MOE_PIPE,
                                            backend='xla'))(
        sharded, jax.device_put(tokens, NamedSharding(mesh, P('data')))))
    assert _mae(logits_sh, logits_ref) < 1e-4
    init_ids = jnp.full((b, L), MOE_PIPE.mask_token_id, jnp.int32)
    _, traj_sh = pl.generate_ids(
        sharded, jax.random.PRNGKey(5),
        jax.device_put(init_ids, NamedSharding(mesh, P('data'))), None,
        cfg=MOE_PIPE, timesteps=2, topk=4, sampler='exact')
    assert int(jnp.sum(traj_sh[-1] == MOE_PIPE.mask_token_id)) == 0


def test_moe_pipeline_checkpoint_roundtrip(tmp_path, moe_pipe_params):
    """save_pretrained/from_pretrained round-trip the MoE tree bit-exactly
    (template-driven loaders must handle the 4-D (depth, E, in, out)
    expert leaves)."""
    from paintmind_tpu.models.pipeline import Pipeline
    pipe = Pipeline(config=MOE_PIPE, stage1_pretrained=False,
                    text_encoder=None, params=moe_pipe_params)
    path = str(tmp_path / 'moe_pipe.npz')
    pipe.save_pretrained(path)
    other = Pipeline(config=MOE_PIPE, stage1_pretrained=False,
                     text_encoder=None, seed=99)
    before = np.asarray(
        other.params['transformer']['layers']['ffnet']['experts']['w12']
        if isinstance(other.params['transformer']['layers']['ffnet']
                      ['experts'], dict)
        else jax.tree_util.tree_leaves(
            other.params['transformer']['layers']['ffnet']['experts'])[0])
    other.from_pretrained(path)
    ref_leaves = jax.tree_util.tree_leaves(moe_pipe_params)
    got_leaves = jax.tree_util.tree_leaves(other.params)
    assert len(ref_leaves) == len(got_leaves)
    for a, b in zip(ref_leaves, got_leaves):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    # sanity: the load actually changed the randomly-seeded expert weights
    after = jax.tree_util.tree_leaves(
        other.params['transformer']['layers']['ffnet']['experts'])[0]
    assert not np.array_equal(np.asarray(before).ravel()[:8],
                              np.asarray(after).ravel()[:8])


@pytest.mark.parametrize('capacity_factor', [0.5, 1.25, 4.0])
def test_gather_dispatch_matches_dense(rng, capacity_factor):
    """The scatter/gather dispatch path (VERDICT r3 #3) is numerically
    identical to the dense one-hot einsum form — same capacity semantics,
    same drops, same aux — in forward AND backward."""
    p = moe.init_moe_swiglu(jax.random.PRNGKey(3), DIM, MLP, num_experts=4)
    x = jnp.asarray(rng.standard_normal((3, 20, DIM)).astype(np.float32))

    y_d, aux_d = moe.moe_swiglu(p, x, num_selected=2,
                                capacity_factor=capacity_factor,
                                dispatch='dense')
    y_g, aux_g = moe.moe_swiglu(p, x, num_selected=2,
                                capacity_factor=capacity_factor,
                                dispatch='gather')
    assert _mae(y_d, y_g) < 1e-6
    for k in aux_d:
        assert _mae(aux_d[k], aux_g[k]) < 1e-6, k

    def loss(p_, mode):
        y, aux = moe.moe_swiglu(p_, x, num_selected=2,
                                capacity_factor=capacity_factor,
                                dispatch=mode)
        return jnp.sum(y ** 2) + aux['lb_loss']

    g_d = jax.grad(lambda p_: loss(p_, 'dense'))(p)
    g_g = jax.grad(lambda p_: loss(p_, 'gather'))(p)
    errs = jax.tree_util.tree_map(_mae, g_d, g_g)
    assert max(jax.tree_util.tree_leaves(errs)) < 1e-5


def test_gather_dispatch_bf16(rng):
    """bf16 activations (the production sampler dtype) route identically
    through both dispatch forms."""
    p = moe.init_moe_swiglu(jax.random.PRNGKey(4), DIM, MLP, num_experts=4)
    x = jnp.asarray(rng.standard_normal((2, 16, DIM))).astype(jnp.bfloat16)
    y_d, _ = moe.moe_swiglu(p, x, dispatch='dense')
    y_g, _ = moe.moe_swiglu(p, x, dispatch='gather')
    assert y_d.dtype == y_g.dtype == jnp.bfloat16
    assert _mae(y_d.astype(np.float32), y_g.astype(np.float32)) < 1e-2

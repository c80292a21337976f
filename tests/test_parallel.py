"""SPMD/sharding correctness on the virtual 8-device CPU mesh: tensor-
parallel shardings produce the same numerics as replicated execution, and
the data-parallel train step matches single-device training."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

import paintmind_tpu.config as pmc
from paintmind_tpu.models import pipeline as pl
from paintmind_tpu.models import transformer as st2
from paintmind_tpu.models import vqmodel as vm
from paintmind_tpu.parallel import mesh as pmesh


needs_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                             reason='needs 8 virtual devices')

SMALL_VQ = {
    'n_embed': 64, 'embed_dim': 8, 'beta': 0.25,
    'enc': {'image_size': 32, 'patch_size': 8, 'dim': 32, 'depth': 2,
            'num_head': 2, 'mlp_dim': 64, 'in_channels': 3, 'dim_head': 16,
            'dropout': 0.0},
    'dec': {'image_size': 32, 'patch_size': 8, 'dim': 32, 'depth': 2,
            'num_head': 2, 'mlp_dim': 64, 'out_channels': 3, 'dim_head': 16,
            'dropout': 0.0},
}
pmc.register_version('test-vqgan-par', SMALL_VQ)

PIPE = pl.PipelineConfig(stage1='test-vqgan-par', t5='t5-l', dim=32,
                         dim_head=16, mlp_dim=64, num_head=2, depth=2,
                         dropout=0.0,
                         vqc=vm.VQModelConfig.from_dict(SMALL_VQ), t5_dim=48)


def _mae(a, b):
    return float(np.mean(np.abs(np.asarray(a) - np.asarray(b))))


@needs_8
def test_tensor_parallel_logits_match_replicated(rng):
    mesh = pmesh.make_mesh(jax.devices()[:8], model_parallel=2)
    params = pl.init_pipeline(jax.random.PRNGKey(0), PIPE)
    x = jnp.asarray(rng.standard_normal((4, 16, 8)).astype(np.float32))
    ctx = jnp.asarray(rng.standard_normal((4, 5, 48)).astype(np.float32))

    ref = st2.cond_transformer_apply(params['transformer'], x, ctx,
                                     cfg=PIPE.tcfg, backend='xla')

    spec = pmesh.cond_transformer_param_spec(params['transformer'])
    sharded = pmesh.shard_params(params['transformer'], mesh, spec)
    xs = jax.device_put(x, NamedSharding(mesh, P('data')))
    out = jax.jit(lambda p, a, c: st2.cond_transformer_apply(
        p, a, c, cfg=PIPE.tcfg, backend='xla'))(sharded, xs, ctx)
    assert _mae(out, ref) < 1e-5


@needs_8
def test_vqgan_forward_tp_matches_replicated(rng):
    mesh = pmesh.make_mesh(jax.devices()[:8], model_parallel=2)
    cfg = PIPE.vqc
    params = vm.init_vqmodel(jax.random.PRNGKey(1), cfg)
    img = jnp.asarray(rng.standard_normal((4, 32, 32, 3)).astype(np.float32))
    ref, ref_loss = vm.forward(params, img, cfg, backend='xla',
                               vq_backend='xla')
    sharded = pmesh.shard_params(params, mesh, pmesh.vqgan_param_spec(params))
    img_s = jax.device_put(img, NamedSharding(mesh, P('data')))
    out, loss = jax.jit(lambda p, i: vm.forward(
        p, i, cfg, backend='xla', vq_backend='xla'))(sharded, img_s)
    assert _mae(out, ref) < 1e-5
    assert abs(float(loss) - float(ref_loss)) < 1e-5


@needs_8
def test_dp_train_step_matches_single_device(rng):
    """Gradient all-reduce through sharded jit == single-device step."""
    from paintmind_tpu import optim
    from paintmind_tpu.train import steps as ts

    params = pl.init_pipeline(jax.random.PRNGKey(2), PIPE)
    tx = ts.masked_tx(optim.adamw(1e-3, max_grad_norm=1.0), params)
    imgs = jnp.asarray(rng.standard_normal((8, 32, 32, 3)).astype(np.float32))
    ctx = jnp.asarray(rng.standard_normal((8, 5, 48)).astype(np.float32))
    ratio = jnp.asarray(0.7, jnp.float32)
    step = ts.make_pipeline_train_step(PIPE, tx, grad_accum=1)

    # single-device
    s1 = ts.init_pipeline_train_state(jax.random.PRNGKey(3), params, tx)
    s1, m1 = jax.jit(step)(s1, imgs, ctx, ratio)

    # 8-way data parallel
    mesh = pmesh.make_mesh(jax.devices()[:8], model_parallel=1)
    pshard = pmesh.shard_params(params, mesh)
    s2 = ts.init_pipeline_train_state(jax.random.PRNGKey(3), pshard, tx)
    s2 = jax.device_put(s2, pmesh.replicate_sharding(mesh))
    imgs_s = jax.device_put(imgs, NamedSharding(mesh, P('data')))
    ctx_s = jax.device_put(ctx, NamedSharding(mesh, P('data')))
    s2, m2 = jax.jit(step)(s2, imgs_s, ctx_s, ratio)

    assert abs(float(m1['loss']) - float(m2['loss'])) < 1e-5
    for a, b in zip(jax.tree_util.tree_leaves(s1['params']['transformer']),
                    jax.tree_util.tree_leaves(s2['params']['transformer'])):
        assert _mae(a, b) < 1e-5


@needs_8
def test_shard_batch_layout():
    mesh = pmesh.make_mesh(jax.devices()[:8], model_parallel=2)
    x = np.zeros((8, 4, 4, 3), np.float32)
    sx = pmesh.shard_batch(x, mesh)
    assert sx.sharding.spec[0] == 'data'
    assert all(s is None for s in sx.sharding.spec[1:])

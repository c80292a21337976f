"""Pipeline parallelism (parallel/pipeline_parallel.py) on the virtual
8-device CPU mesh: GPipe-scheduled stacks match plain scanned execution
exactly, compose with data parallelism, and are differentiable (the
backward pipeline emerges from grad-through-ppermute)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from paintmind_tpu.models import transformer as st2
from paintmind_tpu.nn.transformer import init_stack, stack_apply
from paintmind_tpu.parallel import mesh as pmesh
from paintmind_tpu.parallel import pipeline_parallel as pp

needs_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                             reason='needs 8 virtual devices')

DIM, HEADS, DIM_HEAD, MLP = 32, 2, 16, 64


def _mae(a, b):
    return float(np.max(np.abs(np.asarray(a) - np.asarray(b))))


def _stack(depth, cross, seed=0):
    return init_stack(jax.random.PRNGKey(seed), depth, DIM, dim_head=DIM_HEAD,
                      mlp_dim=MLP, num_head=HEADS, cross=cross,
                      context_dim=DIM if cross else None)


@needs_8
@pytest.mark.parametrize('model_parallel,microbatches', [(4, 2), (4, 4),
                                                         (2, 1), (8, 2)])
def test_pp_stack_matches_scanned(rng, model_parallel, microbatches):
    mesh = pmesh.make_mesh(jax.devices()[:8], model_parallel=model_parallel)
    depth = 2 * model_parallel
    p = _stack(depth, cross=True)
    dp = 8 // model_parallel
    b = dp * microbatches * 2
    x = jnp.asarray(rng.standard_normal((b, 16, DIM)).astype(np.float32))
    ctx = jnp.asarray(rng.standard_normal((b, 5, DIM)).astype(np.float32))

    ref = stack_apply(p, x, ctx, heads=HEADS, backend='xla')
    out = pp.pp_stack_apply(p, x, ctx, mesh=mesh, microbatches=microbatches,
                            heads=HEADS, backend='xla')
    assert out.shape == ref.shape
    assert _mae(out, ref) < 1e-5


@needs_8
def test_pp_stack_no_context(rng):
    mesh = pmesh.make_mesh(jax.devices()[:8], model_parallel=4)
    p = _stack(4, cross=False)
    x = jnp.asarray(rng.standard_normal((8, 16, DIM)).astype(np.float32))
    ref = stack_apply(p, x, heads=HEADS, backend='xla')
    out = pp.pp_stack_apply(p, x, mesh=mesh, microbatches=2, heads=HEADS,
                            backend='xla')
    assert _mae(out, ref) < 1e-5


@needs_8
def test_pp_under_jit_with_sharded_params(rng):
    """The production form: params placed by pp_stack_spec, whole thing
    jitted; stage slices stay resident on their owning devices."""
    mesh = pmesh.make_mesh(jax.devices()[:8], model_parallel=4)
    p = _stack(8, cross=True)
    spec = pp.pp_stack_spec(p)
    p_sh = jax.tree_util.tree_map(
        lambda v, s: jax.device_put(v, NamedSharding(mesh, s)), p, spec)
    x = jnp.asarray(rng.standard_normal((8, 16, DIM)).astype(np.float32))
    ctx = jnp.asarray(rng.standard_normal((8, 5, DIM)).astype(np.float32))

    ref = stack_apply(p, x, ctx, heads=HEADS, backend='xla')
    fn = jax.jit(lambda pp_, xx, cc: pp.pp_stack_apply(
        pp_, xx, cc, mesh=mesh, microbatches=4, heads=HEADS, backend='xla'))
    out = fn(p_sh, jax.device_put(x, NamedSharding(mesh, P('data'))),
             jax.device_put(ctx, NamedSharding(mesh, P('data'))))
    assert _mae(out, ref) < 1e-5


@needs_8
def test_pp_cond_transformer_matches_reference_apply(rng):
    mesh = pmesh.make_mesh(jax.devices()[:8], model_parallel=4)
    cfg = st2.CondTransformerConfig(in_dim=8, dim=DIM, len_seq=16,
                                    dim_head=DIM_HEAD, mlp_dim=MLP,
                                    num_head=HEADS, depth=4, dropout=0.0,
                                    context_dim=24, num_classes=64)
    params = st2.init_cond_transformer(jax.random.PRNGKey(1), cfg)
    x = jnp.asarray(rng.standard_normal((4, 16, 8)).astype(np.float32))
    ctx = jnp.asarray(rng.standard_normal((4, 5, 24)).astype(np.float32))

    ref = st2.cond_transformer_apply(params, x, ctx, cfg=cfg, backend='xla')
    p_sh = pp.shard_for_pp(params, mesh)
    out = pp.pp_cond_transformer_apply(p_sh, x, ctx, cfg=cfg, mesh=mesh,
                                       microbatches=2, backend='xla')
    assert _mae(out, ref) < 1e-4


@needs_8
def test_pp_backward_matches_scanned_grads(rng):
    """grad through the pipeline (ppermute transpose = reverse schedule)
    equals grad through the plain scanned stack."""
    mesh = pmesh.make_mesh(jax.devices()[:8], model_parallel=4)
    p = _stack(4, cross=True)
    x = jnp.asarray(rng.standard_normal((4, 16, DIM)).astype(np.float32))
    ctx = jnp.asarray(rng.standard_normal((4, 5, DIM)).astype(np.float32))
    tgt = jnp.asarray(rng.standard_normal((4, 16, DIM)).astype(np.float32))

    def loss_ref(p_):
        out = stack_apply(p_, x, ctx, heads=HEADS, backend='xla')
        return jnp.mean((out - tgt) ** 2)

    def loss_pp(p_):
        out = pp.pp_stack_apply(p_, x, ctx, mesh=mesh, microbatches=2,
                                heads=HEADS, backend='xla')
        return jnp.mean((out - tgt) ** 2)

    g_ref = jax.grad(loss_ref)(p)
    g_pp = jax.grad(loss_pp)(p)
    errs = jax.tree_util.tree_map(_mae, g_ref, g_pp)
    worst = max(jax.tree_util.tree_leaves(errs))
    assert worst < 1e-5, worst


@needs_8
def test_pp_validates_shapes():
    mesh = pmesh.make_mesh(jax.devices()[:8], model_parallel=4)
    p = _stack(6, cross=False)  # 6 layers over 4 stages: invalid
    x = jnp.zeros((4, 16, DIM))
    with pytest.raises(ValueError, match='depth'):
        pp.pp_stack_apply(p, x, mesh=mesh, microbatches=2, heads=HEADS)
    p = _stack(4, cross=False)
    with pytest.raises(ValueError, match='batch'):
        pp.pp_stack_apply(p, jnp.zeros((3, 16, DIM)), mesh=mesh,
                          microbatches=2, heads=HEADS)


# ---------------------------------------------------------------------------
# First-class harness integration (VERDICT r3 #1): PP through the public
# PaintMindTrainer and Pipeline.generate APIs.
# ---------------------------------------------------------------------------

def _pp_pipeline_cfg(depth=4, dropout=0.0):
    from paintmind_tpu.models.pipeline import PipelineConfig
    from paintmind_tpu.models import vqmodel as vm
    from test_training import SMALL_VQ
    return PipelineConfig(stage1='test-vqgan-tr', t5='t5-l', dim=DIM,
                          dim_head=DIM_HEAD, mlp_dim=MLP, num_head=HEADS,
                          depth=depth, dropout=dropout,
                          vqc=vm.VQModelConfig.from_dict(SMALL_VQ), t5_dim=48)


@needs_8
def test_pp_trainer_matches_dp_trainer(tmp_path):
    """PaintMindTrainer(pp_microbatches=2) on a (data=2, model=4) mesh
    produces the same losses and final params as the plain dp-only trainer
    — the GPipe schedule is an execution strategy, not a different
    optimization."""
    from paintmind_tpu.models.pipeline import Pipeline
    from paintmind_tpu.utils.trainer import PaintMindTrainer
    from test_training import _SynthDataset

    cfg = _pp_pipeline_cfg(depth=4, dropout=0.0)
    ds = _SynthDataset(40, 32, with_caption=False)

    def run(pp, folder):
        np.random.seed(123)          # masked_p_generator draws
        pipe = Pipeline(cfg, stage1_pretrained=False, text_encoder=None,
                        seed=3)
        mesh = (pmesh.make_mesh(jax.devices()[:8], model_parallel=4)
                if pp else None)
        tr = PaintMindTrainer(
            pipe, ds, num_epoch=1, valid_size=4, optim_name='lion', lr=1e-3,
            warmup_steps=1, decay_steps=10, batch_size=8, num_workers=0,
            grad_accum_steps=1, mixed_precision='no', save_every=1000,
            sample_every=1000, result_folder=folder,
            log_dir=str(tmp_path / 'log'), seed=5, cfg_p=0.0, mesh=mesh,
            pp_microbatches=2 if pp else None)
        tr.train()
        return tr, pipe

    tr_ref, pipe_ref = run(False, str(tmp_path / 'dense'))
    tr_pp, pipe_pp = run(True, str(tmp_path / 'pp'))
    assert tr_pp.steps == tr_ref.steps > 0
    assert abs(tr_pp.log['loss'] - tr_ref.log['loss']) < 1e-4
    errs = [
        _mae(a, b) for a, b in zip(
            jax.tree_util.tree_leaves(jax.tree_util.tree_map(
                np.asarray, pipe_ref.params['transformer'])),
            jax.tree_util.tree_leaves(jax.tree_util.tree_map(
                np.asarray, pipe_pp.params['transformer'])))]
    assert max(errs) < 1e-5, max(errs)

    # checkpoint save/restore under the PP placement round-trips bit-exact
    path = tr_pp.save()
    np.random.seed(123)
    pipe3 = Pipeline(cfg, stage1_pretrained=False, text_encoder=None, seed=3)
    mesh = pmesh.make_mesh(jax.devices()[:8], model_parallel=4)
    tr3 = type(tr_pp)(
        pipe3, ds, num_epoch=1, valid_size=4, optim_name='lion', lr=1e-3,
        warmup_steps=1, decay_steps=10, batch_size=8, num_workers=0,
        grad_accum_steps=1, mixed_precision='no', save_every=1000,
        sample_every=1000, result_folder=str(tmp_path / 'pp'),
        log_dir=str(tmp_path / 'log'), seed=5, cfg_p=0.0, mesh=mesh,
        pp_microbatches=2)
    tr3.resume(path)
    for a, b in zip(jax.tree_util.tree_leaves(tr_pp.state['params']),
                    jax.tree_util.tree_leaves(tr3.state['params'])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@needs_8
def test_pp_generate_matches_dense():
    """Pipeline.generate through enable_pipeline_parallel produces the same
    samples as the dense decode (deterministic: temperature 0, topk 1)."""
    from paintmind_tpu.models.pipeline import Pipeline

    cfg = _pp_pipeline_cfg(depth=4, dropout=0.0)
    pipe = Pipeline(cfg, stage1_pretrained=False, text_encoder=None, seed=9)
    key = jax.random.PRNGKey(42)
    ctx = jnp.asarray(np.random.default_rng(1).standard_normal(
        (4, 5, 48)).astype(np.float32))

    ref = pipe.generate(text=ctx, timesteps=2, temperature=0.0, topk=1,
                        decode_steps='final', key=key)[-1]

    mesh = pmesh.make_mesh(jax.devices()[:8], model_parallel=4)
    pipe.enable_pipeline_parallel(mesh, microbatches=2)
    assert pipe._pp is not None
    out = pipe.generate(text=ctx, timesteps=2, temperature=0.0, topk=1,
                        decode_steps='final', key=key)[-1]
    assert _mae(out, ref) < 1e-4

    # guided decode through the PP path (hidden-mix CFG)
    guided = pipe.generate(text=ctx, timesteps=2, temperature=0.0, topk=1,
                           guidance_scale=2.0, decode_steps='final', key=key)
    assert np.asarray(guided[-1]).shape == np.asarray(ref).shape
    pipe.disable_pipeline_parallel()
    back = pipe.generate(text=ctx, timesteps=2, temperature=0.0, topk=1,
                         decode_steps='final', key=key)[-1]
    assert _mae(back, ref) < 1e-5


@needs_8
def test_pp_guards():
    """The dense pp apply rejects MoE params (the MoE variant has its own
    (logits, aux) apply); bad depths are rejected up front."""
    from paintmind_tpu.models.pipeline import Pipeline

    moe_cfg = _moe_pipeline_cfg(depth=2, num_experts=2)
    moe_pipe = Pipeline(moe_cfg, stage1_pretrained=False, text_encoder=None)
    mesh = pmesh.make_mesh(jax.devices()[:8], model_parallel=4)
    with pytest.raises(TypeError, match='MoE'):
        pp.pp_cond_transformer_apply(
            moe_pipe.params['transformer'], jnp.zeros((4, 16, 8)),
            cfg=moe_cfg.tcfg, mesh=mesh, microbatches=2)
    with pytest.raises(ValueError, match='depth'):
        moe_pipe.enable_pipeline_parallel(mesh, 2)  # 2 layers, 4 stages

    dense = Pipeline(_pp_pipeline_cfg(depth=3), stage1_pretrained=False,
                     text_encoder=None)
    with pytest.raises(ValueError, match='depth'):
        dense.enable_pipeline_parallel(mesh, 2)


# ---------------------------------------------------------------------------
# PP × MoE composition (VERDICT r4 #6): the MoE stack pipelines with the
# same depth-axis stage split, experts local to their stage.  With a
# no-drop capacity factor (cf = E/k ⇒ per-group capacity = group size) the
# routed output is exactly grouping-invariant, so the pipelined result must
# match the unpipelined stack.
# ---------------------------------------------------------------------------

def _moe_pipeline_cfg(depth=4, num_experts=4, dropout=0.0, lb_weight=0.0,
                      capacity_factor=None):
    from paintmind_tpu.models.pipeline import PipelineConfig
    from paintmind_tpu.models import vqmodel as vm
    from test_training import SMALL_VQ
    cf = (num_experts / 2 if capacity_factor is None
          else capacity_factor)  # top-2 no-drop capacity
    return PipelineConfig(stage1='test-vqgan-tr', t5='t5-l', dim=DIM,
                          dim_head=DIM_HEAD, mlp_dim=MLP, num_head=HEADS,
                          depth=depth, dropout=dropout,
                          vqc=vm.VQModelConfig.from_dict(SMALL_VQ),
                          t5_dim=48, num_experts=num_experts,
                          capacity_factor=cf, lb_weight=lb_weight)


def _moe_stack(depth, experts, seed=0):
    from paintmind_tpu.nn.moe import init_moe_stack
    return init_moe_stack(jax.random.PRNGKey(seed), depth, DIM,
                          dim_head=DIM_HEAD, mlp_dim=MLP, num_head=HEADS,
                          num_experts=experts, cross=True, context_dim=DIM)


@needs_8
@pytest.mark.parametrize('model_parallel,microbatches', [(4, 2), (2, 4)])
def test_pp_moe_stack_matches_unpipelined(rng, model_parallel, microbatches):
    from paintmind_tpu.nn.moe import moe_stack_apply

    mesh = pmesh.make_mesh(jax.devices()[:8], model_parallel=model_parallel)
    depth, e = 2 * model_parallel, 4
    p = _moe_stack(depth, e)
    dp = 8 // model_parallel
    b = dp * microbatches
    x = jnp.asarray(rng.standard_normal((b, 16, DIM)).astype(np.float32))
    ctx = jnp.asarray(rng.standard_normal((b, 5, DIM)).astype(np.float32))

    cf = e / 2  # top-2, no drops ⇒ grouping-invariant output
    ref, ref_aux = moe_stack_apply(p, x, ctx, heads=HEADS,
                                   capacity_factor=cf, backend='xla',
                                   dispatch='gather')
    out, aux = pp.pp_moe_stack_apply(p, x, ctx, mesh=mesh,
                                     microbatches=microbatches, heads=HEADS,
                                     capacity_factor=cf, backend='xla')
    assert out.shape == ref.shape
    assert _mae(out, ref) < 1e-5
    # grouping-invariant aux: no drops; per-token z-loss and top-1 load
    # fractions average identically over equal-size microbatch groups
    assert float(aux['dropped']) == 0.0 == float(ref_aux['dropped'])
    assert abs(float(aux['router_z']) - float(ref_aux['router_z'])) < 1e-5
    assert _mae(aux['expert_load'], ref_aux['expert_load']) < 1e-6
    assert np.isfinite(float(aux['lb_loss']))


@needs_8
def test_pp_moe_backward_matches_unpipelined(rng):
    """grad through the pipelined MoE stack (routing, capacity scatter,
    ppermute) equals grad through the plain routed stack."""
    from paintmind_tpu.nn.moe import moe_stack_apply

    mesh = pmesh.make_mesh(jax.devices()[:8], model_parallel=4)
    p = _moe_stack(4, 4)
    x = jnp.asarray(rng.standard_normal((4, 16, DIM)).astype(np.float32))
    ctx = jnp.asarray(rng.standard_normal((4, 5, DIM)).astype(np.float32))
    tgt = jnp.asarray(rng.standard_normal((4, 16, DIM)).astype(np.float32))

    def loss_ref(p_):
        out, aux = moe_stack_apply(p_, x, ctx, heads=HEADS,
                                   capacity_factor=2.0, backend='xla',
                                   dispatch='gather')
        return jnp.mean((out - tgt) ** 2) + 1e-3 * aux['router_z']

    def loss_pp(p_):
        out, aux = pp.pp_moe_stack_apply(p_, x, ctx, mesh=mesh,
                                         microbatches=2, heads=HEADS,
                                         capacity_factor=2.0, backend='xla')
        return jnp.mean((out - tgt) ** 2) + 1e-3 * aux['router_z']

    g_ref = jax.grad(loss_ref)(p)
    g_pp = jax.grad(loss_pp)(p)
    errs = jax.tree_util.tree_map(_mae, g_ref, g_pp)
    worst = max(jax.tree_util.tree_leaves(errs))
    assert worst < 1e-5, worst


@needs_8
def test_pp_moe_trainer_matches_plain_moe_trainer(tmp_path):
    """PaintMindTrainer(pp_microbatches=2) with the MoE variant on a
    (data=2, model=4) mesh matches the plain MoE trainer's losses and final
    params (lb_weight=0: the load-balance statistic is the one aux that is
    not grouping-invariant; the z-loss stays on and must match)."""
    from paintmind_tpu.models.pipeline import Pipeline
    from paintmind_tpu.utils.trainer import PaintMindTrainer
    from test_training import _SynthDataset

    cfg = _moe_pipeline_cfg(depth=4, num_experts=4, lb_weight=0.0)
    ds = _SynthDataset(40, 32, with_caption=False)

    def run(pp_on, folder):
        np.random.seed(123)
        pipe = Pipeline(cfg, stage1_pretrained=False, text_encoder=None,
                        seed=3)
        mesh = (pmesh.make_mesh(jax.devices()[:8], model_parallel=4)
                if pp_on else None)
        tr = PaintMindTrainer(
            pipe, ds, num_epoch=1, valid_size=4, optim_name='lion', lr=1e-3,
            warmup_steps=1, decay_steps=10, batch_size=8, num_workers=0,
            grad_accum_steps=1, mixed_precision='no', save_every=1000,
            sample_every=1000, result_folder=folder,
            log_dir=str(tmp_path / 'log'), seed=5, cfg_p=0.0, mesh=mesh,
            pp_microbatches=2 if pp_on else None)
        tr.train()
        return tr, pipe

    tr_ref, pipe_ref = run(False, str(tmp_path / 'moe_plain'))
    tr_pp, pipe_pp = run(True, str(tmp_path / 'moe_pp'))
    assert tr_pp.steps == tr_ref.steps > 0
    assert abs(tr_pp.log['loss'] - tr_ref.log['loss']) < 1e-4
    errs = [
        _mae(a, b) for a, b in zip(
            jax.tree_util.tree_leaves(jax.tree_util.tree_map(
                np.asarray, pipe_ref.params['transformer'])),
            jax.tree_util.tree_leaves(jax.tree_util.tree_map(
                np.asarray, pipe_pp.params['transformer'])))]
    assert max(errs) < 1e-5, max(errs)


@needs_8
def test_pp_moe_generate_matches_plain():
    """Pipeline.generate for the MoE variant through
    enable_pipeline_parallel matches the plain MoE decode (deterministic),
    including a guided (logit-mix CFG) pass."""
    from paintmind_tpu.models.pipeline import Pipeline

    cfg = _moe_pipeline_cfg(depth=4, num_experts=4)
    pipe = Pipeline(cfg, stage1_pretrained=False, text_encoder=None, seed=9)
    key = jax.random.PRNGKey(42)
    ctx = jnp.asarray(np.random.default_rng(1).standard_normal(
        (4, 5, 48)).astype(np.float32))

    ref = pipe.generate(text=ctx, timesteps=2, temperature=0.0, topk=1,
                        decode_steps='final', key=key)[-1]
    ref_guided = pipe.generate(text=ctx, timesteps=2, temperature=0.0,
                               topk=1, guidance_scale=2.0,
                               decode_steps='final', key=key)[-1]

    mesh = pmesh.make_mesh(jax.devices()[:8], model_parallel=4)
    pipe.enable_pipeline_parallel(mesh, microbatches=2)
    out = pipe.generate(text=ctx, timesteps=2, temperature=0.0, topk=1,
                        decode_steps='final', key=key)[-1]
    assert _mae(out, ref) < 1e-4
    guided = pipe.generate(text=ctx, timesteps=2, temperature=0.0, topk=1,
                           guidance_scale=2.0, decode_steps='final',
                           key=key)[-1]
    assert _mae(guided, ref_guided) < 1e-4
    pipe.disable_pipeline_parallel()

"""Int8 post-training quantization (nn/quant.py) — an extension; the
reference has no quantization support, so the oracle here is the fp32 path
of this framework itself.

Covers: scheme exactness (int-exact inputs), dequant round-trip, error
bounds vs fp32 at realistic scales, scan-stacked layer dicts, the
structural w8/w8a8 mode split (distinct pytree structures, so jit can
never serve a stale trace across modes), and the end-to-end quantized
sampler (valid ids, logits close to fp32's).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paintmind_tpu.nn import quant
from paintmind_tpu.nn.core import init_linear, linear


def _rand_linear(key, din, dout, bias=True):
    return init_linear(key, din, dout, bias=bias)


class TestScheme:
    def test_w8a8_exact_for_integer_grids(self):
        # weights and activations on an int grid scaled by powers of two:
        # quantization is lossless, so the int8 path must match fp exactly
        rng = np.random.default_rng(0)
        w = rng.integers(-127, 128, (32, 48)).astype(np.float32) * 0.5
        x = rng.integers(-127, 128, (4, 32)).astype(np.float32) * 0.25
        # force every column/row amax to 127*step so ALL scales hit the
        # grid exactly (scales are per-out-channel / per-token)
        w[0, :] = 127 * 0.5
        x[:, 0] = 127 * 0.25
        p = {'kernel': jnp.asarray(w)}
        q = quant.quantize_linear(p, 'w8a8')
        got = quant.linear_q(q, jnp.asarray(x))
        want = x @ w
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)

    def test_dequantize_round_trip_error_bounded(self):
        p = _rand_linear(jax.random.PRNGKey(1), 256, 512)
        q = quant.quantize_linear(p, 'w8')
        back = quant.dequantize_linear(q)
        err = np.abs(np.asarray(back['kernel'] - p['kernel']))
        # symmetric 8-bit: error <= scale/2 per element (+ f32 slack for
        # the |wq| ~ 127 entries where the dequant multiply rounds)
        s = np.asarray(q['scale'])[None, :]
        half_step = s / 2 + s * 1e-4
        assert (err <= half_step).all()
        np.testing.assert_array_equal(np.asarray(back['bias']),
                                      np.asarray(p['bias']))

    @pytest.mark.parametrize('mode', ['w8', 'w8a8'])
    def test_linear_error_small_at_realistic_scale(self, mode):
        p = _rand_linear(jax.random.PRNGKey(2), 1024, 1024)
        x = jax.random.normal(jax.random.PRNGKey(3), (8, 1024), jnp.float32)
        want = np.asarray(linear(p, x))
        got = np.asarray(linear(quant.quantize_linear(p, mode), x))
        denom = np.linalg.norm(want)
        assert np.linalg.norm(got - want) / denom < (
            0.005 if mode == 'w8' else 0.02)

    def test_modes_have_distinct_tree_structure(self):
        p = _rand_linear(jax.random.PRNGKey(4), 64, 64)
        s8 = jax.tree_util.tree_structure(quant.quantize_linear(p, 'w8'))
        s88 = jax.tree_util.tree_structure(quant.quantize_linear(p, 'w8a8'))
        assert s8 != s88  # jit cache key differs => no stale-trace trap

    def test_bias_and_dtype_follow_activation(self):
        p = _rand_linear(jax.random.PRNGKey(5), 128, 64)
        q = quant.quantize_linear(p, 'w8a8')
        y = linear(q, jnp.ones((2, 128), jnp.bfloat16))
        assert y.dtype == jnp.bfloat16


class TestTreeWalk:
    def test_quantize_tree_respects_min_dim_and_stacks(self):
        from paintmind_tpu.nn.transformer import init_stack
        stack = init_stack(jax.random.PRNGKey(6), 3, 128, dim_head=32,
                           mlp_dim=256, num_head=4, cross=True,
                           context_dim=128)
        tree = {'token_proj': init_linear(jax.random.PRNGKey(7), 32, 128),
                'layers': stack}
        q = quant.quantize_tree(tree, 'w8a8')
        assert 'kernel' in q['token_proj']          # 32 < min_dim: skipped
        qq = q['layers']['attn1']['to_q']
        assert qq['kernel_q'].dtype == jnp.int8
        assert qq['kernel_q'].shape == (3, 128, 128)
        assert qq['scale'].shape == (3, 128)
        assert qq['dyn'].shape == (3, 0)            # scan-compatible marker

    def test_stacked_quantized_params_run_under_scan(self):
        from paintmind_tpu.nn.transformer import init_stack, stack_apply
        stack = init_stack(jax.random.PRNGKey(8), 2, 64, dim_head=16,
                           mlp_dim=128, num_head=4)
        x = jax.random.normal(jax.random.PRNGKey(9), (2, 16, 64))
        want = np.asarray(stack_apply(stack, x, heads=4, backend='xla'))
        qs = quant.quantize_tree(stack, 'w8a8')
        got = np.asarray(jax.jit(
            lambda p, x: stack_apply(p, x, heads=4, backend='xla'))(qs, x))
        rel = np.linalg.norm(got - want) / np.linalg.norm(want)
        assert rel < 0.05


class TestTensorParallel:
    @pytest.mark.skipif(len(jax.devices()) < 8,
                        reason='needs 8 virtual devices')
    def test_quantized_tp_logits_match_replicated(self):
        """int8 composes with tensor parallelism: the aligned spec tree
        shards kernel_q/scale like the fp kernel, and sharded execution
        matches replicated (int accumulation is exact, so tolerance is
        the f32 rescale only)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        import paintmind_tpu.config as pmc
        from paintmind_tpu.models import pipeline as pl
        from paintmind_tpu.models import transformer as st2
        from paintmind_tpu.parallel import mesh as pmesh

        vq = {
            'n_embed': 64, 'embed_dim': 8, 'beta': 0.25,
            'enc': {'image_size': 32, 'patch_size': 8, 'dim': 32, 'depth': 1,
                    'num_head': 2, 'mlp_dim': 64, 'in_channels': 3,
                    'dim_head': 16, 'dropout': 0.0},
            'dec': {'image_size': 32, 'patch_size': 8, 'dim': 32, 'depth': 1,
                    'num_head': 2, 'mlp_dim': 64, 'out_channels': 3,
                    'dim_head': 16, 'dropout': 0.0},
        }
        pmc.register_version('test-vqgan-quant-tp', vq)
        cfg = pl.PipelineConfig(
            stage1='test-vqgan-quant-tp', t5='t5-l', dim=32, dim_head=16,
            mlp_dim=64, num_head=2, depth=2, dropout=0.0,
            vqc=pl.vm.VQModelConfig.from_dict(vq), t5_dim=48)
        mesh = pmesh.make_mesh(jax.devices()[:8], model_parallel=2)
        params = pl.init_pipeline(jax.random.PRNGKey(0), cfg)
        tp = dict(params['transformer'])
        tp['layers'] = quant.quantize_tree(tp['layers'], 'w8a8', min_dim=16)
        tp['to_logits'] = quant.quantize_linear(tp['to_logits'], 'w8a8')

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((4, 16, 8)).astype(np.float32))
        ctx = jnp.asarray(rng.standard_normal((4, 5, 48)).astype(np.float32))
        ref = st2.cond_transformer_apply(tp, x, ctx, cfg=cfg.tcfg,
                                         backend='xla')

        spec = pmesh.cond_transformer_param_spec(tp)
        assert spec['layers']['attn1']['to_q']['kernel_q'] == P(
            None, None, pmesh.MODEL_AXIS)
        assert spec['layers']['attn1']['to_q']['scale'] == P(
            None, pmesh.MODEL_AXIS)
        sharded = pmesh.shard_params(tp, mesh, spec)
        xs = jax.device_put(x, NamedSharding(mesh, P('data')))
        out = jax.jit(lambda p, a, c: st2.cond_transformer_apply(
            p, a, c, cfg=cfg.tcfg, backend='xla'))(sharded, xs, ctx)
        err = float(np.mean(np.abs(np.asarray(out) - np.asarray(ref))))
        assert err < 1e-5


class TestPipeline:
    @pytest.fixture(scope='class')
    def tiny(self):
        import paintmind_tpu.config as pmc
        from paintmind_tpu.models import pipeline as pl
        vq = {
            'n_embed': 512, 'embed_dim': 16, 'beta': 0.25,
            'enc': {'image_size': 32, 'patch_size': 8, 'dim': 32, 'depth': 1,
                    'num_head': 2, 'mlp_dim': 64, 'in_channels': 3,
                    'dim_head': 16, 'dropout': 0.0},
            'dec': {'image_size': 32, 'patch_size': 8, 'dim': 32, 'depth': 1,
                    'num_head': 2, 'mlp_dim': 64, 'out_channels': 3,
                    'dim_head': 16, 'dropout': 0.0},
        }
        pmc.register_version('test-vqgan-quant', vq)
        # transformer dims >= 64 so quantize_tree's min_dim picks them up
        cfg = pl.PipelineConfig(
            stage1='test-vqgan-quant', t5='t5-l', dim=64, dim_head=16,
            mlp_dim=128, num_head=4, depth=2, dropout=0.0,
            vqc=pl.vm.VQModelConfig.from_dict(vq), t5_dim=64)
        return pl.Pipeline(cfg, stage1_pretrained=False, text_encoder=None,
                           seed=0)

    def test_quantized_sampler_valid_and_logits_close(self, tiny):
        import paintmind_tpu.models.pipeline as pl
        ids = jnp.full((2, tiny.num_tokens), tiny.mask_token_id, jnp.int32)
        ctx = jax.random.normal(jax.random.PRNGKey(10), (2, 7, 64))
        tok = pl.ids_to_tokens(tiny.params, ids, tiny.config)
        want = np.asarray(tiny.tokens2logits(tok, ctx), np.float32)

        tiny.quantize('w8a8')
        assert tiny._quantized == 'w8a8'
        got = np.asarray(tiny.tokens2logits(tok, ctx), np.float32)
        # logits agree closely; more importantly the argmax ordering the
        # sampler consumes is overwhelmingly preserved
        rel = np.linalg.norm(got - want) / np.linalg.norm(want)
        assert rel < 0.05
        agree = (got.argmax(-1) == want.argmax(-1)).mean()
        assert agree > 0.95

        # the merged trajectory (preds[-1]) is the complete sample —
        # final_ids keeps >=1 scheduled-masked slot by construction
        _, preds = pl.generate_ids(
            tiny.params, jax.random.PRNGKey(0), ids, ctx, cfg=tiny.config,
            timesteps=4, topk=3)
        out = np.asarray(preds[-1])
        assert (out >= 0).all()
        assert (out < tiny.config.tcfg.num_classes).all()

    def test_fp_checkpoint_into_quantized_pipeline_refuses(self, tiny,
                                                           tmp_path):
        # own quantized pipeline: must not depend on an earlier test having
        # quantized the shared class fixture
        from paintmind_tpu.models import pipeline as pl
        fp = pl.Pipeline(tiny.config, stage1_pretrained=False,
                         text_encoder=None, seed=3)
        path = str(tmp_path / 'fp.npz')
        fp.save_pretrained(path)
        q = pl.Pipeline(tiny.config, stage1_pretrained=False,
                        text_encoder=None, seed=4).quantize('w8a8')
        with pytest.raises(RuntimeError, match='quantized'):
            q.from_pretrained(path)

    def test_double_quantize_refuses(self, tiny):
        from paintmind_tpu.models import pipeline as pl
        q = pl.Pipeline(tiny.config, stage1_pretrained=False,
                        text_encoder=None, seed=6).quantize('w8a8')
        with pytest.raises(RuntimeError, match='already quantized'):
            q.quantize('w8')

    def test_quantized_artifact_round_trips_bit_exact(self, tiny, tmp_path):
        """Deployment flow: quantize once offline, save the int8 artifact,
        reload it into a fresh quantized pipeline (both bf16, the serving
        config) — logits bit-equal, f32 scales preserved (not downcast by
        compute_dtype)."""
        from paintmind_tpu.models import pipeline as pl
        src = pl.Pipeline(tiny.config, stage1_pretrained=False,
                          text_encoder=None, seed=5,
                          compute_dtype=jnp.bfloat16)
        src.quantize('w8a8')
        path = str(tmp_path / 'q.npz')
        src.save_pretrained(path)
        other = pl.Pipeline(tiny.config, stage1_pretrained=False,
                            text_encoder=None, seed=9,
                            compute_dtype=jnp.bfloat16)
        other.quantize('w8a8')
        other.from_pretrained(path)
        q = other.params['transformer']['layers']['attn1']['to_q']
        assert q['kernel_q'].dtype == jnp.int8
        assert q['scale'].dtype == jnp.float32
        ids = jnp.full((2, src.num_tokens), src.mask_token_id, jnp.int32)
        ctx = jax.random.normal(jax.random.PRNGKey(10), (2, 7, 64))
        a = np.asarray(src.tokens2logits(src.ids2tokens(ids), ctx),
                       np.float32)
        b = np.asarray(other.tokens2logits(other.ids2tokens(ids), ctx),
                       np.float32)
        np.testing.assert_array_equal(a, b)

    def test_bf16_pipeline_generate_after_quantize(self, tiny):
        # the production serving config: bf16 activations + int8 weights,
        # full object API (generate -> vqgan decode)
        from paintmind_tpu.models import pipeline as pl
        pipe = pl.Pipeline(tiny.config, stage1_pretrained=False,
                           text_encoder=None, seed=0,
                           compute_dtype=jnp.bfloat16)
        pipe.quantize('w8a8')
        imgs = pipe.generate(num_samples=2, timesteps=2, topk=2,
                             decode_steps='final',
                             key=jax.random.PRNGKey(0))
        out = np.asarray(imgs[-1], np.float32)
        assert out.shape[0] == 2 and np.isfinite(out).all()

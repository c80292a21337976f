"""Input-validation errors are clear and early."""

import numpy as np
import pytest

from paintmind_tpu.models import vqmodel as vm


def test_bad_patch_size_raises():
    with pytest.raises(ValueError, match='divisible by the patch size'):
        vm.ViTConfig(image_size=100, patch_size=8)


def test_wrong_image_size_raises():
    cfg = {
        'n_embed': 16, 'embed_dim': 4, 'beta': 0.25,
        'enc': {'image_size': 16, 'patch_size': 8, 'dim': 16, 'depth': 1,
                'num_head': 2, 'mlp_dim': 32, 'in_channels': 3,
                'dim_head': 8, 'dropout': 0.0},
        'dec': {'image_size': 16, 'patch_size': 8, 'dim': 16, 'depth': 1,
                'num_head': 2, 'mlp_dim': 32, 'out_channels': 3,
                'dim_head': 8, 'dropout': 0.0},
    }
    model = vm.VQModel(cfg, seed=0)
    with pytest.raises(ValueError, match='expected 16x16'):
        model.encode(np.zeros((1, 32, 32, 3), np.float32))


def test_grad_accum_divisibility():
    import jax
    from paintmind_tpu import optim
    from paintmind_tpu.models import pipeline as pl
    from paintmind_tpu.train import steps as ts
    import paintmind_tpu.config as pmc

    small = {
        'n_embed': 16, 'embed_dim': 4, 'beta': 0.25,
        'enc': {'image_size': 16, 'patch_size': 8, 'dim': 16, 'depth': 1,
                'num_head': 2, 'mlp_dim': 32, 'in_channels': 3,
                'dim_head': 8, 'dropout': 0.0},
        'dec': {'image_size': 16, 'patch_size': 8, 'dim': 16, 'depth': 1,
                'num_head': 2, 'mlp_dim': 32, 'out_channels': 3,
                'dim_head': 8, 'dropout': 0.0},
    }
    pmc.register_version('test-vqgan-val', small)
    cfg = pl.PipelineConfig(stage1='test-vqgan-val', dim=16, dim_head=8,
                            mlp_dim=32, num_head=2, depth=1, dropout=0.0,
                            vqc=vm.VQModelConfig.from_dict(small), t5_dim=16)
    params = pl.init_pipeline(jax.random.PRNGKey(0), cfg)
    tx = ts.masked_tx(optim.lion(1e-4), params)
    state = ts.init_pipeline_train_state(jax.random.PRNGKey(1), params, tx)
    step = ts.make_pipeline_train_step(cfg, tx, grad_accum=3)
    import jax.numpy as jnp
    with pytest.raises(ValueError, match='not divisible'):
        step(state, jnp.zeros((4, 16, 16, 3)), None, jnp.asarray(0.5))

import json

from paintmind_tpu import Config, ver2cfg


def test_roundtrip(tmp_path):
    cfg = Config(ver2cfg['vit-s-vqgan'])
    assert cfg.n_embed == 8192
    assert cfg.enc['patch_size'] == 8
    d = cfg.to_dict()
    d['n_embed'] = 4096
    assert cfg.n_embed == 8192  # to_dict deep-copies

    path = tmp_path / 'c.json'
    cfg.to_json(path)
    cfg2 = Config()
    cfg2.from_json(path)
    assert cfg2.to_dict() == cfg.to_dict()
    assert json.loads(cfg.to_json_string())['embed_dim'] == 32


def test_registry_matches_reference_hparams():
    v = ver2cfg['vit-s-vqgan']
    assert (v['n_embed'], v['embed_dim'], v['beta']) == (8192, 32, 0.25)
    assert v['enc']['dim'] == 512 and v['enc']['depth'] == 8
    p = ver2cfg['paintmindv1']
    assert (p['dim'], p['depth'], p['num_head']) == (1024, 12, 16)


def test_512_pipeline_version():
    from paintmind_tpu.models import pipeline as pl

    cfg = pl.PipelineConfig.from_dict(ver2cfg['paintmindv1-512'])
    assert cfg.num_tokens == 4096
    assert cfg.image_size == 512
    assert cfg.stage1 == 'vit-s-vqgan-512'


def test_512_variant_shapes():
    import jax
    import jax.numpy as jnp
    from paintmind_tpu.models import vqmodel as vm

    cfg = vm.VQModelConfig.from_dict(ver2cfg['vit-s-vqgan-512'])
    assert cfg.enc.num_patches == 4096
    params = jax.eval_shape(
        lambda k: vm.init_vqmodel(k, cfg), jax.random.PRNGKey(0))
    out = jax.eval_shape(
        lambda p, x: vm.forward(p, x, cfg),
        params, jax.ShapeDtypeStruct((1, 512, 512, 3), jnp.float32))
    assert out[0].shape == (1, 512, 512, 3)


def test_pos_embed_interpolation():
    """512² adaptation (VERDICT r2 #9): checkpoint pos-embeds interpolate
    to the larger grid; identity at the same size; corners preserved."""
    import jax.numpy as jnp
    import numpy as np
    from paintmind_tpu.convert.resolution import (adapt_pipeline_resolution,
                                                  interpolate_pos_embed)

    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.standard_normal((1, 16, 8)).astype(np.float32))
    assert interpolate_pos_embed(pos, 16) is pos  # same size: untouched
    up = interpolate_pos_embed(pos, 64)
    assert up.shape == (1, 64, 8)
    # constant tables stay constant under any resize
    const = jnp.ones((1, 16, 8))
    np.testing.assert_allclose(np.asarray(
        interpolate_pos_embed(const, 64)), 1.0, atol=1e-5)
    import pytest
    with pytest.raises(ValueError):
        interpolate_pos_embed(pos, 60)  # not a square grid

    # full pipeline adaptation plumbs through every tower
    params = {
        'vqgan': {
            'encoder': {'pos_embed': pos, 'w': jnp.zeros((3,))},
            'decoder': {'pos_embed': pos, 'w': jnp.zeros((3,))},
            'quantize': {'codebook': jnp.zeros((4, 8))},
        },
        'transformer': {'pos_embed': pos, 'w': jnp.zeros((2,))},
        'mask_token': jnp.zeros((1, 8)),
    }
    out = adapt_pipeline_resolution(params, 64)
    assert out['vqgan']['encoder']['pos_embed'].shape == (1, 64, 8)
    assert out['vqgan']['decoder']['pos_embed'].shape == (1, 64, 8)
    assert out['transformer']['pos_embed'].shape == (1, 64, 8)
    assert out['vqgan']['quantize']['codebook'].shape == (4, 8)  # untouched

"""CLIP conditioning towers as first-class pipeline options.

The reference defines CLIPText/ImageEmbedder but never wires them into any
pipeline (dead code, paintmind/modules/encoder.py:45-151).  Here the
registry's ``t5`` field names any context tower (models/pipeline.
CONTEXT_TOWERS): these tests cover the tiny-config end-to-end paths (loss +
generate under CLIP text-token and CLIP image-token conditioning) and the
registry/dispatch plumbing at full-size dims.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import paintmind_tpu as pm
import paintmind_tpu.config as pmc
from paintmind_tpu.models import clip as clip_mod
from paintmind_tpu.models import pipeline as pl


SMALL_VQ = {
    'n_embed': 64, 'embed_dim': 8, 'beta': 0.25,
    'enc': {'image_size': 32, 'patch_size': 8, 'dim': 32, 'depth': 1,
            'num_head': 2, 'mlp_dim': 64, 'in_channels': 3, 'dim_head': 16,
            'dropout': 0.0},
    'dec': {'image_size': 32, 'patch_size': 8, 'dim': 32, 'depth': 1,
            'num_head': 2, 'mlp_dim': 64, 'out_channels': 3, 'dim_head': 16,
            'dropout': 0.0},
}
pmc.register_version('test-vqgan-clipcond', SMALL_VQ)

TINY_TEXT = clip_mod.CLIPTextConfig(vocab_size=64, width=16, heads=2,
                                    layers=1, context_length=7)
TINY_VISION = clip_mod.CLIPVisionConfig(image_size=28, patch_size=14,
                                        width=24, heads=2, layers=1)


def _tiny_pipeline(tower, t5_dim, text_encoder):
    cfg = pl.PipelineConfig(
        stage1='test-vqgan-clipcond', t5=tower, dim=32, dim_head=16,
        mlp_dim=64, num_head=2, depth=2, dropout=0.0,
        vqc=pl.vm.VQModelConfig.from_dict(SMALL_VQ), t5_dim=t5_dim)
    return pl.Pipeline(cfg, stage1_pretrained=False,
                       text_encoder=text_encoder, seed=0)


def test_registry_dims():
    clip_cfg = pl.PipelineConfig.from_dict(pmc.ver2cfg['paintmindv1-clip'])
    assert clip_cfg.t5 == 'clip-l' and clip_cfg.t5_dim == 768
    img_cfg = pl.PipelineConfig.from_dict(pmc.ver2cfg['paintmindv1-imgvar'])
    assert img_cfg.t5 == 'clip-img-l' and img_cfg.t5_dim == 1024
    # cross-attention context dim follows the tower
    assert clip_cfg.tcfg.context_dim == 768
    assert img_cfg.tcfg.context_dim == 1024


def test_clip_text_conditioning_end_to_end(rng):
    tower = clip_mod.CLIPTextEmbedder(cfg=TINY_TEXT, seed=3)
    pipe = _tiny_pipeline('clip-l', TINY_TEXT.width, tower)
    ids = rng.integers(0, TINY_TEXT.vocab_size,
                       (2, TINY_TEXT.context_length)).astype(np.int32)
    ctx = pipe.embed_text(ids)
    assert ctx.shape == (2, TINY_TEXT.context_length, TINY_TEXT.width)

    imgs = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    loss = pipe.forward(imgs, text=ids, mask_ratio=0.5,
                        key=jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))

    out = pipe.generate(text=ids, timesteps=2, decode_steps='final',
                        key=jax.random.PRNGKey(1))
    assert out[-1].shape == (2, 32, 32, 3)


def test_clip_image_conditioning_end_to_end(rng):
    tower = clip_mod.CLIPImageEmbedder(cfg=TINY_VISION, seed=4)
    pipe = _tiny_pipeline('clip-img-l', TINY_VISION.width, tower)
    cond_imgs = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    # 4-D float input routes to the image tower (resized 32 → 28 inside)
    ctx = pipe.embed_text(cond_imgs)
    grid = (TINY_VISION.image_size // TINY_VISION.patch_size) ** 2
    assert ctx.shape == (2, grid, TINY_VISION.width)

    imgs = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    loss = pipe.forward(imgs, text=cond_imgs, mask_ratio=0.5,
                        key=jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))

    # image-variations entry: generate conditioned on reference images
    out = pipe.generate(text=cond_imgs, timesteps=2, decode_steps='final',
                        key=jax.random.PRNGKey(1))
    assert out[-1].shape == (2, 32, 32, 3)

    # 3-D input is still treated as precomputed (B, M, D) embeddings
    assert pipe.embed_text(np.asarray(ctx)).shape == ctx.shape


def test_default_tower_dispatch_refuses_random_clip():
    # 'auto' must NOT silently build a random-weight CLIP tower (a served
    # pipeline would condition on an extractor unrelated to training) —
    # fail loudly and point at the explicit-tower path; an explicit tower
    # object passes straight through
    pipe = pl.Pipeline(pl.PipelineConfig(
        stage1='test-vqgan-clipcond', t5='clip-l', dim=32, dim_head=16,
        mlp_dim=64, num_head=2, depth=2, dropout=0.0,
        vqc=pl.vm.VQModelConfig.from_dict(SMALL_VQ), t5_dim=768),
        stage1_pretrained=False, seed=0)
    with pytest.raises(RuntimeError, match='tower'):
        pipe._get_text_model()
    explicit = clip_mod.CLIPTextEmbedder(
        cfg=clip_mod.CLIPTextConfig(width=48, heads=2, layers=1), seed=0)
    pipe2 = pl.Pipeline(pipe.config, stage1_pretrained=False,
                        text_encoder=explicit, seed=0)
    assert pipe2._get_text_model() is explicit


def test_factory_builds_clip_versions():
    # create_model resolves the new registry names (text tower stays lazy
    # — no 38M/300M random init unless text is actually embedded)
    m = pm.create_model(arch='pipeline', version='paintmindv1-clip',
                        pretrained=False)
    assert m.config.t5_dim == 768
    assert m.text_model is None


def test_image_tower_save_load_roundtrip(tmp_path, rng):
    from paintmind_tpu.utils.checkpoint import save_params
    tower = clip_mod.CLIPImageEmbedder(cfg=TINY_VISION, seed=9)
    path = str(tmp_path / 'tower.npz')
    save_params(path, tower.params)
    # architecture is inferred from parameter shapes (heads = width // 64,
    # floor 1 — TINY_VISION.heads is 2, so compare a rebuilt config)
    loaded = clip_mod.load_image_tower(path)
    assert loaded.cfg.layers == TINY_VISION.layers
    assert loaded.cfg.width == TINY_VISION.width
    assert loaded.cfg.patch_size == TINY_VISION.patch_size
    assert loaded.cfg.image_size == TINY_VISION.image_size
    imgs = rng.uniform(-1, 1, (2, 28, 28, 3)).astype(np.float32)
    # heads differ only if width//64 != tiny heads; recompute reference with
    # the loaded head count for an apples-to-apples numeric check
    ref = clip_mod.clip_image_encode(tower.params, jnp.asarray(imgs),
                                     cfg=loaded.cfg)
    got = loaded(imgs)
    assert np.allclose(np.asarray(ref), np.asarray(got), atol=1e-5)


def test_imgvar_trainer_loop_end_to_end(tmp_path, rng):
    """The image-variations TRAINING wiring (tools/train_imgvar.py): a
    self-conditioned loader yields (imgs, imgs), the frozen CLIP image
    tower is the trainer's text_embedder, CFG dropout zeroes the context
    for some steps — the loop must train, log, and sample variations."""
    from paintmind_tpu.utils.trainer import PaintMindTrainer

    tower = clip_mod.CLIPImageEmbedder(cfg=TINY_VISION, seed=4)
    pipe = _tiny_pipeline('clip-img-l', TINY_VISION.width, tower)

    imgs = rng.uniform(-1, 1, (16, 32, 32, 3)).astype(np.float32)

    class SelfCondLoader:
        def __init__(self, arr, bs):
            self.arr, self.bs = arr, bs

        def __len__(self):
            return len(self.arr) // self.bs

        def __iter__(self):
            for i in range(len(self)):
                b = self.arr[i * self.bs:(i + 1) * self.bs]
                yield b, b

    tr = PaintMindTrainer(
        pipe, dataset=None, num_epoch=2, optim_name='adamw', lr=1e-3,
        warmup_steps=1, decay_steps=4, batch_size=8, grad_accum_steps=1,
        mixed_precision='no', ema_decay=0.999, cfg_p=0.5, save_every=1000,
        sample_every=1000, log_every=1,
        result_folder=str(tmp_path / 'r'), log_dir=str(tmp_path / 'l'),
        text_embedder=tower,
        train_loader=SelfCondLoader(imgs, 8),
        valid_loader=SelfCondLoader(imgs[:8], 8))
    try:
        tr.train()
    finally:
        from paintmind_tpu.parallel.context import set_active_mesh
        set_active_mesh(None)
    assert tr.steps == 4
    assert np.isfinite(tr.log['loss'])

    # variations demo path: condition on held-out refs, N samples each
    refs = imgs[:2]
    ctx = tower(refs)
    rep = jnp.repeat(ctx, 2, axis=0)
    gens = pipe.generate(text=rep, timesteps=2, topk=2, guidance_scale=2.0,
                         decode_steps='final', key=jax.random.PRNGKey(1))[-1]
    assert np.asarray(gens).shape == (4, 32, 32, 3)
    assert np.isfinite(np.asarray(gens, np.float32)).all()

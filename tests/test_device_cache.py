"""Device-resident dataset cache: transform parity with the host pipeline,
determinism, and epoch coverage."""

import numpy as np
import pytest
from PIL import Image

import jax.numpy as jnp  # noqa: E402

from paintmind_tpu.utils.device_cache import (DeviceCacheLoader,  # noqa: E402
                                              make_split_cache_loaders)


@pytest.fixture
def image_folder(tmp_path, rng):
    for i in range(12):
        arr = rng.integers(0, 255, (50 + 3 * i, 60 - 2 * i, 3),
                           dtype=np.uint8)
        Image.fromarray(arr).save(tmp_path / f'im_{i:02d}.png')
    return tmp_path


def test_eval_mode_matches_host_transform(image_folder):
    """Eval center-crop batches reproduce utils/transform.stage1_transform
    exactly (same PIL resize on host, uint8 quantization included)."""
    from paintmind_tpu.utils.transform import stage1_transform
    loader = DeviceCacheLoader(image_folder, batch_size=4, img_size=32,
                               is_train=False)
    batches = list(loader)
    assert len(batches) == len(loader) == 3
    got = np.concatenate([np.asarray(b) for b in batches])

    t = stage1_transform(img_size=32, is_train=False)
    paths = sorted(p for p in image_folder.iterdir())
    ref = np.stack([np.asarray(t(Image.open(p).convert('RGB')))
                    for p in paths])
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_train_mode_is_seed_deterministic_and_augments(image_folder):
    def run(seed):
        loader = DeviceCacheLoader(image_folder, batch_size=4, img_size=32,
                                   is_train=True, seed=seed)
        return [np.asarray(b) for b in loader]

    a, b, c = run(3), run(3), run(4)
    for xa, xb in zip(a, b):
        np.testing.assert_array_equal(xa, xb)
    assert any(not np.array_equal(xa, xc) for xa, xc in zip(a, c))
    # epochs reshuffle/re-augment
    loader = DeviceCacheLoader(image_folder, batch_size=4, img_size=32,
                               is_train=True, seed=3)
    e0 = [np.asarray(x) for x in loader]
    e1 = [np.asarray(x) for x in loader]
    assert any(not np.array_equal(x0, x1) for x0, x1 in zip(e0, e1))
    # range sanity
    assert all(x.min() >= -1.0 and x.max() <= 1.0 for x in e0)


def test_split_loaders_and_size_errors(image_folder):
    train, valid = make_split_cache_loaders(
        [str(p) for p in sorted(image_folder.iterdir())], train_batch=4,
        valid_batch=8, valid_size=2, img_size=32)
    # valid_n = min(valid_size, max(n // 10, 1)) = 1 for 12 images
    assert len(train) == 2  # 11 train images // 4
    vb = list(valid)
    assert len(vb) == 1 and np.asarray(vb[0]).shape == (1, 32, 32, 3)

    with pytest.raises(ValueError, match='smaller than batch'):
        DeviceCacheLoader(image_folder, batch_size=64, img_size=32)
    with pytest.raises(ValueError, match='pre-resized'):
        DeviceCacheLoader(np.zeros((4, 17, 17, 3), np.uint8), batch_size=2,
                          img_size=32)


def test_trainer_runs_on_device_cache(tmp_path, image_folder):
    """End-to-end: VQGANTrainer trains through device-resident batches."""
    import jax
    from paintmind_tpu.models import discriminator as dm
    from paintmind_tpu.models.vqmodel import VQModel
    from paintmind_tpu.utils.trainer import VQGANTrainer
    import paintmind_tpu.config as pmc

    small_vq = {
        'n_embed': 32, 'embed_dim': 8, 'beta': 0.25,
        'enc': {'image_size': 32, 'patch_size': 8, 'dim': 32, 'depth': 1,
                'num_head': 2, 'mlp_dim': 64, 'in_channels': 3,
                'dim_head': 16, 'dropout': 0.0},
        'dec': {'image_size': 32, 'patch_size': 8, 'dim': 32, 'depth': 1,
                'num_head': 2, 'mlp_dim': 64, 'out_channels': 3,
                'dim_head': 16, 'dropout': 0.0}}
    train, valid = make_split_cache_loaders(
        [str(p) for p in sorted(image_folder.iterdir())], train_batch=8,
        valid_batch=2, valid_size=2, img_size=32)
    trainer = VQGANTrainer(
        VQModel(small_vq, seed=0), dataset=None, num_epoch=1, lr=1e-3,
        warmup_steps=1, batch_size=8, mixed_precision='no', save_every=100,
        sample_every=1, result_folder=str(tmp_path),
        log_dir=str(tmp_path / 'log'), perceptual_weights='none',
        disc_config=dm.DiscriminatorConfig(input_nc=3, ndf=16, n_layers=2),
        train_loader=train, valid_loader=valid)
    trainer.train()
    assert trainer.steps == 1
    assert np.isfinite(trainer.log['rec loss'])
    assert np.isfinite(trainer.log['val psnr'])


def test_drop_last_false_yields_every_image_once(image_folder):
    from paintmind_tpu.utils.transform import stage1_transform
    loader = DeviceCacheLoader(image_folder, batch_size=5, img_size=32,
                               is_train=False, drop_last=False)
    batches = [np.asarray(b) for b in loader]
    assert len(loader) == 3
    assert [b.shape[0] for b in batches] == [5, 5, 2]
    got = np.concatenate(batches)
    t = stage1_transform(img_size=32, is_train=False)
    ref = np.stack([np.asarray(t(Image.open(p).convert('RGB')))
                    for p in sorted(image_folder.iterdir())])
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_return_indices_tracks_items(image_folder):
    loader = DeviceCacheLoader(image_folder, batch_size=5, img_size=32,
                               is_train=True, seed=1, drop_last=False,
                               return_indices=True)
    batches = list(loader)
    idx = np.concatenate([np.asarray(i) for _, i in batches])
    assert sorted(idx.tolist()) == list(range(12))  # each item exactly once


def test_split_image_paths_is_the_loader_split(tmp_path):
    """eval tools re-derive the held-out set through split_image_paths —
    it must partition identically to make_split_cache_loaders (same rule,
    single source of truth) and cover every file exactly once."""
    from paintmind_tpu.utils.device_cache import split_image_paths
    import numpy as np
    from PIL import Image
    for i in range(23):
        Image.fromarray(np.full((8, 8, 3), i * 11, np.uint8)).save(
            tmp_path / f'img_{i:03d}.png')
    train, valid = split_image_paths(str(tmp_path), valid_size=4)
    assert len(valid) == min(4, max(23 // 10, 1)) == 2
    assert sorted(train + valid) == sorted(
        str(tmp_path / f'img_{i:03d}.png') for i in range(23))
    assert not set(train) & set(valid)
    # deterministic across calls (seeded permutation)
    assert split_image_paths(str(tmp_path), valid_size=4) == (train, valid)

"""Native fastimage tier: build, decode, and PIL-parity of the preprocess."""

import io

import numpy as np
import pytest
from PIL import Image

from paintmind_tpu.native import fastimage


pytestmark = pytest.mark.skipif(not fastimage.is_available(),
                                reason='native toolchain unavailable')


def _jpeg_bytes(arr, quality=95):
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, 'JPEG', quality=quality)
    return buf.getvalue()


def test_batch_decode_preprocess_eval_matches_pil(rng):
    from paintmind_tpu.utils.transform import stage1_transform
    imgs = [rng.integers(0, 255, (300 + 17 * i, 400 - 11 * i, 3),
                         dtype=np.uint8) for i in range(4)]
    jpegs = [_jpeg_bytes(im) for im in imgs]

    out, failed = fastimage.batch_decode_preprocess(
        jpegs, img_size=256, scale=0.8, is_train=False)
    assert failed == 0
    assert out.shape == (4, 256, 256, 3)
    assert out.min() >= -1.0 and out.max() <= 1.0

    t = stage1_transform(is_train=False)
    for i in range(4):
        ref = t(Image.open(io.BytesIO(jpegs[i])))
        mae = float(np.abs(out[i] - ref).mean())
        # same decode, PIL-compatible antialiased bicubic → tight agreement
        assert mae < 2e-2, mae


def test_preprocess_rgb_train_crarmps_and_flips(rng):
    imgs = [rng.integers(0, 255, (280, 320, 3), dtype=np.uint8)
            for _ in range(3)]
    out = fastimage.batch_preprocess_rgb(imgs, img_size=256, is_train=True,
                                         rng=np.random.default_rng(0))
    assert out.shape == (3, 256, 256, 3)
    assert np.isfinite(out).all()
    # deterministic given the rng
    out2 = fastimage.batch_preprocess_rgb(imgs, img_size=256, is_train=True,
                                          rng=np.random.default_rng(0))
    assert np.array_equal(out, out2)


def test_corrupt_jpeg_reports_failure():
    good = _jpeg_bytes(np.zeros((64, 64, 3), np.uint8))
    out, failed = fastimage.batch_decode_preprocess(
        [good, b'not a jpeg'], img_size=32, is_train=False)
    assert failed == 1
    assert np.all(out[1] == 0)


# ---------------------------------------------------------------------------
# Pipelined native loader
# ---------------------------------------------------------------------------

@pytest.fixture
def jpeg_folder(tmp_path, rng):
    for i in range(10):
        arr = rng.integers(0, 255, (280 + 3 * i, 320 - 5 * i, 3),
                           dtype=np.uint8)
        Image.fromarray(arr).save(tmp_path / f'im_{i:02d}.jpg', quality=95)
    return tmp_path


def test_loader_eval_matches_batch_decode(jpeg_folder):
    """Eval mode: deterministic file order + center crop ≡ the one-shot
    batch_decode_preprocess path on the same files."""
    from paintmind_tpu.native.fastloader import NativeFolderLoader
    loader = NativeFolderLoader(jpeg_folder, batch_size=4, img_size=64,
                                is_train=False, drop_last=True,
                                num_workers=3)
    batches = list(loader)
    assert len(batches) == len(loader) == 2
    assert loader.failed == 0

    paths = loader.paths
    jpegs = [open(p, 'rb').read() for p in paths[:8]]
    ref, failed = fastimage.batch_decode_preprocess(
        jpegs, img_size=64, is_train=False)
    assert failed == 0
    got = np.concatenate(batches)
    np.testing.assert_allclose(got, ref.reshape(got.shape), atol=1e-6)


def test_loader_train_is_seed_deterministic(jpeg_folder):
    from paintmind_tpu.native.fastloader import NativeFolderLoader

    def run(seed):
        loader = NativeFolderLoader(jpeg_folder, batch_size=3, img_size=64,
                                    is_train=True, seed=seed, num_workers=4,
                                    return_indices=True)
        out = list(loader)
        loader.close()
        return out

    a, b = run(7), run(7)
    assert len(a) == len(b) == 3
    for (xa, ia), (xb, ib) in zip(a, b):
        np.testing.assert_array_equal(ia, ib)
        np.testing.assert_array_equal(xa, xb)
    c = run(8)  # different seed shuffles differently
    assert any(not np.array_equal(ia, ic)
               for (_, ia), (_, ic) in zip(a, c))


def test_loader_epoch_coverage_and_reshuffle(jpeg_folder):
    from paintmind_tpu.native.fastloader import NativeFolderLoader
    loader = NativeFolderLoader(jpeg_folder, batch_size=3, img_size=64,
                                is_train=True, seed=0, drop_last=False,
                                return_indices=True)
    e0 = list(loader)
    e1 = list(loader)
    idx0 = np.concatenate([i for _, i in e0])
    idx1 = np.concatenate([i for _, i in e1])
    # every file exactly once per epoch (drop_last=False)
    assert sorted(idx0) == list(range(10)) == sorted(idx1)
    assert not np.array_equal(idx0, idx1)  # epoch reshuffles
    # last batch is the short one
    assert e0[-1][0].shape[0] == 1
    loader.close()


def test_loader_counts_decode_failures(jpeg_folder):
    from paintmind_tpu.native.fastloader import NativeFolderLoader
    (jpeg_folder / 'im_00.jpg').write_bytes(b'not a jpeg')
    loader = NativeFolderLoader(jpeg_folder, batch_size=5, img_size=64,
                                is_train=False, drop_last=False)
    batches = list(loader)
    assert sum(b.shape[0] for b in batches) == 10
    assert loader.failed == 1
    loader.close()

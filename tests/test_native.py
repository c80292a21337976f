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

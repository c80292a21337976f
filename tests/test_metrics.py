import numpy as np
import pytest

from paintmind_tpu.utils import metrics


def test_psnr_identity_and_scale(rng):
    a = rng.uniform(-1, 1, (2, 8, 8, 3)).astype(np.float32)
    assert metrics.psnr(a, a) == float('inf')
    b = np.clip(a + 0.1, -1, 1)
    p = metrics.psnr(a, b)
    assert 20 < p < 30


def test_codebook_stats():
    idx = np.array([0, 0, 1, 2, 3])
    s = metrics.codebook_stats(idx, 8)
    assert s['usage'] == 0.5
    assert 3.0 < s['perplexity'] <= 4.0
    uniform = np.arange(8)
    s2 = metrics.codebook_stats(uniform, 8)
    assert s2['usage'] == 1.0
    assert abs(s2['perplexity'] - 8.0) < 1e-6


def test_fid_properties(rng):
    pytest.importorskip('scipy')
    x = rng.standard_normal((500, 16))
    y = rng.standard_normal((500, 16))
    same = metrics.fid(x, x)
    assert abs(same) < 1e-6
    shifted = metrics.fid(x, y + 5.0)
    near = metrics.fid(x, y)
    assert shifted > near > -1e-6

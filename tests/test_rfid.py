"""rFID machinery: InceptionV3 port (models/inception) + Fréchet pipeline.

With no pretrained weights in this environment, the extractor runs in its
documented fixed-seed substitute mode ('rfid-rand'); a golden parity test
against torchvision runs automatically wherever torchvision is installed.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from paintmind_tpu.models import inception as inc
from paintmind_tpu.utils import metrics as M


def test_pool3_shapes_and_determinism(rng):
    p = inc.init_inception()
    x = jnp.asarray(rng.uniform(-1, 1, (2, 64, 64, 3)), jnp.float32)
    f1 = inc.pool3_features(p, x)
    f2 = inc.pool3_features(p, x)
    assert f1.shape == (2, inc.POOL3_DIM)
    assert np.array_equal(np.asarray(f1), np.asarray(f2))
    # fixed default seed → identical params across constructions
    f3 = inc.pool3_features(inc.init_inception(), x)
    assert np.array_equal(np.asarray(f1), np.asarray(f3))


def test_converter_accepts_torchvision_layout(rng):
    """Every torchvision Inception3 feature-path key maps one-to-one."""
    sd = {}
    for name, spec in inc._LAYOUT:
        entries = ({name: spec} if isinstance(spec, tuple)
                   else {f'{name}.{b}': d for b, d in spec.items()})
        for prefix, (cin, cout, kh, kw) in entries.items():
            sd[f'{prefix}.conv.weight'] = rng.standard_normal(
                (cout, cin, kh, kw)).astype(np.float32) * 0.05
            sd[f'{prefix}.bn.weight'] = np.ones(cout, np.float32)
            sd[f'{prefix}.bn.bias'] = np.zeros(cout, np.float32)
            sd[f'{prefix}.bn.running_mean'] = np.zeros(cout, np.float32)
            sd[f'{prefix}.bn.running_var'] = np.ones(cout, np.float32)
    params = inc.convert_inception(sd)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)), jnp.float32)
    f = inc.pool3_features(params, x)
    assert f.shape == (1, 2048) and np.isfinite(np.asarray(f)).all()


def test_rfid_orders_distribution_mismatch(rng):
    """rFID(x, x) ≈ 0 and grows with distribution shift — the property a
    reconstruction-quality metric needs even in substitute mode."""
    real = rng.uniform(-1, 1, (24, 32, 32, 3)).astype(np.float32)
    close = np.clip(real + rng.normal(0, 0.02, real.shape), -1, 1).astype(
        np.float32)
    far = np.clip(real + rng.normal(0, 0.5, real.shape), -1, 1).astype(
        np.float32)
    v_same, variant = M.rfid(real, real.copy(), batch=8)
    v_close, _ = M.rfid(real, close, batch=8)
    v_far, _ = M.rfid(real, far, batch=8)
    assert variant == 'rfid-rand'  # no weights in this environment
    assert v_same < 1e-3
    assert v_same < v_close < v_far


def test_pool3_golden_vs_torchvision(rng):
    """Real-weight parity — runs wherever torchvision is installed."""
    torchvision = pytest.importorskip('torchvision')
    import torch
    m = torchvision.models.inception_v3(weights='IMAGENET1K_V1',
                                        transform_input=False).eval()
    params = inc.convert_inception(m.state_dict())
    x = rng.uniform(-1, 1, (2, 299, 299, 3)).astype(np.float32)

    with torch.no_grad():
        t = torch.tensor(np.asarray(inc.preprocess(x)).transpose(0, 3, 1, 2))
        y = m.Conv2d_1a_3x3(t)
        for name in ['Conv2d_2a_3x3', 'Conv2d_2b_3x3']:
            y = getattr(m, name)(y)
        y = m.maxpool1(y)
        for name in ['Conv2d_3b_1x1', 'Conv2d_4a_3x3']:
            y = getattr(m, name)(y)
        y = m.maxpool2(y)
        for name in ['Mixed_5b', 'Mixed_5c', 'Mixed_5d', 'Mixed_6a',
                     'Mixed_6b', 'Mixed_6c', 'Mixed_6d', 'Mixed_6e',
                     'Mixed_7a', 'Mixed_7b', 'Mixed_7c']:
            y = getattr(m, name)(y)
        ref = y.mean(dim=(2, 3)).numpy()

    ours = np.asarray(inc.pool3_features(params, jnp.asarray(x)))
    assert np.abs(ours - ref).mean() < 1e-3

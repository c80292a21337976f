"""End-to-end stage-1 parity: reference torch VQModel vs the JAX rebuild.

The north-star correctness gate is "reconstructions within 1e-2 MAE of
reference" (BASELINE.md); with identical fp32 math we hold ourselves to
1e-4 here.
"""

import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from paintmind_tpu import Config, ver2cfg  # noqa: E402
from paintmind_tpu.convert import torch_weights as tw  # noqa: E402
from paintmind_tpu.models import quantize as vq  # noqa: E402
from paintmind_tpu.models import vqmodel as vm  # noqa: E402
from reference_oracle import ref_module  # noqa: E402


def _mae(a, b):
    return float(np.mean(np.abs(np.asarray(a) - np.asarray(b))))


SMALL = {
    'n_embed': 512, 'embed_dim': 32, 'beta': 0.25,
    'enc': {'image_size': 64, 'patch_size': 8, 'dim': 64, 'depth': 2,
            'num_head': 4, 'mlp_dim': 128, 'in_channels': 3, 'dim_head': 16,
            'dropout': 0.0},
    'dec': {'image_size': 64, 'patch_size': 8, 'dim': 64, 'depth': 2,
            'num_head': 4, 'mlp_dim': 128, 'out_channels': 3, 'dim_head': 16,
            'dropout': 0.0},
}


@pytest.fixture(scope='module')
def ref_model():
    vqm = ref_module('stage1.vqmodel')
    torch.manual_seed(0)
    model = vqm.VQModel(Config(SMALL))
    model.eval()
    return model


@pytest.fixture(scope='module')
def jax_setup(ref_model):
    cfg = vm.VQModelConfig.from_dict(SMALL)
    params = jax.tree_util.tree_map(
        jnp.asarray, tw.convert_vqmodel(ref_model.state_dict()))
    return cfg, params


def test_quantizer_parity(rng):
    qref = ref_module('stage1.quantize')
    torch.manual_seed(1)
    q = qref.VectorQuantizer(256, 16, beta=0.25)
    z = rng.standard_normal((2, 10, 16)).astype(np.float32)
    with torch.no_grad():
        zq_t, loss_t, idx_t = q(torch.tensor(z))
    p = {'codebook': jnp.asarray(q.embedding.weight.detach().numpy())}
    zq_j, loss_j, idx_j = vq.quantize(p, jnp.asarray(z), beta=0.25,
                                      backend='xla')
    assert np.array_equal(np.asarray(idx_j), idx_t.numpy())
    assert _mae(zq_j, zq_t.numpy()) < 1e-6
    assert abs(float(loss_j) - float(loss_t)) < 1e-6
    # decode_from_indice parity (reference quantize.py:40-44)
    with torch.no_grad():
        dec_t = q.decode_from_indice(idx_t).numpy()
    dec_j = vq.decode_from_indice(p, idx_j)
    assert _mae(dec_j, dec_t) < 1e-6


def test_patchify_matches_conv(rng, ref_model):
    x = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref = ref_model.encoder.to_patch_embedding(torch.tensor(x)).numpy()
    params = tw.convert_vqmodel(ref_model.state_dict())
    patches = vm.patchify(jnp.asarray(x.transpose(0, 2, 3, 1)), 8)
    out = patches @ jnp.asarray(params['encoder']['patch_embed']['kernel'])
    assert _mae(out, ref) < 1e-5


def test_encode_parity(rng, ref_model, jax_setup):
    cfg, params = jax_setup
    x = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        z_t, loss_t, idx_t = ref_model.encode(torch.tensor(x))
    z_j, loss_j, idx_j = vm.encode(params, jnp.asarray(x.transpose(0, 2, 3, 1)),
                                   cfg, backend='xla', vq_backend='xla')
    assert np.array_equal(np.asarray(idx_j), idx_t.numpy())
    assert _mae(z_j, z_t.numpy()) < 1e-5
    assert abs(float(loss_j) - float(loss_t)) < 1e-5


def test_forward_parity(rng, ref_model, jax_setup):
    cfg, params = jax_setup
    x = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        rec_t, loss_t = ref_model(torch.tensor(x))
    rec_j, loss_j = vm.forward(params, jnp.asarray(x.transpose(0, 2, 3, 1)),
                               cfg, backend='xla', vq_backend='xla')
    rec_j_nchw = np.asarray(rec_j).transpose(0, 3, 1, 2)
    assert _mae(rec_j_nchw, rec_t.numpy()) < 1e-4
    assert abs(float(loss_j) - float(loss_t)) < 1e-5


def test_decode_from_indice_parity(ref_model, jax_setup, rng):
    cfg, params = jax_setup
    ids = rng.integers(0, SMALL['n_embed'], size=(2, 64))
    with torch.no_grad():
        img_t = ref_model.decode_from_indice(torch.tensor(ids)).numpy()
    img_j = vm.decode_from_indice(params, jnp.asarray(ids), cfg, backend='xla')
    assert _mae(np.asarray(img_j).transpose(0, 3, 1, 2), img_t) < 1e-4


def test_vqmodel_class_api(jax_setup, rng):
    cfg, params = jax_setup
    model = vm.VQModel(SMALL, params=params)
    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    rec, loss = model(x)
    assert rec.shape == (2, 64, 64, 3)
    assert np.all(np.asarray(rec) <= 1.0) and np.all(np.asarray(rec) >= -1.0)
    z, _, ids = model.encode(x)
    assert z.shape == (2, 64, 32) and ids.shape == (2, 64)
    img = model.decode_from_indice(ids)
    assert img.shape == (2, 64, 64, 3)
    # NCHW input is auto-transposed
    rec2, _ = model(x.transpose(0, 3, 1, 2))
    assert _mae(rec2, rec) < 1e-6


def test_checkpoint_roundtrip(jax_setup, tmp_path):
    cfg, params = jax_setup
    model = vm.VQModel(SMALL, params=params)
    path = model.save_pretrained(str(tmp_path / 'm.npz'))
    model2 = vm.VQModel(SMALL, seed=1)
    model2.from_pretrained(path)
    for a, b in zip(jax.tree_util.tree_leaves(model.params),
                    jax.tree_util.tree_leaves(model2.params)):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_from_pretrained_torch_pt(ref_model, tmp_path):
    """The published-checkpoint path: .pt state_dict → converted load
    (reference factory.py:16-19, vqmodel.py:43-44)."""
    path = tmp_path / 'ref.pt'
    torch.save(ref_model.state_dict(), path)
    model = vm.VQModel(SMALL, seed=3)
    model.from_pretrained(str(path))
    x = np.random.default_rng(5).standard_normal((1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        rec_t, _ = ref_model(torch.tensor(x))
    rec_j, _ = model(x)
    assert _mae(np.asarray(rec_j).transpose(0, 3, 1, 2), rec_t.numpy()) < 1e-4

"""JAX T5 encoder parity vs transformers' torch T5EncoderModel (random
weights, offline — no hub downloads)."""

import numpy as np
import pytest

torch = pytest.importorskip('torch')
transformers = pytest.importorskip('transformers')

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from paintmind_tpu.models import t5 as t5x  # noqa: E402


def _mae(a, b):
    return float(np.mean(np.abs(np.asarray(a) - np.asarray(b))))


@pytest.fixture(scope='module')
def hf_pair():
    hf_cfg = transformers.T5Config(
        vocab_size=256, d_model=64, d_kv=16, d_ff=96, num_layers=3,
        num_heads=4, relative_attention_num_buckets=16,
        relative_attention_max_distance=32, feed_forward_proj='gated-gelu',
        dropout_rate=0.0)
    torch.manual_seed(0)
    model = transformers.T5EncoderModel(hf_cfg)
    model.eval()
    cfg = t5x.T5Config.from_hf(hf_cfg)
    params = jax.tree_util.tree_map(
        jnp.asarray, t5x.convert_t5_encoder(model.state_dict()))
    return model, cfg, params


def test_t5_encoder_parity(hf_pair, rng):
    model, cfg, params = hf_pair
    ids = rng.integers(0, 256, (2, 12))
    with torch.no_grad():
        ref = model(input_ids=torch.tensor(ids)).last_hidden_state.numpy()
    out = t5x.t5_encode(params, jnp.asarray(ids, jnp.int32), cfg)
    assert _mae(out, ref) < 1e-5


def test_t5_padding_behavior_matches_reference(hf_pair, rng):
    """The reference passes no attention_mask (encoder.py:34-38), so pad
    positions are attended — verify our no-mask behavior matches HF's
    mask-of-ones default."""
    model, cfg, params = hf_pair
    ids = np.concatenate([rng.integers(1, 256, (1, 6)),
                          np.zeros((1, 6), np.int64)], axis=1)
    with torch.no_grad():
        ref = model(input_ids=torch.tensor(ids)).last_hidden_state.numpy()
    out = t5x.t5_encode(params, jnp.asarray(ids, jnp.int32), cfg)
    assert _mae(out, ref) < 1e-5


def test_relative_position_bucket_matches_hf():
    from transformers.models.t5.modeling_t5 import T5Attention
    rel = torch.arange(-40, 40)[None, :] - 0
    ref = T5Attention._relative_position_bucket(
        rel, bidirectional=True, num_buckets=16, max_distance=32).numpy()
    ours = np.asarray(t5x.relative_position_bucket(
        jnp.asarray(rel.numpy()), 16, 32))
    assert np.array_equal(ours, ref)


def test_t5_class_with_token_ids(hf_pair, rng):
    model, cfg, params = hf_pair
    enc = t5x.T5TextEncoder(params=params, cfg=cfg, tokenizer=None)
    ids = rng.integers(0, 256, (2, 8))
    out = enc(ids)
    assert out.shape == (2, 8, 64)
    with pytest.raises(RuntimeError):
        enc(['hello world'])

"""Golden parity of the L2 ops against the PyTorch reference modules."""

import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from paintmind_tpu.convert import torch_weights as tw  # noqa: E402
from paintmind_tpu.nn import attention as nn_attn  # noqa: E402
from paintmind_tpu.nn import mlp as nn_mlp  # noqa: E402
from paintmind_tpu.nn.core import init_layernorm, layernorm  # noqa: E402
from reference_oracle import ref_module  # noqa: E402


def _mae(a, b):
    return float(np.mean(np.abs(np.asarray(a) - np.asarray(b))))


def test_layernorm_parity(rng):
    x = rng.standard_normal((2, 16, 64)).astype(np.float32)
    ln = torch.nn.LayerNorm(64)
    with torch.no_grad():
        ln.weight.uniform_(0.5, 1.5)
        ln.bias.uniform_(-0.5, 0.5)
        ref = ln(torch.tensor(x)).numpy()
    p = init_layernorm(64)
    p = {'scale': jnp.asarray(ln.weight.detach().numpy()),
         'bias': jnp.asarray(ln.bias.detach().numpy())}
    out = layernorm(p, jnp.asarray(x))
    assert _mae(out, ref) < 1e-6


def test_swiglu_parity(rng):
    mref = ref_module('modules.mlp')
    torch.manual_seed(0)
    m = mref.SwiGLUFFNFused(in_features=64, hidden_features=256)
    x = rng.standard_normal((2, 8, 64)).astype(np.float32)
    with torch.no_grad():
        ref = m(torch.tensor(x)).numpy()
    sd = {f'f.{k}': v for k, v in m.state_dict().items()}
    p = tw._swiglu(sd, 'f')
    out = nn_mlp.swiglu(jax.tree_util.tree_map(jnp.asarray, p), jnp.asarray(x))
    assert _mae(out, ref) < 1e-6
    assert nn_mlp.swiglu_hidden_dim(256) == p['w12']['kernel'].shape[1] // 2


@pytest.mark.parametrize('cross', [False, True])
def test_attention_parity(rng, cross):
    aref = ref_module('modules.attention')
    torch.manual_seed(0)
    m = aref.CrossAttention(query_dim=64, context_dim=96 if cross else None,
                            heads=4, dim_head=16)
    x = rng.standard_normal((2, 10, 64)).astype(np.float32)
    ctx = rng.standard_normal((2, 7, 96)).astype(np.float32) if cross else None
    with torch.no_grad():
        ref = m(torch.tensor(x),
                torch.tensor(ctx) if cross else None).numpy()
    sd = {f'a.{k}': v for k, v in m.state_dict().items()}
    p = jax.tree_util.tree_map(jnp.asarray, tw._attention(sd, 'a'))
    out = nn_attn.attention(p, jnp.asarray(x),
                            jnp.asarray(ctx) if cross else None,
                            heads=4, backend='xla')
    assert _mae(out, ref) < 1e-6


def test_stage1_layer_parity(rng):
    lref = ref_module('stage1.layers')
    torch.manual_seed(0)
    m = lref.Layer(dim=64, dim_head=16, mlp_dim=128, num_head=4)
    m.eval()
    x = rng.standard_normal((2, 12, 64)).astype(np.float32)
    with torch.no_grad():
        ref = m(torch.tensor(x)).numpy()
    sd = {f'l.{k}': v for k, v in m.state_dict().items()}
    p = jax.tree_util.tree_map(jnp.asarray, tw._block(sd, 'l'))
    from paintmind_tpu.nn.transformer import block_apply
    out = block_apply(p, jnp.asarray(x), heads=4, backend='xla')
    assert _mae(out, ref) < 1e-6

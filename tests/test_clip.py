"""CLIP tower parity vs a torch replica built from torch.nn primitives
(open_clip uses these exact modules: MultiheadAttention resblocks with
pre-LN and GELU MLP; open_clip itself is not installed here)."""

import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from paintmind_tpu.models import clip as clipx  # noqa: E402


def _mae(a, b):
    return float(np.mean(np.abs(np.asarray(a) - np.asarray(b))))


class TorchResblock(torch.nn.Module):
    def __init__(self, width, heads):
        super().__init__()
        self.ln_1 = torch.nn.LayerNorm(width)
        self.attn = torch.nn.MultiheadAttention(width, heads)
        self.ln_2 = torch.nn.LayerNorm(width)
        self.mlp = torch.nn.Sequential()
        self.mlp.add_module('c_fc', torch.nn.Linear(width, 4 * width))
        self.mlp.add_module('gelu', torch.nn.GELU())
        self.mlp.add_module('c_proj', torch.nn.Linear(4 * width, width))

    def forward(self, x, attn_mask=None):  # x: (L, N, D)
        h = self.ln_1(x)
        a, _ = self.attn(h, h, h, need_weights=False, attn_mask=attn_mask)
        x = x + a
        return x + self.mlp(self.ln_2(x))


class TorchTextTower(torch.nn.Module):
    def __init__(self, vocab, width, heads, layers, ctx_len):
        super().__init__()
        self.token_embedding = torch.nn.Embedding(vocab, width)
        self.positional_embedding = torch.nn.Parameter(
            torch.randn(ctx_len, width) * 0.01)
        self.transformer = torch.nn.Module()
        self.transformer.resblocks = torch.nn.ModuleList(
            [TorchResblock(width, heads) for _ in range(layers)])
        self.ln_final = torch.nn.LayerNorm(width)
        mask = torch.full((ctx_len, ctx_len), float('-inf')).triu(1)
        self.register_buffer('attn_mask', mask)

    def forward(self, ids, layer_idx=0):
        x = self.token_embedding(ids) + self.positional_embedding
        x = x.permute(1, 0, 2)
        blocks = self.transformer.resblocks
        stop = len(blocks) - layer_idx
        for r in blocks[:stop]:
            x = r(x, attn_mask=self.attn_mask)
        x = x.permute(1, 0, 2)
        return self.ln_final(x)


@pytest.fixture(scope='module')
def text_pair():
    torch.manual_seed(0)
    cfg = clipx.CLIPTextConfig(vocab_size=128, width=32, heads=4, layers=2,
                               context_length=8)
    m = TorchTextTower(128, 32, 4, 2, 8)
    m.eval()
    params = jax.tree_util.tree_map(
        jnp.asarray, clipx.convert_clip_text(m.state_dict()))
    return m, cfg, params


def test_clip_text_parity(text_pair, rng):
    m, cfg, params = text_pair
    ids = rng.integers(0, 128, (2, 8))
    with torch.no_grad():
        ref = m(torch.tensor(ids)).numpy()
    out = clipx.clip_text_encode(params, jnp.asarray(ids), cfg, layer='last')
    assert _mae(out, ref) < 1e-5


def test_clip_text_penultimate(text_pair, rng):
    m, cfg, params = text_pair
    ids = rng.integers(0, 128, (2, 8))
    with torch.no_grad():
        ref = m(torch.tensor(ids), layer_idx=1).numpy()
    out = clipx.clip_text_encode(params, jnp.asarray(ids), cfg,
                                 layer='penultimate')
    assert _mae(out, ref) < 1e-5


def test_clip_visual_runs(rng):
    cfg = clipx.CLIPVisionConfig(image_size=28, patch_size=14, width=32,
                                 heads=4, layers=2)
    emb = clipx.CLIPImageEmbedder(cfg=cfg)
    imgs = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    out = emb(imgs)  # resized to 28 → 2×2 grid of patches
    assert out.shape == (2, 4, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_clip_visual_resblock_parity(rng):
    """The visual tower shares the resblock math with the text tower —
    verify the non-causal path against the torch replica."""
    torch.manual_seed(1)
    m = TorchResblock(32, 4)
    m.eval()
    sd = {f'transformer.resblocks.0.{k}': v for k, v in m.state_dict().items()}
    p = jax.tree_util.tree_map(
        jnp.asarray, clipx._conv_resblock(sd, 'transformer.resblocks.0'))
    x = rng.standard_normal((2, 6, 32)).astype(np.float32)
    with torch.no_grad():
        ref = m(torch.tensor(x).permute(1, 0, 2)).permute(1, 0, 2).numpy()
    out = clipx._resblock(p, jnp.asarray(x), heads=4)
    assert _mae(out, ref) < 1e-5

"""JAX T5 text encoder (frozen conditioning tower).

TPU-native replacement for the reference T5TextEmbedder
(paintmind/modules/encoder.py:18-42): HF flan-T5 encoder, max_length 77,
padded to max, frozen, returns last_hidden_state.  Reference behavior kept
exactly: no attention mask is passed, so padding positions are attended and
embedded (encoder.py:34-38 passes only input_ids).

Architecture (T5 v1.1 / flan): RMSNorm pre-norm, relative-position-bucket
attention bias (computed in layer 0, shared by all layers), no 1/sqrt(d)
attention scaling, gated-GELU feed-forward, tied input embedding, final
RMSNorm.  Weights convert one-to-one from an HF torch ``T5EncoderModel``
state_dict (``convert_t5_encoder``) — works fully offline from a local HF
checkout; the tokenizer loads from the same directory when present.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 1024
    d_kv: int = 64
    d_ff: int = 2816
    num_layers: int = 24
    num_heads: int = 16
    rel_buckets: int = 32
    rel_max_distance: int = 128
    eps: float = 1e-6

    @classmethod
    def flan_t5_large(cls):
        return cls()

    @classmethod
    def from_hf(cls, hf_cfg):
        return cls(vocab_size=hf_cfg.vocab_size, d_model=hf_cfg.d_model,
                   d_kv=hf_cfg.d_kv, d_ff=hf_cfg.d_ff,
                   num_layers=hf_cfg.num_layers, num_heads=hf_cfg.num_heads,
                   rel_buckets=hf_cfg.relative_attention_num_buckets,
                   rel_max_distance=hf_cfg.relative_attention_max_distance)


T5_VERSIONS = {  # reference generate.py:52-53
    't5-l': ('google/flan-t5-large', 1024),
    't5-xl': ('google/flan-t5-xl', 2048),
    't5-xxl': ('google/flan-t5-xxl', 4096),
}


def _rmsnorm(w, x, eps):
    x32 = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
    return (x32 * jax.lax.rsqrt(var + eps) * w.astype(jnp.float32)).astype(x.dtype)


def relative_position_bucket(rel_pos, num_buckets=32, max_distance=128):
    """Bidirectional T5 bucket scheme (vectorized, int32)."""
    num_buckets //= 2
    ret = jnp.where(rel_pos > 0, num_buckets, 0)
    n = jnp.abs(rel_pos)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-9)
        / np.log(max_distance / max_exact) * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_large = jnp.minimum(val_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_large)


def _position_bias(rel_bias_table, qlen, klen, cfg: T5Config):
    ctx = jnp.arange(qlen)[:, None]
    mem = jnp.arange(klen)[None, :]
    buckets = relative_position_bucket(mem - ctx, cfg.rel_buckets,
                                       cfg.rel_max_distance)
    bias = jnp.take(rel_bias_table, buckets, axis=0)  # (q, k, H)
    return bias.transpose(2, 0, 1)[None]  # (1, H, q, k)


def init_t5_encoder(key, cfg: T5Config, param_dtype=jnp.float32):
    def dense(k, i, o):
        return jax.random.normal(k, (i, o), param_dtype) * (i ** -0.5)
    keys = iter(jax.random.split(key, 8 * cfg.num_layers + 3))
    blocks = []
    for _ in range(cfg.num_layers):
        inner = cfg.num_heads * cfg.d_kv
        blocks.append({
            'ln0': jnp.ones((cfg.d_model,), param_dtype),
            'q': dense(next(keys), cfg.d_model, inner),
            'k': dense(next(keys), cfg.d_model, inner),
            'v': dense(next(keys), cfg.d_model, inner),
            'o': dense(next(keys), inner, cfg.d_model),
            'ln1': jnp.ones((cfg.d_model,), param_dtype),
            'wi_0': dense(next(keys), cfg.d_model, cfg.d_ff),
            'wi_1': dense(next(keys), cfg.d_model, cfg.d_ff),
            'wo': dense(next(keys), cfg.d_ff, cfg.d_model),
        })
    return {
        'embed': jax.random.normal(next(keys), (cfg.vocab_size, cfg.d_model),
                                   param_dtype),
        'rel_bias': jax.random.normal(next(keys),
                                      (cfg.rel_buckets, cfg.num_heads),
                                      param_dtype) * 0.1,
        'blocks': jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks),
        'final_ln': jnp.ones((cfg.d_model,), param_dtype),
    }


def t5_encode(params, input_ids, cfg: T5Config, dtype=jnp.float32):
    """input_ids: (B, L) int32 → (B, L, d_model) last hidden state."""
    x = jnp.take(params['embed'], input_ids, axis=0).astype(dtype)
    b, l, _ = x.shape
    bias = _position_bias(params['rel_bias'].astype(jnp.float32), l, l, cfg)

    def block(x, p):
        h = _rmsnorm(p['ln0'], x, cfg.eps)
        q = (h @ p['q'].astype(dtype)).reshape(b, l, cfg.num_heads, cfg.d_kv)
        k = (h @ p['k'].astype(dtype)).reshape(b, l, cfg.num_heads, cfg.d_kv)
        v = (h @ p['v'].astype(dtype)).reshape(b, l, cfg.num_heads, cfg.d_kv)
        # T5: no 1/sqrt(d) scaling; additive relative position bias
        logits = jnp.einsum('bnhd,bmhd->bhnm', q, k,
                            preferred_element_type=jnp.float32) + bias
        probs = jax.nn.softmax(logits, axis=-1).astype(dtype)
        attn = jnp.einsum('bhnm,bmhd->bnhd', probs, v)
        x = x + attn.reshape(b, l, -1) @ p['o'].astype(dtype)

        h = _rmsnorm(p['ln1'], x, cfg.eps)
        gelu = jax.nn.gelu(h @ p['wi_0'].astype(dtype), approximate=True)
        x = x + (gelu * (h @ p['wi_1'].astype(dtype))) @ p['wo'].astype(dtype)
        return x, None

    x, _ = jax.lax.scan(block, x, params['blocks'])
    return _rmsnorm(params['final_ln'], x, cfg.eps)


def convert_t5_encoder(sd, prefix=''):
    """HF torch T5EncoderModel state_dict → our pytree."""
    from ..convert.torch_weights import _np

    def g(name):
        return _np(sd[prefix + name])

    i = 0
    blocks = []
    while f'{prefix}encoder.block.{i}.layer.0.SelfAttention.q.weight' in sd:
        base = f'encoder.block.{i}.layer.'
        blocks.append({
            'ln0': g(base + '0.layer_norm.weight'),
            'q': g(base + '0.SelfAttention.q.weight').T,
            'k': g(base + '0.SelfAttention.k.weight').T,
            'v': g(base + '0.SelfAttention.v.weight').T,
            'o': g(base + '0.SelfAttention.o.weight').T,
            'ln1': g(base + '1.layer_norm.weight'),
            'wi_0': g(base + '1.DenseReluDense.wi_0.weight').T,
            'wi_1': g(base + '1.DenseReluDense.wi_1.weight').T,
            'wo': g(base + '1.DenseReluDense.wo.weight').T,
        })
        i += 1
    embed_key = ('shared.weight' if prefix + 'shared.weight' in sd
                 else 'encoder.embed_tokens.weight')
    return {
        'embed': g(embed_key),
        'rel_bias': g('encoder.block.0.layer.0.SelfAttention.'
                      'relative_attention_bias.weight'),
        'blocks': jax.tree_util.tree_map(lambda *xs: np.stack(xs), *blocks),
        'final_ln': g('encoder.final_layer_norm.weight'),
    }


class T5TextEncoder:  # reference name: T5TextEmbedder (alias below)
    """Frozen text tower with the reference T5TextEmbedder call contract:
    ``encoder(list_of_strings) -> (B, 77, d_model)``.

    Loads from a local HF flan-t5 directory (offline) or the hub when
    network is available.  ``max_length=77`` padding-to-max matches
    reference encoder.py:33-35.
    """

    def __init__(self, version='google/flan-t5-large', max_length=77,
                 dtype=jnp.float32, params=None, cfg=None, tokenizer=None):
        self.version = version
        self.max_length = max_length
        self.dtype = dtype
        self.cfg = cfg or T5Config.flan_t5_large()
        self.tokenizer = tokenizer
        if params is None:
            params, self.cfg, self.tokenizer = self._load(version)
        self.params = params
        self._encode = jax.jit(functools.partial(t5_encode, cfg=self.cfg,
                                                 dtype=dtype))

    def _load(self, version):
        import transformers
        hf_cfg = transformers.AutoConfig.from_pretrained(version)
        model = transformers.T5EncoderModel.from_pretrained(version)
        params = jax.tree_util.tree_map(
            jnp.asarray, convert_t5_encoder(model.state_dict()))
        try:
            tok = transformers.AutoTokenizer.from_pretrained(version)
        except Exception:
            tok = None
        return params, T5Config.from_hf(hf_cfg), tok

    def tokenize(self, text):
        if self.tokenizer is None:
            raise RuntimeError(
                'No tokenizer available — pass precomputed token ids or '
                'text embeddings, or construct T5TextEncoder from a local '
                'HF directory containing tokenizer assets.')
        enc = self.tokenizer(list(text), truncation=True,
                             max_length=self.max_length, padding='max_length',
                             return_tensors='np')
        return jnp.asarray(enc['input_ids'], jnp.int32)

    def encode_ids(self, input_ids):
        return self._encode(self.params, jnp.asarray(input_ids, jnp.int32))

    def __call__(self, text):
        if isinstance(text, (list, tuple)) and text and isinstance(text[0], str):
            return self.encode_ids(self.tokenize(text))
        return self.encode_ids(text)

    encode = __call__


# reference-name alias (paintmind/modules/encoder.py:18)
T5TextEmbedder = T5TextEncoder

"""umT5-xxl text encoder, TPU-native functional implementation.

Reference: `wan/models/wan_text_encoder.py:256-304` (`WanT5EncoderModel`) —
umT5 encoder with per-block relative position embeddings (shared_pos=False in
the runtime config, `wan_civitai.yaml:25`), T5-style no-scale attention with
additive position bias, gated-GELU feed-forward, T5 RMS norms.

Config (`wan_civitai.yaml:18-27`): vocab 256384, dim 4096, ffn 10240,
64 heads, 24 layers, 32 buckets.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from stableavatar_tpu.config import T5Config
from stableavatar_tpu.models.vocal_projector import _linear
from stableavatar_tpu.ops.norms import t5_rms_norm


def gelu_tanh(x):
    # reference uses an explicit tanh-approx GELU (wan_text_encoder.py:38-41)
    return jax.nn.gelu(x, approximate=True)


def relative_position_buckets(
    lq: int, lk: int, num_buckets: int = 32, max_dist: int = 128
) -> np.ndarray:
    """Bidirectional T5 relative position bucketing
    (`wan_text_encoder.py:235-254`).  Static shape — computed host-side."""
    rel_pos = np.arange(lk)[None, :] - np.arange(lq)[:, None]
    nb = num_buckets // 2
    rel_buckets = (rel_pos > 0).astype(np.int64) * nb
    rel_pos = np.abs(rel_pos)

    max_exact = nb // 2
    rel_pos_large = max_exact + (
        np.log(np.maximum(rel_pos, 1) / max_exact)
        / math.log(max_dist / max_exact)
        * (nb - max_exact)
    ).astype(np.int64)
    rel_pos_large = np.minimum(rel_pos_large, nb - 1)
    rel_buckets += np.where(rel_pos < max_exact, rel_pos, rel_pos_large)
    return rel_buckets  # [lq, lk]


def _pos_bias(embedding: jnp.ndarray, lq: int, lk: int, cfg: T5Config) -> jnp.ndarray:
    """[1, heads, lq, lk] additive bias from the bucket embedding table."""
    buckets = jnp.asarray(relative_position_buckets(lq, lk, cfg.num_buckets, cfg.max_dist))
    bias = jnp.take(embedding, buckets.reshape(-1), axis=0).reshape(lq, lk, -1)
    return bias.transpose(2, 0, 1)[None]


def init_t5(key: jax.Array, cfg: T5Config = T5Config()):
    ks = jax.random.split(key, 4 + cfg.num_layers)
    d, da, dff = cfg.dim, cfg.dim_attn, cfg.dim_ffn

    def block(k):
        bk = jax.random.split(k, 8)
        p = {
            "norm1": {"w": jnp.ones((d,))},
            "attn": {
                "q": _linear(bk[0], d, da, bias=False),
                "k": _linear(bk[1], d, da, bias=False),
                "v": _linear(bk[2], d, da, bias=False),
                "o": _linear(bk[3], da, d, bias=False),
            },
            "norm2": {"w": jnp.ones((d,))},
            "ffn": {
                "gate": _linear(bk[4], d, dff, bias=False),
                "fc1": _linear(bk[5], d, dff, bias=False),
                "fc2": _linear(bk[6], dff, d, bias=False),
            },
        }
        if not cfg.shared_pos:
            p["pos_emb"] = jax.random.normal(bk[7], (cfg.num_buckets, cfg.num_heads)) * (
                (2 * cfg.num_buckets * cfg.num_heads) ** -0.5
            )
        return p

    params = {
        "token_embedding": jax.random.normal(ks[0], (cfg.vocab, d)) * 1.0,
        "blocks": [block(k) for k in ks[4 : 4 + cfg.num_layers]],
        "norm": {"w": jnp.ones((d,))},
    }
    if cfg.shared_pos:
        params["pos_emb"] = jax.random.normal(ks[1], (cfg.num_buckets, cfg.num_heads)) * (
            (2 * cfg.num_buckets * cfg.num_heads) ** -0.5
        )
    return params


def _t5_attention(p, x, mask, pos_bias, cfg: T5Config):
    """T5Attention (`wan_text_encoder.py:59-109`): no scaling, additive bias,
    fp32 softmax."""
    b, l, _ = x.shape
    n = cfg.num_heads
    hd = cfg.dim_attn // n
    q = (x @ p["q"]["w"].astype(x.dtype)).reshape(b, l, n, hd)
    k = (x @ p["k"]["w"].astype(x.dtype)).reshape(b, l, n, hd)
    v = (x @ p["v"]["w"].astype(x.dtype)).reshape(b, l, n, hd)

    attn = jnp.einsum("binc,bjnc->bnij", q, k).astype(jnp.float32)
    attn = attn + pos_bias.astype(jnp.float32)
    if mask is not None:
        neg = jnp.finfo(jnp.float32).min
        attn = jnp.where(mask[:, None, None, :] == 0, neg, attn)
    attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
    out = jnp.einsum("bnij,bjnc->binc", attn, v).reshape(b, l, n * hd)
    return out @ p["o"]["w"].astype(x.dtype)


def t5_encode(params, cfg: T5Config, input_ids: jnp.ndarray, attention_mask=None):
    """input_ids [B, L] -> hidden states [B, L, dim]."""
    x = jnp.take(params["token_embedding"], input_ids, axis=0)
    l = x.shape[1]

    shared_bias = None
    if cfg.shared_pos:
        shared_bias = _pos_bias(params["pos_emb"], l, l, cfg)

    for bp in params["blocks"]:
        bias = shared_bias if cfg.shared_pos else _pos_bias(bp["pos_emb"], l, l, cfg)
        h = t5_rms_norm(x, bp["norm1"]["w"], cfg.eps)
        x = x + _t5_attention(bp["attn"], h, attention_mask, bias, cfg)
        h = t5_rms_norm(x, bp["norm2"]["w"], cfg.eps)
        ff = (h @ bp["ffn"]["fc1"]["w"].astype(h.dtype)) * gelu_tanh(
            h @ bp["ffn"]["gate"]["w"].astype(h.dtype)
        )
        x = x + ff @ bp["ffn"]["fc2"]["w"].astype(h.dtype)

    return t5_rms_norm(x, params["norm"]["w"], cfg.eps)


# jitted alias for host-level callers (one compiled program per
# geometry instead of per-op eager dispatch)
t5_encode_jit = jax.jit(t5_encode, static_argnames=("cfg",))

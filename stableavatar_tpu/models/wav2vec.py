"""Wav2Vec2 (base-960h) audio feature extractor in JAX.

The reference uses HF `Wav2Vec2Processor` + `Wav2Vec2Model` directly
(`inference.py:475-476`, called per window at
`wan_inference_long_pipeline.py:727-729`).  This is a functional JAX port of
that architecture (do_stable_layer_norm=False variant):

- 7-layer 1D conv feature extractor (512 ch; kernels 10,3,3,3,3,2,2; strides
  5,2,2,2,2,2,2), group-norm on the first layer only;
- feature projection LN + linear 512 -> 768;
- grouped conv positional embedding (k=128, groups=16) + post-LN transformer
  encoder (12 layers, 12 heads, ffn 3072).

16 kHz waveform in, ~50 tokens/s of 768-d features out — consumed by the
vocal projector.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from stableavatar_tpu.config import Wav2Vec2Config
from stableavatar_tpu.models.vocal_projector import _linear, apply_linear
from stableavatar_tpu.ops.attention import attention
from stableavatar_tpu.ops.norms import layer_norm


def init_wav2vec2(key: jax.Array, cfg: Wav2Vec2Config = Wav2Vec2Config()):
    ks = jax.random.split(key, 16 + cfg.num_layers)
    h = cfg.hidden_size

    convs = []
    cin = 1
    for i, (cout, k) in enumerate(zip(cfg.conv_dims, cfg.conv_kernels)):
        p = {"w": jax.random.normal(ks[i], (k, cin, cout)) * 0.02}
        if i == 0:
            p["gn"] = {"w": jnp.ones((cout,)), "b": jnp.zeros((cout,))}
        convs.append(p)
        cin = cout

    def block(k):
        bk = jax.random.split(k, 6)
        return {
            "attn": {
                "q": _linear(bk[0], h, h),
                "k": _linear(bk[1], h, h),
                "v": _linear(bk[2], h, h),
                "o": _linear(bk[3], h, h),
            },
            "norm1": {"w": jnp.ones((h,)), "b": jnp.zeros((h,))},
            "ffn": {
                "fc1": _linear(bk[4], h, cfg.ffn_dim),
                "fc2": _linear(bk[5], cfg.ffn_dim, h),
            },
            "norm2": {"w": jnp.ones((h,)), "b": jnp.zeros((h,))},
        }

    return {
        "conv_layers": convs,
        "feature_projection": {
            "norm": {"w": jnp.ones((cfg.conv_dims[-1],)), "b": jnp.zeros((cfg.conv_dims[-1],))},
            "proj": _linear(ks[8], cfg.conv_dims[-1], h),
        },
        "pos_conv": {
            "w": jax.random.normal(ks[9], (cfg.num_conv_pos_embeddings, h // cfg.num_conv_pos_embedding_groups, h)) * 0.02,
            "b": jnp.zeros((h,)),
        },
        "encoder_norm": {"w": jnp.ones((h,)), "b": jnp.zeros((h,))},
        "blocks": [block(k) for k in ks[16:]],
    }


def _conv1d(x, w, stride, groups=1, padding="VALID"):
    """x [B, L, C], w [k, Cin/groups, Cout]."""
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride,), padding,
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
    )


def _group_norm(x, w, b, num_groups, eps=1e-5):
    """x [B, L, C]; torch GroupNorm(num_groups=C) == per-channel instance
    norm over the length axis."""
    bdim, l, c = x.shape
    xf = x.astype(jnp.float32).reshape(bdim, l, num_groups, c // num_groups)
    mean = xf.mean(axis=(1, 3), keepdims=True)
    var = xf.var(axis=(1, 3), keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    xf = xf.reshape(bdim, l, c)
    return (xf * w + b).astype(x.dtype)


def feature_extractor(params, cfg: Wav2Vec2Config, waveform: jnp.ndarray):
    """waveform [B, S] -> [B, T, 512]."""
    x = waveform[:, :, None]
    for i, (p, k, s) in enumerate(zip(params["conv_layers"], cfg.conv_kernels, cfg.conv_strides)):
        x = _conv1d(x, p["w"], s)
        if "gn" in p:
            x = _group_norm(x, p["gn"]["w"], p["gn"]["b"], x.shape[-1])
        x = jax.nn.gelu(x, approximate=False)
    return x


def _encoder_block(p, x, num_heads, eps):
    """Post-LN (non-stable-layer-norm) encoder layer."""
    b, l, h = x.shape
    hd = h // num_heads
    q = apply_linear(p["attn"]["q"], x).reshape(b, l, num_heads, hd) * (hd**-0.5)
    k = apply_linear(p["attn"]["k"], x).reshape(b, l, num_heads, hd)
    v = apply_linear(p["attn"]["v"], x).reshape(b, l, num_heads, hd)
    o = attention(q, k, v, scale=1.0).reshape(b, l, h)
    x = x + apply_linear(p["attn"]["o"], o)
    x = layer_norm(x, p["norm1"]["w"], p["norm1"]["b"], eps)
    ff = apply_linear(p["ffn"]["fc2"], jax.nn.gelu(apply_linear(p["ffn"]["fc1"], x), approximate=False))
    x = layer_norm(x + ff, p["norm2"]["w"], p["norm2"]["b"], eps)
    return x


def wav2vec2_forward(params, cfg: Wav2Vec2Config, waveform: jnp.ndarray):
    """waveform [B, S] (16 kHz) -> last_hidden_state [B, T, 768]."""
    feats = feature_extractor(params, cfg, waveform)
    fp = params["feature_projection"]
    x = layer_norm(feats, fp["norm"]["w"], fp["norm"]["b"], cfg.eps)
    x = apply_linear(fp["proj"], x)

    # grouped conv positional embedding (SAME-ish padding k/2 both sides, then
    # drop the trailing element for even kernels — HF num_pad_remove)
    k = cfg.num_conv_pos_embeddings
    pos = _conv1d(
        jnp.pad(x, ((0, 0), (k // 2, k // 2), (0, 0))),
        params["pos_conv"]["w"],
        1,
        groups=cfg.num_conv_pos_embedding_groups,
    )
    pos = pos + params["pos_conv"]["b"].astype(pos.dtype)
    if k % 2 == 0:
        pos = pos[:, :-1]
    x = x + jax.nn.gelu(pos, approximate=False)
    x = layer_norm(x, params["encoder_norm"]["w"], params["encoder_norm"]["b"], cfg.eps)

    for bp in params["blocks"]:
        x = _encoder_block(bp, x, cfg.num_heads, cfg.eps)
    return x



# jitted alias for host-level callers (one compiled program per
# geometry instead of per-op eager dispatch)
wav2vec2_forward_jit = jax.jit(wav2vec2_forward, static_argnames=("cfg",))

def normalize_waveform(waveform: jnp.ndarray, eps: float = 1e-7):
    """Wav2Vec2Processor zero-mean / unit-variance normalization."""
    mean = waveform.mean(axis=-1, keepdims=True)
    var = waveform.var(axis=-1, keepdims=True)
    return (waveform - mean) / jnp.sqrt(var + eps)

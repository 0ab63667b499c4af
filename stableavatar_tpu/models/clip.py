"""CLIP (XLM-Roberta ViT-H/14) visual tower — the reference image encoder.

Reference: `wan/models/wan_image_encoder.py:212-305` (`VisionTransformer`)
with the runtime config of `clip_xlm_roberta_vit_h_14` (`:473-501`): dim 1280,
16 heads, 32 layers, patch 14, pool 'token', pre-norm ViT, exact GELU.  The
runtime uses `use_31_block=True` (`:527`): features are taken after all but
the final transformer block and returned un-normalized — [B, 257, 1280].

The text tower (XLM-Roberta) is unused at runtime (SURVEY.md §2.1) and is not
ported; log-it scale / text head are likewise inventory-only.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from stableavatar_tpu.config import CLIPConfig
from stableavatar_tpu.models.vocal_projector import _linear, apply_linear
from stableavatar_tpu.ops.attention import attention
from stableavatar_tpu.ops.norms import layer_norm


def init_clip_visual(key: jax.Array, cfg: CLIPConfig = CLIPConfig()):
    ks = jax.random.split(key, 6 + cfg.vision_layers)
    d = cfg.vision_dim
    gain = 1.0 / jnp.sqrt(d)

    def block(k):
        bk = jax.random.split(k, 4)
        return {
            "norm1": {"w": jnp.ones((d,)), "b": jnp.zeros((d,))},
            "attn": {
                "qkv": _linear(bk[0], d, d * 3),
                "proj": _linear(bk[1], d, d),
            },
            "norm2": {"w": jnp.ones((d,)), "b": jnp.zeros((d,))},
            "mlp": {
                "fc1": _linear(bk[2], d, d * cfg.mlp_ratio),
                "fc2": _linear(bk[3], d * cfg.mlp_ratio, d),
            },
        }

    patch_in = 3 * cfg.patch_size * cfg.patch_size
    return {
        # pre-norm ViT: patch conv has no bias (wan_image_encoder.py:251-257)
        "patch_embedding": {"w": jax.random.normal(ks[0], (patch_in, d)) * 0.02},
        "cls_embedding": gain * jax.random.normal(ks[1], (1, 1, d)),
        "pos_embedding": gain * jax.random.normal(ks[2], (1, cfg.num_tokens, d)),
        "pre_norm": {"w": jnp.ones((d,)), "b": jnp.zeros((d,))},
        "blocks": [block(k) for k in ks[6:]],
    }


def _vit_block(p, x, num_heads, eps):
    b, l, d = x.shape
    hd = d // num_heads
    h = layer_norm(x, p["norm1"]["w"], p["norm1"]["b"], eps)
    qkv = apply_linear(p["attn"]["qkv"], h).reshape(b, l, 3, num_heads, hd)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    o = attention(q, k, v).reshape(b, l, d)
    x = x + apply_linear(p["attn"]["proj"], o)

    h = layer_norm(x, p["norm2"]["w"], p["norm2"]["b"], eps)
    h = apply_linear(p["mlp"]["fc2"], jax.nn.gelu(apply_linear(p["mlp"]["fc1"], h), approximate=False))
    return x + h


def clip_visual_forward(
    params, cfg: CLIPConfig, images: jnp.ndarray, use_31_block: bool = True
) -> jnp.ndarray:
    """images [B, 3, H, W] normalized with the CLIP mean/std -> [B, 257, dim].

    H == W == cfg.image_size (callers resize beforehand; see
    `preprocess_reference_image`)."""
    b = images.shape[0]
    p = cfg.patch_size
    x = images.reshape(b, 3, cfg.image_size // p, p, cfg.image_size // p, p)
    x = x.transpose(0, 2, 4, 1, 3, 5).reshape(b, cfg.num_patches, -1)
    x = apply_linear(params["patch_embedding"], x)

    cls = jnp.broadcast_to(params["cls_embedding"].astype(x.dtype), (b, 1, x.shape[-1]))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embedding"].astype(x.dtype)
    x = layer_norm(x, params["pre_norm"]["w"], params["pre_norm"]["b"], cfg.eps)

    blocks = params["blocks"][:-1] if use_31_block else params["blocks"]
    for bp in blocks:
        x = _vit_block(bp, x, cfg.vision_heads, cfg.eps)
    return x



# jitted alias for host-level callers (one compiled program per
# geometry instead of per-op eager dispatch)
clip_visual_forward_jit = jax.jit(clip_visual_forward, static_argnames=("cfg", "use_31_block"))

def preprocess_reference_image(image: jnp.ndarray, cfg: CLIPConfig = CLIPConfig()):
    """[B, 3, H, W] in [-1, 1] -> resized 224² and CLIP-normalized.

    Mirrors `CLIPModel.forward` (`wan_image_encoder.py:516-528`): bicubic
    resize, rescale to [0,1], normalize by CLIP mean/std."""
    b = image.shape[0]
    x = jax.image.resize(
        image.astype(jnp.float32),
        (b, 3, cfg.image_size, cfg.image_size),
        method="cubic",
    )
    x = x * 0.5 + 0.5
    mean = jnp.asarray(cfg.image_mean)[None, :, None, None]
    std = jnp.asarray(cfg.image_std)[None, :, None, None]
    return (x - mean) / std

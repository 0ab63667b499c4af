"""Timestep-aware audio adapter ("vocal projector").

Re-designs the reference `FantasyTalkingVocalCondition{1B,14B}Model`
(`wan/models/vocal_projector_fantasy_1B.py:402-450`,
`vocal_projector_fantasy_14B.py:388-397`) TPU-first:

- The audio-window split (`split_audio_sequence` / `split_tensor_with_padding`,
  `wan/models/vocal_projector_fantasy.py:39-131`) is pure index arithmetic on
  static values (audio length, frame count), so it is computed on the host
  with numpy once per shape and becomes a single gather + mask on device —
  no dynamic shapes, no per-window Python loops under jit.
- Blocks are pure functions over pytree params; "self" path is (faithfully to
  the reference, `vocal_projector_fantasy_1B.py:340-347`) a modulation-only
  residual with *no* attention; cross-attention sends audio queries against
  the per-latent-frame DiT tokens.

Window semantics (verified against the reference formulas in
tests/test_vocal_projector.py): each latent frame f gets a window of audio
tokens centered on its video frames, expanded by ±4 tokens, with valid tokens
left-aligned and zero right-padding; `k_lens[f]` counts the valid tokens.
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from stableavatar_tpu.config import DiTConfig
from stableavatar_tpu.ops.attention import attention
from stableavatar_tpu.ops.norms import layer_norm, rms_norm


# ---------------------------------------------------------------------------
# window split (host-side, static)
# ---------------------------------------------------------------------------


def split_audio_sequence(audio_len: int, num_frames: int = 81):
    """Index ranges [start, end] (inclusive) per latent frame.

    Mirrors reference `split_audio_sequence`
    (`wan/models/vocal_projector_fantasy.py:39-78`) including the first-window
    negative-range adjustment.
    """
    tokens_per_frame = audio_len / num_frames
    half_tokens = int(tokens_per_frame * 4 / 2)

    pos_indices = []
    for i in range(int((num_frames - 1) / 4) + 1):
        if i == 0:
            pos_indices.append(0)
        else:
            start_token = tokens_per_frame * ((i - 1) * 4 + 1)
            end_token = tokens_per_frame * (i * 4 + 1)
            center_token = int((start_token + end_token) / 2) - 1
            pos_indices.append(center_token)

    ranges = [[idx - half_tokens, idx + half_tokens] for idx in pos_indices]
    if len(ranges) > 1:
        ranges[0] = [-(half_tokens * 2 - ranges[1][0]), ranges[1][0]]
    return ranges


@lru_cache(maxsize=64)
def window_plan(
    audio_len: int, num_frames: int = 81, expand: int = 4
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """Static gather plan: (gather_idx [F, Lw], mask [F, Lw], k_lens [F], Lw).

    Windows hold their in-bounds tokens left-aligned followed by zero padding
    (matching `split_tensor_with_padding`,
    `wan/models/vocal_projector_fantasy.py:81-131`).
    """
    ranges = split_audio_sequence(audio_len, num_frames)
    ranges = [[s - expand, e + expand] for s, e in ranges]
    lw = max(e - s + 1 for s, e in ranges)

    f = len(ranges)
    gather = np.zeros((f, lw), dtype=np.int32)
    mask = np.zeros((f, lw), dtype=np.float32)
    k_lens = np.zeros((f,), dtype=np.int32)
    for i, (s, e) in enumerate(ranges):
        valid_start = max(s, 0)
        valid_end = min(e, audio_len - 1)
        n_valid = max(valid_end - valid_start + 1, 0)
        k_lens[i] = n_valid
        idx = valid_start + np.arange(lw)
        gather[i] = np.clip(idx, 0, audio_len - 1)
        mask[i, :n_valid] = 1.0
    return gather, mask, k_lens, lw


def split_windows(audio: jnp.ndarray, num_frames: int, expand: int = 4):
    """[B, L, C] audio tokens -> ([B, F, Lw, C] windows, k_lens [F])."""
    b, l, c = audio.shape
    gather, mask, k_lens, lw = window_plan(l, num_frames, expand)
    win = jnp.take(audio, jnp.asarray(gather).reshape(-1), axis=1)
    win = win.reshape(b, gather.shape[0], lw, c)
    win = win * jnp.asarray(mask)[None, :, :, None].astype(audio.dtype)
    return win, jnp.asarray(k_lens)


# ---------------------------------------------------------------------------
# params
# ---------------------------------------------------------------------------


def _linear(key, d_in, d_out, bias=True, init="xavier", zero=False):
    wkey, _ = jax.random.split(key)
    if zero:
        w = jnp.zeros((d_in, d_out), jnp.float32)
    elif init == "xavier":
        lim = math.sqrt(6.0 / (d_in + d_out))
        w = jax.random.uniform(wkey, (d_in, d_out), jnp.float32, -lim, lim)
    else:
        w = jax.random.normal(wkey, (d_in, d_out), jnp.float32) * 0.02
    p = {"w": w}
    if bias:
        p["b"] = jnp.zeros((d_out,), jnp.float32)
    return p


def apply_linear(p, x):
    if "w8" in p:  # int8 COMPUTE quant (W8A8 MXU path, utils/quantization.py)
        from stableavatar_tpu.utils.quantization import int8_linear

        return int8_linear(x, p["w8"], p.get("b"))
    w = p["w"]
    if isinstance(w, dict):  # int8-quantized storage (utils/quantization.py)
        w = w["q"].astype(x.dtype) * w["s"].astype(x.dtype)
    y = x @ w.astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def init_vocal_projector(key: jax.Array, cfg: DiTConfig):
    """Parameter pytree for the vocal projector.

    1B: proj 768 -> 1536 (no bias) + LN.  14B: 2-stage 768 -> hidden -> dim
    (`vocal_projector_fantasy_14B.py:388-397`).
    """
    keys = jax.random.split(key, 16)
    vd = cfg.audio_proj_dim
    p = {}
    if cfg.audio_proj_hidden is None:
        # 1B: Linear(768 -> vd, no bias) + LN (vocal_projector_fantasy_1B.py:389-399)
        p["proj"] = {
            "fc": _linear(keys[0], cfg.audio_in_dim, vd, bias=False),
            "norm": {"w": jnp.ones((vd,)), "b": jnp.zeros((vd,))},
        }
    else:
        # 14B: Linear(768->2048,no bias)+LN + Linear(2048->5120,no bias)+LN,
        # no activation between (vocal_projector_fantasy_14B.py:384-398)
        h = cfg.audio_proj_hidden
        p["proj"] = {
            "fc1": _linear(keys[0], cfg.audio_in_dim, h, bias=False),
            "norm1": {"w": jnp.ones((h,)), "b": jnp.zeros((h,))},
            "fc2": _linear(keys[1], h, vd, bias=False),
            "norm": {"w": jnp.ones((vd,)), "b": jnp.zeros((vd,))},
        }

    def block(k):
        ks = jax.random.split(k, 8)
        return {
            "norm3": {"w": jnp.ones((vd,)), "b": jnp.zeros((vd,))},
            "cross_attn": {
                "q": _linear(ks[0], vd, vd),
                "k": _linear(ks[1], cfg.dim, vd),
                "v": _linear(ks[2], cfg.dim, vd),
                "o": _linear(ks[3], vd, vd),
                "norm_q": {"w": jnp.ones((vd,))},
                "norm_k": {"w": jnp.ones((vd,))},
            },
            "ffn": {
                "fc1": _linear(ks[4], vd, vd * 2),
                "fc2": _linear(ks[5], vd * 2, vd),
            },
            "modulation": jax.random.normal(ks[6], (1, 6, vd)) / vd**0.5,
        }

    p["blocks"] = [block(keys[2 + i]) for i in range(cfg.vocal_num_layers)]
    p["final_head"] = {
        "final_proj": _linear(keys[10], vd, vd),
        "modulation": jax.random.normal(keys[11], (1, 2, vd)) / vd**0.5,
    }
    return p


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _vocal_cross_attention(p, x, latents, num_heads, num_frames, eps):
    """Audio queries attend to the DiT latent tokens of their own frame.

    Reference `VocalCrossAttention.forward`
    (`vocal_projector_fantasy_1B.py:245-277`): q/k/v reshaped to
    [B*F, ., heads, head_dim]; no masking.
    """
    b = x.shape[0]
    vd = x.shape[-1]
    d = vd // num_heads

    q = rms_norm(apply_linear(p["q"], x), p["norm_q"]["w"], eps).astype(x.dtype)
    k = rms_norm(apply_linear(p["k"], latents), p["norm_k"]["w"], eps).astype(x.dtype)
    v = apply_linear(p["v"], latents).astype(x.dtype)

    q = q.reshape(b * num_frames, -1, num_heads, d)
    k = k.reshape(b * num_frames, -1, num_heads, d)
    v = v.reshape(b * num_frames, -1, num_heads, d)
    out = attention(q, k, v)
    out = out.reshape(b, -1, vd)
    return apply_linear(p["o"], out)


def _vocal_block(p, x, e0, latents, num_heads, num_frames, eps):
    """One VocalAttentionBlock (`vocal_projector_fantasy_1B.py:321-362`)."""
    e = p["modulation"].astype(e0.dtype) + e0  # [B, 6, vd]
    e = [e[:, i : i + 1] for i in range(6)]

    temp = layer_norm(x, eps=eps) * (1 + e[1]) + e[0]
    x = x + temp * e[2]

    normed = layer_norm(x, p["norm3"]["w"], p["norm3"]["b"], eps=eps)
    x = x + _vocal_cross_attention(
        p["cross_attn"], normed, latents, num_heads, num_frames, eps
    )

    temp = layer_norm(x, eps=eps) * (1 + e[4]) + e[3]
    y = apply_linear(p["ffn"]["fc2"], jax.nn.gelu(apply_linear(p["ffn"]["fc1"], temp)))
    return x + y * e[5]


def apply_vocal_projector(
    params,
    cfg: DiTConfig,
    vocal_embeddings: jnp.ndarray,  # [B, L_audio, audio_in_dim]
    latents: jnp.ndarray,  # [B, L_tokens, dim] (DiT token stream)
    e0: jnp.ndarray,  # [B, 6, dim]
    e: jnp.ndarray,  # [B, dim]
    video_sample_n_frames: int = 81,
):
    """Returns (vocal_context [B, F, Lw, vd], k_lens [F] int32).

    Reference `FantasyTalkingVocalCondition1BModel.forward`
    (`vocal_projector_fantasy_1B.py:433-450`).
    """
    pp = params["proj"]
    if "fc" in pp:
        x = apply_linear(pp["fc"], vocal_embeddings)
    else:
        x = apply_linear(pp["fc1"], vocal_embeddings)
        x = layer_norm(x, pp["norm1"]["w"], pp["norm1"]["b"], eps=1e-5)
        x = apply_linear(pp["fc2"], x)
    x = layer_norm(x, pp["norm"]["w"], pp["norm"]["b"], eps=1e-5)

    win, k_lens = split_windows(x, video_sample_n_frames, expand=4)
    b, f, lw, vd = win.shape
    x = win.reshape(b, f * lw, vd)

    # The reference projects e0/e (dim == vd for 1B/14B: audio_proj_dim == dim)
    for bp in params["blocks"]:
        x = _vocal_block(bp, x, e0, latents, cfg.vocal_num_heads, f, cfg.eps)

    hm = params["final_head"]["modulation"].astype(e.dtype) + e[:, None]
    h0, h1 = hm[:, 0:1], hm[:, 1:2]
    x = apply_linear(params["final_head"]["final_proj"], layer_norm(x, eps=cfg.eps) * (1 + h1) + h0)
    return x.reshape(b, f, lw, vd), k_lens

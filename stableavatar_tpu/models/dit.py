"""Wan2.1 DiT backbone (1.3B / 14B), TPU-native.

Re-designs the reference `WanTransformer3DFantasyModel`
(`wan/models/wan_fantasy_transformer3d_1B.py:741-1159`,
`wan_fantasy_transformer3d_14B.py`) as pure functions over a pytree of
parameters:

- the patch embedding (Conv3d with kernel == stride, `:830`) is a reshape +
  one MXU matmul — no conv needed;
- the 30/40 identical blocks run under `jax.lax.scan` over stacked block
  params (single compile of one block; optional `jax.checkpoint` remat for
  training);
- 3D RoPE is a precomputed cos/sin table (see `ops/rope.py`), adaLN
  modulation is plain broadcast arithmetic XLA fuses into the matmuls;
- the triple cross-attention (text + CLIP-image + zero-init vocal branch,
  `:504-605`) keeps the contexts separate instead of concat-then-slice;
- CFG triple-batching ([uncond, drop-audio, cond]) is a plain batch of 3
  which the mesh can shard over 'dp'.

Note on `k_lens`: the reference 1B file force-disables flash-attn
(`:45-46`) so its SDPA fallback *ignores* key-length masks (`:190-193`),
while the 14B (flash) path honors them.  We honor them everywhere — the
mathematically-intended semantics.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from stableavatar_tpu.config import DiTConfig
from stableavatar_tpu.ops.attention import attention
from stableavatar_tpu.ops.embeddings import sinusoidal_embedding_1d
from stableavatar_tpu.ops.norms import layer_norm, rms_norm
from stableavatar_tpu.ops.rope import RopeFreqs, pack_split, rope_apply, rope_freqs_3d
from stableavatar_tpu.models.vocal_projector import (
    apply_linear,
    apply_vocal_projector,
    init_vocal_projector,
    _linear,
)
from stableavatar_tpu.parallel.mesh import maybe_constrain


def gelu_tanh(x):
    return jax.nn.gelu(x, approximate=True)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _ln_affine(dim):
    return {"w": jnp.ones((dim,)), "b": jnp.zeros((dim,))}


def init_block(key, cfg: DiTConfig):
    ks = jax.random.split(key, 20)
    d = cfg.dim
    return {
        "self_attn": {
            "q": _linear(ks[0], d, d),
            "k": _linear(ks[1], d, d),
            "v": _linear(ks[2], d, d),
            "o": _linear(ks[3], d, d),
            "norm_q": {"w": jnp.ones((d,))},
            "norm_k": {"w": jnp.ones((d,))},
        },
        "norm3": _ln_affine(d),
        "cross_attn": {
            "q": _linear(ks[4], d, d),
            "k": _linear(ks[5], d, d),
            "v": _linear(ks[6], d, d),
            "o": _linear(ks[7], d, d),
            "norm_q": {"w": jnp.ones((d,))},
            "norm_k": {"w": jnp.ones((d,))},
            "k_img": _linear(ks[8], d, d),
            "v_img": _linear(ks[9], d, d),
            "norm_k_img": {"w": jnp.ones((d,))},
            # zero-init vocal branch (wan_fantasy_transformer3d_1B.py:526-531)
            "k_vocal": _linear(ks[10], d, d, zero=True),
            "v_vocal": _linear(ks[11], d, d, zero=True),
        },
        "ffn": {
            "fc1": _linear(ks[12], d, cfg.ffn_dim),
            "fc2": _linear(ks[13], cfg.ffn_dim, d),
        },
        "modulation": jax.random.normal(ks[14], (1, 6, d)) / d**0.5,
    }


def init_dit(key: jax.Array, cfg: DiTConfig):
    """Full parameter pytree.  Block params are stacked on a leading layer
    axis for `lax.scan`."""
    ks = jax.random.split(key, 12)
    d = cfg.dim
    pt, ph, pw = cfg.patch_size
    patch_in = cfg.in_dim * pt * ph * pw

    blocks = [init_block(k, cfg) for k in jax.random.split(ks[0], cfg.num_layers)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)

    params = {
        "patch_embedding": _linear(ks[1], patch_in, d),
        "text_embedding": {
            "fc1": _linear(ks[2], cfg.text_dim, d, init="normal"),
            "fc2": _linear(ks[3], d, d, init="normal"),
        },
        "time_embedding": {
            "fc1": _linear(ks[4], cfg.freq_dim, d, init="normal"),
            "fc2": _linear(ks[5], d, d, init="normal"),
        },
        "time_projection": {"fc": _linear(ks[6], d, d * 6)},
        "img_emb": {
            "norm1": _ln_affine(cfg.clip_dim),
            "fc1": _linear(ks[7], cfg.clip_dim, cfg.clip_dim),
            "fc2": _linear(ks[8], cfg.clip_dim, d),
            "norm2": _ln_affine(d),
        },
        "blocks": stacked,
        "head": {
            # zero-init output projection (reference init_weights, :1208)
            "head": _linear(ks[9], d, math.prod(cfg.patch_size) * cfg.out_dim, zero=True),
            "modulation": jax.random.normal(ks[10], (1, 2, d)) / d**0.5,
        },
        "vocal_projector": init_vocal_projector(ks[11], cfg),
    }
    return params


def cast_params(params, dtype=jnp.bfloat16):
    """Cast floating-point array leaves (bf16 for TPU inference/training);
    python scalars (e.g. VAE norm scales) pass through."""
    return jax.tree.map(
        lambda x: x.astype(dtype)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
        else x,
        params,
    )


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _self_attention(p, x, freqs: RopeFreqs, num_heads, eps, rope_packed=None,
                    quant="none", attn_impl="ulysses"):
    """WanSelfAttention (`wan_fantasy_transformer3d_1B.py:358-413`).

    With `rope_packed` (fast path, `utils/fastpath.py`), q/k weights are in
    split-pair layout and the rotation is fused into the flash kernel;
    otherwise rope is applied out-of-kernel from the interleaved tables.

    attn_impl selects the sequence-parallel strategy on an 'sp' mesh axis
    (reference: xfuser ulysses x ring, `inference.py:445-449`):
    - "ulysses": reshard tokens->heads (one all-to-all pair) and run full
      attention per head group — the right choice while one device can hold
      the full K/V of a head subset;
    - "ring": keep tokens sharded, rotate K/V shards with ppermute while
      accumulating combinable flash partials (`ops/ring_attention.py`) —
      for 14B/long-context where K/V per head exceeds one device.
    """
    b, l, dim = x.shape
    d = dim // num_heads
    q = rms_norm(apply_linear(p["q"], x), p["norm_q"]["w"], eps).reshape(b, l, num_heads, d)
    k = rms_norm(apply_linear(p["k"], x), p["norm_k"]["w"], eps).reshape(b, l, num_heads, d)
    v = apply_linear(p["v"], x).reshape(b, l, num_heads, d)
    if rope_packed is None:
        # rope_apply returns fp32; cast back below keeps the MXU in bf16
        q = rope_apply(q, freqs).astype(x.dtype)
        k = rope_apply(k, freqs).astype(x.dtype)
    elif attn_impl == "ring":
        # ring needs rope applied before K/V start rotating (global
        # positions); split layout, out-of-kernel
        from stableavatar_tpu.ops.rope import rope_apply_split

        q = rope_apply_split(q, rope_packed).astype(x.dtype)
        k = rope_apply_split(k, rope_packed).astype(x.dtype)
        rope_packed = None
    else:
        q = q.astype(x.dtype)
        k = k.astype(x.dtype)

    if attn_impl == "ring":
        from stableavatar_tpu.parallel.mesh import current_mesh

        mesh = current_mesh()
        if mesh is not None and mesh.shape.get("sp", 1) > 1:
            from functools import partial as _partial

            from jax.sharding import PartitionSpec as P

            from stableavatar_tpu.ops.ring_attention import ring_attention

            shard_map = getattr(jax, "shard_map", None)
            # jax.shard_map takes check_vma; the experimental fallback for
            # older jax only knows the check_rep spelling of the same knob
            check_kw = {"check_vma": False}
            if shard_map is None:  # older jax
                from jax.experimental.shard_map import shard_map

                check_kw = {"check_rep": False}
            fn = shard_map(
                _partial(ring_attention, axis_name="sp", quant=quant),
                mesh=mesh,
                in_specs=(P(None, "sp"), P(None, "sp"), P(None, "sp")),
                out_specs=P(None, "sp"),
                **check_kw,
            )
            out = fn(q, k, v)
            return apply_linear(p["o"], out.reshape(b, l, dim))
        # no sp mesh: fall through to plain attention

    # Ulysses-style SP: reshard tokens->heads for full-sequence attention;
    # GSPMD compiles the reshard into an ICI all-to-all (replaces
    # xFuserLongContextAttention, wan/dist/wan_xfuser.py:72-115).
    q = maybe_constrain(q, "dp", None, "sp", None)
    k = maybe_constrain(k, "dp", None, "sp", None)
    v = maybe_constrain(v, "dp", None, "sp", None)
    out = attention(q, k, v, rope=rope_packed, quant=quant)
    out = maybe_constrain(out, "dp", "sp", None, None)
    return apply_linear(p["o"], out.reshape(b, l, dim))


def _cross_attention(
    p,
    x,
    context_text,
    context_img,
    vocal_context,
    vocal_k_lens,
    num_heads,
    latents_num_frames,
    eps,
    quant="none",
    fused=False,
):
    """WanI2VTalkingCrossAttention (`wan_fantasy_transformer3d_1B.py:504-605`):
    text + image + per-frame vocal branches, summed."""
    b, l, dim = x.shape
    d = dim // num_heads
    f = latents_num_frames

    dt = x.dtype
    q = rms_norm(apply_linear(p["q"], x), p["norm_q"]["w"], eps).astype(dt)
    q = q.reshape(b, l, num_heads, d)

    k = rms_norm(apply_linear(p["k"], context_text), p["norm_k"]["w"], eps).astype(dt)
    v = apply_linear(p["v"], context_text)
    k = k.reshape(b, -1, num_heads, d)
    v = v.reshape(b, -1, num_heads, d)

    k_img = rms_norm(apply_linear(p["k_img"], context_img), p["norm_k_img"]["w"], eps).astype(dt)
    v_img = apply_linear(p["v_img"], context_img)
    k_img = k_img.reshape(b, -1, num_heads, d)
    v_img = v_img.reshape(b, -1, num_heads, d)

    # NOTE: batching text+img into one call (stacked batch + per-row k_lens)
    # was tried and measured SLOWER (+0.07 s/step): duplicating q for the
    # stacked batch costs more HBM traffic than the saved kernel launch
    # (scripts/bench_dit_step.py).  The fused dual-context kernel
    # (ops/cross_attention.py) instead reads q ONCE and computes both
    # segmented softmaxes in one pass — inference fast path only (no VJP).
    if fused:
        import os as _os

        fused = _os.environ.get("STABLEAVATAR_DUAL_CROSS") != "off"
    if fused:
        from stableavatar_tpu.ops.cross_attention import dual_context_attention

        txt_img = dual_context_attention(q, k, v, k_img, v_img)
    else:
        txt = attention(q, k, v, quant=quant)
        img = attention(q, k_img, v_img, quant=quant)
        txt_img = txt + img

    # vocal branch: per-latent-frame attention (q regrouped to [b*f, l/f, ...]);
    # clip-level mode (vocal frame dim == 1) is one global pass instead
    # (reference `wan_fantasy_transformer3d_1B.py:575-596`)
    if vocal_context.shape[1] == 1:
        vk = apply_linear(p["k_vocal"], vocal_context[:, 0]).reshape(b, -1, num_heads, d)
        vv = apply_linear(p["v_vocal"], vocal_context[:, 0]).reshape(b, -1, num_heads, d)
        voc = attention(q, vk, vv)
    else:
        vq = q.reshape(b * f, l // f, num_heads, d)
        vk = apply_linear(p["k_vocal"], vocal_context).reshape(b * f, -1, num_heads, d)
        vv = apply_linear(p["v_vocal"], vocal_context).reshape(b * f, -1, num_heads, d)
        klens = None
        if vocal_k_lens is not None:
            klens = jnp.tile(vocal_k_lens, b)
        voc = attention(vq, vk, vv, k_lens=klens).reshape(b, l, num_heads, d)

    out = txt_img.reshape(b, l, dim) + voc.reshape(b, l, dim)
    return apply_linear(p["o"], out)


def apply_block(
    p,
    x,
    e0,
    context_text,
    context_img,
    vocal_context,
    vocal_k_lens,
    freqs: RopeFreqs,
    cfg: DiTConfig,
    latents_num_frames: int,
    rope_packed=None,
    attn_quant="none",
    attn_impl="ulysses",
    fuse_cross=False,
):
    """WanAttentionBlock (`wan_fantasy_transformer3d_1B.py:650-695`)."""
    e = p["modulation"].astype(e0.dtype) + e0  # [B, 6, dim]
    e = [e[:, i : i + 1] for i in range(6)]

    temp = (layer_norm(x, eps=cfg.eps) * (1 + e[1]) + e[0]).astype(x.dtype)
    y = _self_attention(
        p["self_attn"], temp, freqs, cfg.num_heads, cfg.eps,
        rope_packed=rope_packed, quant=attn_quant, attn_impl=attn_impl,
    )
    x = x + y * e[2]

    normed = layer_norm(x, p["norm3"]["w"], p["norm3"]["b"], eps=cfg.eps)
    # cross-attention stays bf16: at Lk = 512/257 the int8 prep overhead
    # exceeds the MXU saving (measured, scripts/bench_dit_step.py)
    x = x + _cross_attention(
        p["cross_attn"],
        normed.astype(x.dtype),
        context_text,
        context_img,
        vocal_context,
        vocal_k_lens,
        cfg.num_heads,
        latents_num_frames,
        cfg.eps,
        fused=fuse_cross,
    )

    temp = (layer_norm(x, eps=cfg.eps) * (1 + e[4]) + e[3]).astype(x.dtype)
    y = apply_linear(p["ffn"]["fc2"], gelu_tanh(apply_linear(p["ffn"]["fc1"], temp)))
    return x + y * e[5]


def patchify(x: jnp.ndarray, patch_size: Tuple[int, int, int]) -> jnp.ndarray:
    """[B, C, F, H, W] -> [B, F*(H/ph)*(W/pw), C*pt*ph*pw] with channel-major
    patch layout matching Conv3d(kernel=stride=patch) weight order."""
    b, c, f, h, w = x.shape
    pt, ph, pw = patch_size
    x = x.reshape(b, c, f // pt, pt, h // ph, ph, w // pw, pw)
    # -> [B, f, h, w, C, pt, ph, pw]
    x = x.transpose(0, 2, 4, 6, 1, 3, 5, 7)
    return x.reshape(b, (f // pt) * (h // ph) * (w // pw), c * pt * ph * pw)


def unpatchify(
    x: jnp.ndarray, grid: Tuple[int, int, int], patch_size: Tuple[int, int, int], out_dim: int
) -> jnp.ndarray:
    """[B, L, pt*ph*pw*C] -> [B, C, F, H, W].

    Matches reference `unpatchify` einsum 'fhwpqrc->cfphqwr'
    (`wan_fantasy_transformer3d_1B.py:1161-1184`)."""
    b = x.shape[0]
    f, h, w = grid
    pt, ph, pw = patch_size
    x = x.reshape(b, f, h, w, pt, ph, pw, out_dim)
    x = jnp.einsum("bfhwpqrc->bcfphqwr", x)
    return x.reshape(b, out_dim, f * pt, h * ph, w * pw)


def time_embeddings(params, cfg: DiTConfig, t: jnp.ndarray, dtype):
    """e [B, dim] and e0 [B, 6, dim] (fp32 internals, reference `:986-990`)."""
    emb = sinusoidal_embedding_1d(cfg.freq_dim, t.astype(jnp.float32))
    te = params["time_embedding"]
    e = apply_linear(te["fc2"], jax.nn.silu(apply_linear(te["fc1"], emb.astype(jnp.float32))))
    e0 = apply_linear(params["time_projection"]["fc"], jax.nn.silu(e))
    e0 = e0.reshape(e0.shape[0], 6, cfg.dim)
    return e.astype(dtype), e0.astype(dtype)


def encode_context(params, cfg: DiTConfig, text_embeds, clip_fea, dtype):
    """Text MLP + CLIP-image MLPProj (reference `:992-1002`).

    text_embeds: [B, text_len, text_dim] zero-padded to text_len.
    clip_fea: [B, 257, clip_dim].
    Returns (context_text [B, text_len, dim], context_img [B, 257, dim]).
    """
    tp = params["text_embedding"]
    context_text = apply_linear(
        tp["fc2"], gelu_tanh(apply_linear(tp["fc1"], text_embeds.astype(dtype)))
    )

    ip = params["img_emb"]
    h = layer_norm(clip_fea.astype(dtype), ip["norm1"]["w"], ip["norm1"]["b"], eps=1e-5)
    h = jax.nn.gelu(apply_linear(ip["fc1"], h), approximate=False)
    h = apply_linear(ip["fc2"], h)
    context_img = layer_norm(h, ip["norm2"]["w"], ip["norm2"]["b"], eps=1e-5)
    return context_text, context_img


def dit_prologue(
    params,
    cfg: DiTConfig,
    x: jnp.ndarray,
    t: jnp.ndarray,
    text_embeds: jnp.ndarray,
    clip_fea: jnp.ndarray,
    y: jnp.ndarray,
    vocal_embeddings: jnp.ndarray,
    video_sample_n_frames: int = 81,
    vocal_cfg_tile: bool = False,
    is_clip_level_modeling: bool = False,
    freqs: Optional[RopeFreqs] = None,
    rope_split: bool = False,
    honor_vocal_k_lens: bool = True,
):
    """Everything before the block stack: patch embed, time/text/img
    embeddings, vocal projector.  Shared by the in-memory forward (below)
    and the host-streamed forward (`models/streaming.py`), so the two paths
    are numerically identical by construction.

    Returns (tokens, e, e0, context_text, context_img, vocal_context,
    vocal_k_lens, freqs, rope_packed, grid, latents_num_frames)."""
    b, _, f, h, w = x.shape
    pt, ph, pw = cfg.patch_size
    grid = (f // pt, h // ph, w // pw)
    dtype = x.dtype

    xin = jnp.concatenate([x, y.astype(dtype)], axis=1)
    tokens = apply_linear(params["patch_embedding"], patchify(xin, cfg.patch_size))
    # activation sequence sharding (replaces the reference's token chunk +
    # all-gather, wan_fantasy_transformer3d_1B.py:1017-1019,1150-1151)
    tokens = maybe_constrain(tokens, "dp", "sp", None)

    if freqs is None:
        freqs = rope_freqs_3d(
            grid, cfg.head_dim, riflex_k=cfg.riflex_k,
            riflex_L_test=cfg.riflex_L_test, riflex_scale=cfg.riflex_scale,
        )
    rope_packed = pack_split(freqs) if rope_split else None

    e, e0 = time_embeddings(params, cfg, t, dtype)
    context_text, context_img = encode_context(params, cfg, text_embeds, clip_fea, dtype)

    vocal_embeddings = vocal_embeddings.astype(dtype)
    if vocal_cfg_tile:
        vocal_context, vocal_k_lens = apply_vocal_projector(
            params["vocal_projector"],
            cfg,
            vocal_embeddings[-1:],
            tokens[-1:],
            e0[-1:],
            e[-1:],
            video_sample_n_frames,
        )
        vocal_context = jnp.concatenate(
            [jnp.zeros_like(vocal_context), vocal_context, vocal_context], axis=0
        )
    else:
        vocal_context, vocal_k_lens = apply_vocal_projector(
            params["vocal_projector"], cfg, vocal_embeddings, tokens, e0, e,
            video_sample_n_frames,
        )

    if not honor_vocal_k_lens:
        vocal_k_lens = None

    latents_num_frames = (video_sample_n_frames - 1) // 4 + 1
    if is_clip_level_modeling:
        # clip-level (`:1011-1015`): all windows concatenated into one global
        # vocal context — kept as [B, 1, F*Lw, C]; the cross-attention runs a
        # single global pass (equivalent to the reference's 3-dim branch)
        bvc = vocal_context.shape[0]
        vocal_context = vocal_context.reshape(bvc, 1, -1, vocal_context.shape[-1])
        vocal_k_lens = None

    return (tokens, e, e0, context_text, context_img, vocal_context,
            vocal_k_lens, freqs, rope_packed, grid, latents_num_frames)


def dit_forward(
    params,
    cfg: DiTConfig,
    x: jnp.ndarray,  # [B, 16, F, H, W] noisy latents
    t: jnp.ndarray,  # [B] timesteps
    text_embeds: jnp.ndarray,  # [B, text_len, text_dim]
    clip_fea: jnp.ndarray,  # [B, 257, clip_dim]
    y: jnp.ndarray,  # [B, 20, F, H, W] cond (mask + masked-video latents)
    vocal_embeddings: jnp.ndarray,  # [Bv, L_audio, audio_in_dim]
    video_sample_n_frames: int = 81,
    vocal_cfg_tile: bool = False,
    is_clip_level_modeling: bool = False,
    freqs: Optional[RopeFreqs] = None,
    remat: bool = False,
    return_residual: bool = False,
    rope_split: bool = False,
    attn_quant: str = "none",
    attn_impl: str = "ulysses",
    honor_vocal_k_lens: bool = True,
    fuse_cross_attn: Optional[bool] = None,
) -> jnp.ndarray:
    """One denoise evaluation.  Returns velocity prediction [B, 16, F, H, W].

    Mirrors reference `forward` (`wan_fantasy_transformer3d_1B.py:928-1159`).
    `vocal_cfg_tile=True` reproduces the CFG triple path (`:1004-1007`): the
    projector runs on the last batch row only and the result is tiled as
    [zeros, v, v].

    `rope_split=True` requires params prepared by
    `utils/fastpath.py:prepare_fast_params` (split-pair q/k layout); rope is
    then fused into the flash kernel.  `attn_quant` in {"none","qk","qkpv"}
    selects the int8 MXU attention fast path (inference only).

    `fuse_cross_attn` selects the fused dual-context cross-attention kernel
    (ops/cross_attention.py; inference only — no VJP).  None = auto: fuse
    exactly when the int8 attention fast path is active (`attn_quant` set),
    which is the existing inference-only signal; training never sets it.

    `honor_vocal_k_lens=False` replicates the reference's torch-SDPA
    deployment bit-for-bit: its `attention()` wrapper DROPS the vocal
    padding masks on the SDPA fallback (`wan_fantasy_transformer3d_1B.py:
    190-193` — the path actually taken by the 1B model, which
    force-disables flash-attn at `:45-46`), so padded window positions
    attend to the k_vocal/v_vocal bias vectors.  Default True = the
    mathematically-intended masking (== the reference WITH flash-attn, the
    14B path).  Use False for frame-level parity against a reference run
    without flash-attn (scripts/parity_vs_torch.py).
    """
    (tokens, e, e0, context_text, context_img, vocal_context, vocal_k_lens,
     freqs, rope_packed, grid, latents_num_frames) = dit_prologue(
        params, cfg, x, t, text_embeds, clip_fea, y, vocal_embeddings,
        video_sample_n_frames=video_sample_n_frames,
        vocal_cfg_tile=vocal_cfg_tile,
        is_clip_level_modeling=is_clip_level_modeling,
        freqs=freqs, rope_split=rope_split,
        honor_vocal_k_lens=honor_vocal_k_lens,
    )

    fuse_cross = (attn_quant != "none" if fuse_cross_attn is None
                  else fuse_cross_attn)

    def body(tok, bp):
        out = apply_block(
            bp,
            tok,
            e0,
            context_text,
            context_img,
            vocal_context,
            vocal_k_lens,
            freqs,
            cfg,
            latents_num_frames,
            rope_packed=rope_packed,
            attn_quant=attn_quant,
            attn_impl=attn_impl,
            fuse_cross=fuse_cross,
        )
        return out, None

    if remat:
        body = jax.checkpoint(body)
    tokens_in = tokens
    tokens, _ = jax.lax.scan(body, tokens, params["blocks"])

    out = _apply_head(params, cfg, tokens, e, grid)
    if return_residual:
        # TeaCache residual: block-stack delta (wan_fantasy_..._1B.py:1100-1103)
        return out, tokens - tokens_in
    return out


def _apply_head(params, cfg: DiTConfig, tokens, e, grid):
    """Head + unpatchify (reference Head `:698-723`, unpatchify `:1161-1184`)."""
    hp = params["head"]
    hm = hp["modulation"].astype(e.dtype) + e[:, None]
    h0, h1 = hm[:, 0:1], hm[:, 1:2]
    out = apply_linear(hp["head"], layer_norm(tokens, eps=cfg.eps) * (1 + h1) + h0)
    return unpatchify(out.astype(jnp.float32), grid, cfg.patch_size, cfg.out_dim)


def dit_time_e0(params, cfg: DiTConfig, t: jnp.ndarray, dtype=jnp.bfloat16):
    """Just the modulated time embedding e0 — the TeaCache decision input
    (`wan_fantasy_transformer3d_1B.py:1024`)."""
    _, e0 = time_embeddings(params, cfg, t, dtype)
    return e0


def dit_forward_skip(
    params,
    cfg: DiTConfig,
    x: jnp.ndarray,
    t: jnp.ndarray,
    y: jnp.ndarray,
    residual: jnp.ndarray,  # [B, L, dim] cached block-stack delta
) -> jnp.ndarray:
    """TeaCache skip path: patch-embed + cached residual + head — no blocks
    (`wan_fantasy_transformer3d_1B.py:1047-1050`)."""
    b, _, f, h, w = x.shape
    pt, ph, pw = cfg.patch_size
    grid = (f // pt, h // ph, w // pw)
    dtype = x.dtype

    xin = jnp.concatenate([x, y.astype(dtype)], axis=1)
    tokens = apply_linear(params["patch_embedding"], patchify(xin, cfg.patch_size))
    e, _ = time_embeddings(params, cfg, t, dtype)
    tokens = tokens + residual.astype(tokens.dtype)
    return _apply_head(params, cfg, tokens, e, grid)

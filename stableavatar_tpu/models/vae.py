"""Causal 3D VAE ("Wan2.1_VAE") — TPU-native streaming implementation.

Re-designs the reference `AutoencoderKLWan` (`wan/models/wan_vae.py`) for
XLA/TPU:

- channels-last layout [B, T, H, W, C] (TPU conv-friendly) with conversion at
  the public API boundary;
- the mutable `feat_cache`/`feat_idx` streaming protocol
  (`wan_vae.py:104-163,205-223`) becomes an explicit pytree carry: every
  causal conv keeps its last 2 input frames; a zero-initialized cache is
  mathematically identical to the reference's first-chunk zero padding, and
  the 'Rep' upsample marker (`wan_vae.py:110-134`) reduces to "skip the time
  conv on the first chunk, then run the uniform rule with a zero cache"
  (equivalence proven in tests/test_vae.py against a torch replica);
- chunked streaming (encode in 1+4n frame chunks `wan_vae.py:519-547`, decode
  latent-frame-by-frame `:549-574`) is `jax.lax.scan` over the uniform chunks
  after a structurally-different first chunk — constant memory in clip
  length, one compile per (chunk shape).

Architecture facts (reference `_video_vae`, `wan_vae.py:598-616`): dim=96,
z=16, dim_mult (1,2,4,4), 2 res blocks, no attn scales except middle,
temporal down (False, True, True).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from stableavatar_tpu.config import VAEConfig

CACHE_T = 2


# ---------------------------------------------------------------------------
# primitive layers (channels-last)
# ---------------------------------------------------------------------------


def conv3d(x, w, b=None, stride=(1, 1, 1), padding="VALID"):
    """x [B,T,H,W,C], w [kt,kh,kw,I,O]."""
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=stride, padding=padding,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    if b is not None:
        out = out + b.astype(x.dtype)
    return out


def conv2d(x, w, b=None, stride=(1, 1), padding="SAME"):
    """x [N,H,W,C], w [kh,kw,I,O]."""
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=stride, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if b is not None:
        out = out + b.astype(x.dtype)
    return out


def channel_rms_norm(x, gamma, scale):
    """Reference `RMS_norm` (`wan_vae.py:42-57`): L2-normalize over channels
    (F.normalize semantics, eps=1e-12) * sqrt(C) * gamma."""
    xf = x.astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(xf * xf, axis=-1, keepdims=True))
    normed = xf / jnp.maximum(norm, 1e-12)
    return (normed * scale * gamma.astype(jnp.float32)).astype(x.dtype)


class _Cache:
    """Sequential cache allocator threading the per-conv carries in traversal
    order (replaces the reference's feat_cache list + feat_idx counter).

    A cache slot always holds exactly `keep` frames; zeros initially, which is
    mathematically identical to the reference's first-chunk zero padding.
    """

    def __init__(self, caches: Optional[List[jnp.ndarray]] = None):
        self.caches_in = caches
        self.caches_out: List[jnp.ndarray] = []
        self.idx = 0

    def step(self, x_t: jnp.ndarray, keep: int) -> Optional[jnp.ndarray]:
        """Returns the incoming cache for this conv (or None in shape-probe
        mode) and records the updated cache: last `keep` frames of
        concat(cache, x)."""
        cache_in = None
        if self.caches_in is not None:
            cache_in = self.caches_in[self.idx]
            joint = jnp.concatenate([cache_in, x_t], axis=1)
        else:
            # shape-probe mode: emit a correctly-shaped placeholder
            b, _, h, w, c = x_t.shape
            joint = jnp.zeros((b, keep, h, w, c), x_t.dtype)
        self.caches_out.append(joint[:, -keep:])
        self.idx += 1
        return cache_in

    def step_zero(self, x_t: jnp.ndarray, keep: int) -> None:
        """Record a zero cache for this slot (the upsample3d 'Rep' first-chunk
        semantics: the reference discards frame-0 data at this layer,
        `wan_vae.py:110-134`)."""
        b, _, h, w, c = x_t.shape
        self.caches_out.append(jnp.zeros((b, keep, h, w, c), x_t.dtype))
        self.idx += 1


def causal_conv3d(p, x, ctx: _Cache, stride=(1, 1, 1), time_kernel=3):
    """CausalConv3d (`wan_vae.py:20-39`) with cache semantics.

    The reference pads the time axis with 2*pad zeros on the first chunk and
    with the cached last-2 frames afterwards; a zero cache makes both cases
    the single rule `conv(concat(cache, x))` with VALID time padding.
    Spatial padding is SAME (pad 1 for k=3).
    """
    keep = CACHE_T if time_kernel == 3 else 1
    cache_in = ctx.step(x, keep)
    if cache_in is not None:
        x = jnp.concatenate([cache_in, x], axis=1)
    else:
        # non-streaming call: zero-pad time like the reference first chunk
        pad_t = time_kernel - 1
        x = jnp.pad(x, ((0, 0), (pad_t, 0), (0, 0), (0, 0), (0, 0)))
    kh = p["w"].shape[1]
    sp = (kh - 1) // 2
    pad = [(0, 0), (sp, sp), (sp, sp)]
    return conv3d(x, p["w"], p.get("b"), stride=stride, padding=pad)


def time_conv_stream(p, x, ctx: _Cache, stride_t=1):
    """Temporal-only causal conv (kernel (3,1,1)) used by Resample
    up/down-sampling (`wan_vae.py:87-99`); keep=1 for the strided
    (downsample) variant which caches a single frame (`wan_vae.py:154-162`)."""
    keep = 1 if stride_t == 2 else CACHE_T
    cache_in = ctx.step(x, keep)
    if cache_in is not None:
        x = jnp.concatenate([cache_in, x], axis=1)
    else:
        x = jnp.pad(x, ((0, 0), (2, 0), (0, 0), (0, 0), (0, 0)))
    return conv3d(x, p["w"], p.get("b"), stride=(stride_t, 1, 1), padding="VALID")


# ---------------------------------------------------------------------------
# blocks
# ---------------------------------------------------------------------------


def residual_block(p, x, ctx: _Cache):
    """ResidualBlock (`wan_vae.py:189-223`): RMS->SiLU->CConv3d x2 + shortcut."""
    if "shortcut" in p:
        h = conv3d(x, p["shortcut"]["w"], p["shortcut"]["b"], padding="VALID")
    else:
        h = x
    y = channel_rms_norm(x, p["norm1"]["gamma"], p["norm1"]["scale"])
    y = jax.nn.silu(y)
    y = causal_conv3d(p["conv1"], y, ctx)
    y = channel_rms_norm(y, p["norm2"]["gamma"], p["norm2"]["scale"])
    y = jax.nn.silu(y)
    y = causal_conv3d(p["conv2"], y, ctx)
    return y + h


def attention_block(p, x):
    """Single-head per-frame spatial attention (`wan_vae.py:226-265`)."""
    b, t, h, w, c = x.shape
    y = channel_rms_norm(x, p["norm"]["gamma"], p["norm"]["scale"])
    y = y.reshape(b * t, h, w, c)
    qkv = conv2d(y, p["qkv"]["w"], p["qkv"]["b"], padding="VALID")  # 1x1
    qkv = qkv.reshape(b * t, h * w, 3 * c)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    out = jax.nn.dot_product_attention(
        q[:, :, None, :], k[:, :, None, :], v[:, :, None, :], implementation="xla"
    )[:, :, 0, :]
    out = out.reshape(b * t, h, w, c)
    out = conv2d(out, p["proj"]["w"], p["proj"]["b"], padding="VALID")
    return x + out.reshape(b, t, h, w, c)


def resample(p, x, ctx: _Cache, mode: str, first_chunk: bool):
    """Resample (`wan_vae.py:69-163`).

    upsample3d first chunk: reference marks 'Rep' and skips the time conv
    entirely (no frame doubling) — afterwards the uniform zero-cache rule
    applies.  downsample3d first chunk: time conv skipped, cache = last frame.
    """
    b, t, h, w, c = x.shape

    if mode == "upsample3d" and not first_chunk:
        y = time_conv_stream(p["time_conv"], x, ctx)  # [B,T,H,W,2C]
        # interleave the two C-sized halves along time (wan_vae.py:137-140)
        y = y.reshape(b, t, h, w, 2, c)
        y = y.transpose(0, 1, 4, 2, 3, 5).reshape(b, t * 2, h, w, c)
        x, t = y, t * 2
    elif mode == "upsample3d" and first_chunk:
        ctx.step_zero(x, CACHE_T)  # 'Rep': no time conv, zero cache

    if mode in ("upsample2d", "upsample3d"):
        xs = x.reshape(b * t, h, w, c)
        xs = jnp.repeat(jnp.repeat(xs, 2, axis=1), 2, axis=2)  # nearest-exact 2x
        xs = conv2d(xs, p["conv"]["w"], p["conv"]["b"], padding="SAME")
        x = xs.reshape(b, t, h * 2, w * 2, c // 2)
    elif mode in ("downsample2d", "downsample3d"):
        xs = x.reshape(b * t, h, w, c)
        xs = jnp.pad(xs, ((0, 0), (0, 1), (0, 1), (0, 0)))
        xs = conv2d(xs, p["conv"]["w"], p["conv"]["b"], stride=(2, 2), padding="VALID")
        x = xs.reshape(b, t, h // 2, w // 2, c)

    if mode == "downsample3d":
        if first_chunk:
            ctx.step(x, 1)  # cache last spatial-downsampled frame; no conv
        else:
            x = time_conv_stream(p["time_conv"], x, ctx, stride_t=2)
    return x


# ---------------------------------------------------------------------------
# encoder / decoder graphs
# ---------------------------------------------------------------------------


def encoder_apply(p, x, ctx: _Cache, cfg: VAEConfig, first_chunk: bool):
    """Encoder3d (`wan_vae.py:268-369`)."""
    dims = [cfg.dim * u for u in (1,) + tuple(cfg.dim_mult)]
    x = causal_conv3d(p["conv1"], x, ctx)

    bi = 0
    for i in range(len(cfg.dim_mult)):
        for j in range(cfg.num_res_blocks):
            x = residual_block(p["down"][bi], x, ctx)
            bi += 1
        if i != len(cfg.dim_mult) - 1:
            mode = "downsample3d" if cfg.temporal_downsample[i] else "downsample2d"
            x = resample(p["down"][bi], x, ctx, mode, first_chunk)
            bi += 1

    x = residual_block(p["mid1"], x, ctx)
    x = attention_block(p["mid_attn"], x)
    x = residual_block(p["mid2"], x, ctx)

    x = channel_rms_norm(x, p["head_norm"]["gamma"], p["head_norm"]["scale"])
    x = jax.nn.silu(x)
    x = causal_conv3d(p["head_conv"], x, ctx)
    return x


def decoder_apply(p, x, ctx: _Cache, cfg: VAEConfig, first_chunk: bool):
    """Decoder3d (`wan_vae.py:372-475`)."""
    x = causal_conv3d(p["conv1"], x, ctx)

    x = residual_block(p["mid1"], x, ctx)
    x = attention_block(p["mid_attn"], x)
    x = residual_block(p["mid2"], x, ctx)

    temporal_upsample = tuple(reversed(cfg.temporal_downsample))
    bi = 0
    for i in range(len(cfg.dim_mult)):
        for j in range(cfg.num_res_blocks + 1):
            x = residual_block(p["up"][bi], x, ctx)
            bi += 1
        if i != len(cfg.dim_mult) - 1:
            mode = "upsample3d" if temporal_upsample[i] else "upsample2d"
            x = resample(p["up"][bi], x, ctx, mode, first_chunk)
            bi += 1

    x = channel_rms_norm(x, p["head_norm"]["gamma"], p["head_norm"]["scale"])
    x = jax.nn.silu(x)
    x = causal_conv3d(p["head_conv"], x, ctx)
    return x


# ---------------------------------------------------------------------------
# params
# ---------------------------------------------------------------------------


def _conv3d_p(key, cin, cout, k=(3, 3, 3)):
    fan_in = cin * int(np.prod(k))
    lim = 1.0 / np.sqrt(fan_in)
    return {
        "w": jax.random.uniform(key, (*k, cin, cout), jnp.float32, -lim, lim),
        "b": jnp.zeros((cout,)),
    }


def _conv2d_p(key, cin, cout, k=(3, 3), zero=False):
    if zero:
        return {"w": jnp.zeros((*k, cin, cout)), "b": jnp.zeros((cout,))}
    fan_in = cin * int(np.prod(k))
    lim = 1.0 / np.sqrt(fan_in)
    return {
        "w": jax.random.uniform(key, (*k, cin, cout), jnp.float32, -lim, lim),
        "b": jnp.zeros((cout,)),
    }


def _norm_p(dim):
    return {"gamma": jnp.ones((dim,)), "scale": float(np.sqrt(dim))}


def _res_p(key, cin, cout):
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        "norm1": _norm_p(cin),
        "conv1": _conv3d_p(k1, cin, cout),
        "norm2": _norm_p(cout),
        "conv2": _conv3d_p(k2, cout, cout),
    }
    if cin != cout:
        p["shortcut"] = _conv3d_p(k3, cin, cout, k=(1, 1, 1))
    return p


def _attn_p(key, dim):
    k1, _ = jax.random.split(key)
    return {
        "norm": _norm_p(dim),
        "qkv": _conv2d_p(k1, dim, dim * 3, k=(1, 1)),
        "proj": _conv2d_p(k1, dim, dim, k=(1, 1), zero=True),
    }


def init_vae(key: jax.Array, cfg: VAEConfig = VAEConfig()):
    keys = jax.random.split(key, 64)
    ki = iter(range(64))
    nk = lambda: keys[next(ki)]  # noqa: E731

    dims = [cfg.dim * u for u in (1,) + tuple(cfg.dim_mult)]
    enc = {"conv1": _conv3d_p(nk(), 3, dims[0]), "down": []}
    for i, (cin, cout) in enumerate(zip(dims[:-1], dims[1:])):
        c = cin
        for _ in range(cfg.num_res_blocks):
            enc["down"].append(_res_p(nk(), c, cout))
            c = cout
        if i != len(cfg.dim_mult) - 1:
            mode3d = cfg.temporal_downsample[i]
            rp = {"conv": _conv2d_p(nk(), cout, cout)}
            if mode3d:
                rp["time_conv"] = _conv3d_p(nk(), cout, cout, k=(3, 1, 1))
            enc["down"].append(rp)
    d = dims[-1]
    enc.update(
        mid1=_res_p(nk(), d, d),
        mid_attn=_attn_p(nk(), d),
        mid2=_res_p(nk(), d, d),
        head_norm=_norm_p(d),
        head_conv=_conv3d_p(nk(), d, cfg.z_dim * 2),
    )

    ddims = [cfg.dim * u for u in (cfg.dim_mult[-1],) + tuple(reversed(cfg.dim_mult))]
    temporal_upsample = tuple(reversed(cfg.temporal_downsample))
    dec = {"conv1": _conv3d_p(nk(), cfg.z_dim, ddims[0])}
    dec.update(
        mid1=_res_p(nk(), ddims[0], ddims[0]),
        mid_attn=_attn_p(nk(), ddims[0]),
        mid2=_res_p(nk(), ddims[0], ddims[0]),
    )
    dec["up"] = []
    for i, (cin, cout) in enumerate(zip(ddims[:-1], ddims[1:])):
        c = cin // 2 if i in (1, 2, 3) else cin  # upsample halves channels (wan_vae.py:404-407)
        for _ in range(cfg.num_res_blocks + 1):
            dec["up"].append(_res_p(nk(), c, cout))
            c = cout
        if i != len(cfg.dim_mult) - 1:
            rp = {"conv": _conv2d_p(nk(), cout, cout // 2)}
            if temporal_upsample[i]:
                rp["time_conv"] = _conv3d_p(nk(), cout, cout * 2, k=(3, 1, 1))
            dec["up"].append(rp)
    dec.update(head_norm=_norm_p(ddims[-1]), head_conv=_conv3d_p(nk(), ddims[-1], 3))

    return {
        "encoder": enc,
        "decoder": dec,
        "conv1": _conv3d_p(nk(), cfg.z_dim * 2, cfg.z_dim * 2, k=(1, 1, 1)),
        "conv2": _conv3d_p(nk(), cfg.z_dim, cfg.z_dim, k=(1, 1, 1)),
    }


# ---------------------------------------------------------------------------
# streaming encode / decode
# ---------------------------------------------------------------------------


def _init_caches(p, x, cfg, apply_fn, first_chunk):
    """Probe the graph with `jax.eval_shape` (no FLOPs) to learn the cache
    slot shapes, then return zero caches — zeros reproduce the reference's
    first-chunk zero padding exactly."""

    def probe(p, x):
        ctx = _Cache(None)
        apply_fn(p, x, ctx, cfg, first_chunk)
        return ctx.caches_out

    shapes = jax.eval_shape(probe, p, x)
    return [jnp.zeros(s.shape, s.dtype) for s in shapes]


def encode_chunks(params, video, cfg: VAEConfig = VAEConfig(), chunks_per_step: int = 1):
    """video [B, T, H, W, 3] (T = 1+4n) -> (mu [B, 1+n, H/8, W/8, z], logvar).

    mu is normalized by the per-channel latent mean/std (`wan_vae.py:539-544`).
    Streaming layout mirrors the reference encode loop (`wan_vae.py:519-547`):
    chunk 0 is the first frame alone, then `lax.scan` over 4-frame chunks.

    `chunks_per_step` groups 4-frame chunks per scan step — identical results
    (the causal caches make chunk boundaries invisible; stride-2 temporal
    convs stay aligned on 4-frame multiples) with bigger dispatches.
    """
    b, t, h, w, _ = video.shape
    assert (t - 1) % 4 == 0, f"T must be 1+4n, got {t}"
    n = (t - 1) // 4

    enc = params["encoder"]
    ctx0 = _Cache(_init_caches(enc, video[:, :1], cfg, encoder_apply, True))
    z0 = encoder_apply(enc, video[:, :1], ctx0, cfg, first_chunk=True)
    caches = ctx0.caches_out
    parts = [z0]

    g = max(1, chunks_per_step)
    n_groups, rem = divmod(n, g)

    def step(caches, xc):
        ctx = _Cache(caches)
        z = encoder_apply(enc, xc, ctx, cfg, first_chunk=False)
        return ctx.caches_out, z

    if n_groups > 0:
        body = video[:, 1 : 1 + n_groups * g * 4]
        body = body.reshape(b, n_groups, g * 4, h, w, video.shape[-1])
        body = jnp.moveaxis(body, 1, 0)  # [n_groups, B, g*4, H, W, C]
        caches, zs = jax.lax.scan(step, caches, body)
        zs = jnp.moveaxis(zs, 0, 1)  # [B, n_groups, fpc, h, w, 2z]
        zs = zs.reshape(b, -1, *zs.shape[3:])
        parts.append(zs)
    if rem > 0:
        caches, z_rem = step(caches, video[:, 1 + n_groups * g * 4 :])
        parts.append(z_rem)

    z = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]

    z = conv3d(z, params["conv1"]["w"], params["conv1"]["b"], padding="VALID")
    mu, logvar = jnp.split(z, 2, axis=-1)
    mean = jnp.asarray(cfg.latent_mean, dtype=mu.dtype)
    std = jnp.asarray(cfg.latent_std, dtype=mu.dtype)
    mu = (mu - mean) / std
    return mu, logvar


def _decode_segment_impl(params, z_seg, caches, cfg: VAEConfig,
                         frames_per_step: int, first: bool,
                         out_uint8: bool = False):
    """One temporal segment of the streaming decode: denormalize, 1x1 conv2,
    the solo first-latent-frame path when `first` (reference
    `wan_vae.py:549-574`), then the cache-carried scan.  Returns
    (frames, caches_out) so segments chain exactly (the 2-frame causal-conv
    cache makes segment boundaries invisible; equality asserted in tests).

    `out_uint8=True` additionally quantizes to display uint8 on device
    (pipelines transfer 4x fewer bytes to the host)."""
    b, ts, h, w, _ = z_seg.shape
    mean = jnp.asarray(cfg.latent_mean, dtype=z_seg.dtype)
    std = jnp.asarray(cfg.latent_std, dtype=z_seg.dtype)
    z = z_seg * std + mean
    x = conv3d(z, params["conv2"]["w"], params["conv2"]["b"], padding="VALID")

    dec = params["decoder"]
    parts = []
    if first:
        ctx0 = _Cache(_init_caches(dec, x[:, :1], cfg, decoder_apply, True))
        f0 = decoder_apply(dec, x[:, :1], ctx0, cfg, first_chunk=True)
        caches = ctx0.caches_out
        parts.append(f0)
        x = x[:, 1:]

    n_rest = x.shape[1]
    g = max(1, frames_per_step)
    n_groups, rem = divmod(n_rest, g)

    def step(caches, zc):
        ctx = _Cache(caches)
        f = decoder_apply(dec, zc, ctx, cfg, first_chunk=False)
        return ctx.caches_out, f

    if n_groups > 0:
        body = x[:, : n_groups * g]
        body = body.reshape(b, n_groups, g, h, w, body.shape[-1])
        body = jnp.moveaxis(body, 1, 0)  # [n_groups, B, g, h, w, z]
        caches, fs = jax.lax.scan(step, caches, body)
        fs = jnp.moveaxis(fs, 0, 1).reshape(b, -1, *fs.shape[3:])
        parts.append(fs)
    if rem > 0:
        caches, f_rem = step(caches, x[:, n_groups * g :])
        parts.append(f_rem)

    frames = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
    frames = jnp.clip(frames, -1.0, 1.0)
    if out_uint8:
        frames = jnp.clip(
            jnp.round((frames.astype(jnp.float32) / 2.0 + 0.5) * 255.0), 0, 255
        ).astype(jnp.uint8)
    return frames, caches


_decode_segment = jax.jit(
    _decode_segment_impl,
    static_argnames=("cfg", "frames_per_step", "first", "out_uint8"),
)


def decode_chunks(params, z, cfg: VAEConfig = VAEConfig(), frames_per_step: int = 1):
    """z [B, Tl, h, w, zdim] (normalized latents) -> video [B, 1+4(Tl-1), H, W, 3].

    Mirrors the reference decode loop (`wan_vae.py:549-574`): denormalize,
    1x1 conv2, then first latent frame alone, then the cache-carried scan.

    `frames_per_step` groups latent frames per scan step — mathematically
    identical for the stride-1 causal convs (the 2-frame cache makes chunk
    boundaries invisible; equality asserted in tests) but gives the TPU
    bigger tensors per dispatch.  A remainder group runs as one extra call.
    """
    frames, _ = _decode_segment_impl(
        params, z, None, cfg, frames_per_step, first=True
    )
    return frames


def sample_posterior(mu, logvar, key):
    std = jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0))
    return mu + std * jax.random.normal(key, mu.shape, dtype=mu.dtype)


# NCHW-style helpers for pipeline compatibility ------------------------------


_encode_chunks_jit = jax.jit(
    encode_chunks, static_argnames=("cfg", "chunks_per_step")
)


def encode_video(params, video_ncthw, cfg: VAEConfig = VAEConfig(), chunks_per_step=None):
    """video [B, 3, T, H, W] (reference layout) -> mu [B, z, Tl, h, w].

    One jitted program per geometry (not per-op eager dispatch — the same
    fix that took decode from 3.3 to 15+ fps end-to-end): encode runs every
    train step and in pipeline y-conditioning."""
    v = jnp.transpose(video_ncthw, (0, 2, 3, 4, 1))
    if chunks_per_step is None:
        hw = v.shape[2] * v.shape[3]
        chunks_per_step = max(1, min(4, (4 * 384 * 384) // max(hw, 1)))
    mu, _ = _encode_chunks_jit(params, v, cfg, chunks_per_step=chunks_per_step)
    return jnp.transpose(mu, (0, 4, 1, 2, 3))


def encode_video_sample(params, video_ncthw, key,
                        cfg: VAEConfig = VAEConfig(), chunks_per_step=None):
    """Like `encode_video` but SAMPLES the posterior — the reference trainer
    encodes with `.sample()` (`train_1B_square.py:1118`), where mu is
    normalized but log_var is raw (`wan_vae.py:539-545` — the as-built
    quirk: the added noise std is in raw latent units)."""
    v = jnp.transpose(video_ncthw, (0, 2, 3, 4, 1))
    if chunks_per_step is None:
        hw = v.shape[2] * v.shape[3]
        chunks_per_step = max(1, min(4, (4 * 384 * 384) // max(hw, 1)))
    mu, logvar = _encode_chunks_jit(params, v, cfg, chunks_per_step=chunks_per_step)
    z = sample_posterior(mu, logvar, key)
    return jnp.transpose(z, (0, 4, 1, 2, 3))


def decode_video(params, z_nczhw, cfg: VAEConfig = VAEConfig(), frames_per_step=None):
    """z [B, z, Tl, h, w] -> video [B, 3, T, H, W] in [-1, 1].

    frames_per_step=None picks the largest group that keeps full-resolution
    decode activations within budget alongside resident model params
    (~0.8 GB of [g*4, H, W, 96] bf16 on a 16 GB chip)."""
    z = jnp.transpose(z_nczhw, (0, 2, 3, 4, 1))
    if frames_per_step is None:
        lh, lw = z.shape[2], z.shape[3]
        frames_per_step = max(1, min(4, (4 * 48 * 48) // max(lh * lw, 1)))
    frames = decode_chunks(params, z, cfg, frames_per_step=frames_per_step)
    return jnp.transpose(frames, (0, 4, 1, 2, 3))


def decode_video_segmented(
    params,
    z_nczhw,
    cfg: VAEConfig = VAEConfig(),
    segment_latents: Optional[int] = None,
    frames_per_step: Optional[int] = None,
    out_uint8: bool = False,
):
    """Segmented streaming decode: returns a LIST of [B, 3, Ts, H, W] device
    arrays (uint8 display frames when `out_uint8`), one per temporal segment,
    each dispatched as its own jitted program with the conv caches carried
    across segments (bit-identical concatenation to `decode_video` — tested).

    The point is decode/transfer OVERLAP: jax's async dispatch enqueues every
    segment up front, so the host can pull segment k while the device decodes
    k+1 — device->host bandwidth (PCIe, or the RPC tunnel on remote-attached
    chips) hides behind decode compute instead of serializing after it.
    One jitted program also replaces the former per-op eager dispatch.

    Segment lengths: first = 1 + (segment_latents - 1) (the solo first-frame
    path plus group-aligned rest), middle = segment_latents, remainder last —
    at most 3 distinct compiled programs per geometry."""
    z = jnp.transpose(z_nczhw, (0, 2, 3, 4, 1))
    tl, lh, lw = z.shape[1], z.shape[2], z.shape[3]
    if frames_per_step is None:
        frames_per_step = max(1, min(4, (4 * 48 * 48) // max(lh * lw, 1)))
    if segment_latents is None:
        # ~2 scan groups per segment: big enough that dispatch cost is
        # amortized, small enough that transfer overlaps from early on
        segment_latents = max(2 * frames_per_step, 4)
    outs = []
    caches = None
    s = 0
    while s < tl:
        n = min(segment_latents, tl - s)
        frames, caches = _decode_segment(
            params, z[:, s : s + n], caches, cfg, frames_per_step,
            first=(s == 0), out_uint8=out_uint8,
        )
        outs.append(jnp.transpose(frames, (0, 4, 1, 2, 3)))
        s += n
    return outs

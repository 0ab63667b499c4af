"""Independent torch implementation of the Wan causal-VAE *semantics* used as
a numerical oracle in tests/test_vae.py.

Implements the behavior documented in SURVEY.md §2.1 (VAE row) and verified
against `wan/models/wan_vae.py` formulas: causal convs with a 2-frame
streaming cache, 'Rep' first-chunk semantics for temporal upsampling,
asymmetric spatial downsampling pads, channelwise L2 RMS norm, per-frame
single-head attention.  Weights are injected from the JAX pytree so both
implementations compute the same function.
"""

import numpy as np
import torch
import torch.nn.functional as F

CACHE_T = 2


def _w3(p):  # JAX [kt,kh,kw,I,O] -> torch [O,I,kt,kh,kw]
    return torch.from_numpy(np.asarray(p["w"]).transpose(4, 3, 0, 1, 2).copy()).float()


def _w2(p):  # JAX [kh,kw,I,O] -> torch [O,I,kh,kw]
    return torch.from_numpy(np.asarray(p["w"]).transpose(3, 2, 0, 1).copy()).float()


def _b(p):
    return torch.from_numpy(np.asarray(p["b"]).copy()).float()


class Oracle:
    def __init__(self, params, cfg):
        self.p = params
        self.cfg = cfg

    # --- primitives ---

    def causal_conv3d(self, p, x, cache, stride=(1, 1, 1), spatial_pad=None):
        """x [B,C,T,H,W]; cache [B,C,ct,H,W] or None (-> zero pad)."""
        w, b = _w3(p), _b(p)
        kt, kh = w.shape[2], w.shape[3]
        sp = (kh - 1) // 2 if spatial_pad is None else spatial_pad
        if cache is None:
            x = F.pad(x, (sp, sp, sp, sp, kt - 1, 0))
        else:
            x = torch.cat([cache, x], dim=2)
            x = F.pad(x, (sp, sp, sp, sp, 0, 0))
        return F.conv3d(x, w, b, stride=stride)

    def rms(self, p, x):
        # channel-first L2 normalize * sqrt(C) * gamma
        n = x.float().pow(2).sum(1, keepdim=True).sqrt().clamp_min(1e-12)
        gamma = torch.from_numpy(np.asarray(p["gamma"]).copy()).float().view(1, -1, 1, 1, 1)
        return (x / n) * float(p["scale"]) * gamma

    def res_block(self, p, x, caches, idx):
        if "shortcut" in p:
            h = F.conv3d(x, _w3(p["shortcut"]), _b(p["shortcut"]))
        else:
            h = x
        y = F.silu(self.rms(p["norm1"], x))
        c = caches[idx[0]]
        caches[idx[0]] = torch.cat([torch.zeros_like(y[:, :, :1]).repeat(1, 1, CACHE_T, 1, 1) if c is None else c, y], 2)[:, :, -CACHE_T:]
        y = self.causal_conv3d(p["conv1"], y, c)
        idx[0] += 1
        y = F.silu(self.rms(p["norm2"], y))
        c = caches[idx[0]]
        caches[idx[0]] = torch.cat([torch.zeros_like(y[:, :, :1]).repeat(1, 1, CACHE_T, 1, 1) if c is None else c, y], 2)[:, :, -CACHE_T:]
        y = self.causal_conv3d(p["conv2"], y, c)
        idx[0] += 1
        return y + h

    def attn(self, p, x):
        b, c, t, h, w = x.shape
        y = self.rms(p["norm"], x)
        y = y.permute(0, 2, 1, 3, 4).reshape(b * t, c, h, w)
        qkv = F.conv2d(y, _w2(p["qkv"]), _b(p["qkv"]))
        q, k, v = qkv.reshape(b * t, 3 * c, h * w).permute(0, 2, 1).chunk(3, -1)
        o = F.scaled_dot_product_attention(q.unsqueeze(1), k.unsqueeze(1), v.unsqueeze(1)).squeeze(1)
        o = o.permute(0, 2, 1).reshape(b * t, c, h, w)
        o = F.conv2d(o, _w2(p["proj"]), _b(p["proj"]))
        return x + o.reshape(b, t, c, h, w).permute(0, 2, 1, 3, 4)

    def upsample(self, p, x, caches, idx, mode, first):
        b, c, t, h, w = x.shape
        if mode == "upsample3d":
            ci = idx[0]
            if first:
                caches[ci] = torch.zeros(b, c, CACHE_T, h, w)
                idx[0] += 1
            else:
                cache = caches[ci]
                caches[ci] = torch.cat([cache, x], 2)[:, :, -CACHE_T:]
                y = self.causal_conv3d(p["time_conv"], x, cache, spatial_pad=0)
                y = y.reshape(b, 2, c, t, h, w)
                y = torch.stack((y[:, 0], y[:, 1]), 3).reshape(b, c, t * 2, h, w)
                x, t = y, t * 2
                idx[0] += 1
        xs = x.permute(0, 2, 1, 3, 4).reshape(b * t, c, h, w)
        xs = F.interpolate(xs.float(), scale_factor=2.0, mode="nearest-exact")
        xs = F.conv2d(xs, _w2(p["conv"]), _b(p["conv"]), padding=1)
        return xs.reshape(b, t, c // 2, h * 2, w * 2).permute(0, 2, 1, 3, 4)

    def downsample(self, p, x, caches, idx, mode, first):
        b, c, t, h, w = x.shape
        xs = x.permute(0, 2, 1, 3, 4).reshape(b * t, c, h, w)
        xs = F.pad(xs, (0, 1, 0, 1))
        xs = F.conv2d(xs, _w2(p["conv"]), _b(p["conv"]), stride=2)
        x = xs.reshape(b, t, c, h // 2, w // 2).permute(0, 2, 1, 3, 4)
        if mode == "downsample3d":
            ci = idx[0]
            if first:
                caches[ci] = x[:, :, -1:].clone()
                idx[0] += 1
            else:
                cache = caches[ci]
                caches[ci] = x[:, :, -1:].clone()
                x = F.conv3d(torch.cat([cache, x], 2), _w3(p["time_conv"]), _b(p["time_conv"]), stride=(2, 1, 1))
                idx[0] += 1
        return x

    # --- encoder / decoder one chunk ---

    def encoder_chunk(self, x, caches, first):
        p = self.p["encoder"]
        cfg = self.cfg
        idx = [0]

        def cconv(pp, x):
            c = caches[idx[0]]
            caches[idx[0]] = torch.cat(
                [torch.zeros_like(x[:, :, :1]).repeat(1, 1, CACHE_T, 1, 1) if c is None else c, x], 2
            )[:, :, -CACHE_T:]
            y = self.causal_conv3d(pp, x, c)
            idx[0] += 1
            return y

        x = cconv(p["conv1"], x)
        bi = 0
        for i in range(len(cfg.dim_mult)):
            for _ in range(cfg.num_res_blocks):
                x = self.res_block(p["down"][bi], x, caches, idx)
                bi += 1
            if i != len(cfg.dim_mult) - 1:
                mode = "downsample3d" if cfg.temporal_downsample[i] else "downsample2d"
                x = self.downsample(p["down"][bi], x, caches, idx, mode, first)
                bi += 1
        x = self.res_block(p["mid1"], x, caches, idx)
        x = self.attn(p["mid_attn"], x)
        x = self.res_block(p["mid2"], x, caches, idx)
        x = F.silu(self.rms(p["head_norm"], x))
        x = cconv(p["head_conv"], x)
        return x

    def decoder_chunk(self, x, caches, first):
        p = self.p["decoder"]
        cfg = self.cfg
        idx = [0]

        def cconv(pp, x):
            c = caches[idx[0]]
            caches[idx[0]] = torch.cat(
                [torch.zeros_like(x[:, :, :1]).repeat(1, 1, CACHE_T, 1, 1) if c is None else c, x], 2
            )[:, :, -CACHE_T:]
            y = self.causal_conv3d(pp, x, c)
            idx[0] += 1
            return y

        x = cconv(p["conv1"], x)
        x = self.res_block(p["mid1"], x, caches, idx)
        x = self.attn(p["mid_attn"], x)
        x = self.res_block(p["mid2"], x, caches, idx)
        tu = tuple(reversed(cfg.temporal_downsample))
        bi = 0
        for i in range(len(cfg.dim_mult)):
            for _ in range(cfg.num_res_blocks + 1):
                x = self.res_block(p["up"][bi], x, caches, idx)
                bi += 1
            if i != len(cfg.dim_mult) - 1:
                mode = "upsample3d" if tu[i] else "upsample2d"
                x = self.upsample(p["up"][bi], x, caches, idx, mode, first)
                bi += 1
        x = F.silu(self.rms(p["head_norm"], x))
        x = cconv(p["head_conv"], x)
        return x

    # --- streamed drivers (reference encode/decode loops, wan_vae.py:519-574) ---

    def encode(self, video):
        """video [B,3,T,H,W] -> normalized mu [B,z,Tl,h,w]"""
        t = video.shape[2]
        n = (t - 1) // 4
        caches = [None] * 64
        outs = [self.encoder_chunk(video[:, :, :1], caches, first=True)]
        for i in range(n):
            outs.append(self.encoder_chunk(video[:, :, 1 + 4 * i : 5 + 4 * i], caches, first=False))
        z = torch.cat(outs, 2)
        z = F.conv3d(z, _w3(self.p["conv1"]), _b(self.p["conv1"]))
        mu, logvar = z.chunk(2, 1)
        mean = torch.tensor(self.cfg.latent_mean).view(1, -1, 1, 1, 1)
        std = torch.tensor(self.cfg.latent_std).view(1, -1, 1, 1, 1)
        return (mu - mean) / std

    def decode(self, z):
        mean = torch.tensor(self.cfg.latent_mean).view(1, -1, 1, 1, 1)
        std = torch.tensor(self.cfg.latent_std).view(1, -1, 1, 1, 1)
        z = z * std + mean
        x = F.conv3d(z, _w3(self.p["conv2"]), _b(self.p["conv2"]))
        caches = [None] * 64
        outs = [self.decoder_chunk(x[:, :, :1], caches, first=True)]
        for i in range(1, z.shape[2]):
            outs.append(self.decoder_chunk(x[:, :, i : i + 1], caches, first=False))
        return torch.cat(outs, 2).clamp(-1, 1)

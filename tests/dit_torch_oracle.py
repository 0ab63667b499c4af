"""Independent torch implementation of the Wan DiT *semantics* used as a
numerical oracle in tests/test_dit_oracle.py.

Re-implements the forward math documented in SURVEY.md §2.1/§3.3 (adaLN
6-chunk modulation, RoPE'd self-attention, triple cross-attention with
per-latent-frame vocal branch, gated FFN, 2-chunk head) directly from the
formulas, consuming the SAME weights as the JAX pytree (injected, converted
layouts) so both implementations compute the same function.
"""

import math

import numpy as np
import torch
import torch.nn.functional as F


def _t(a):
    return torch.from_numpy(np.asarray(a).copy()).float()


def _lin(p, x):
    y = x @ _t(p["w"])
    if "b" in p:
        y = y + _t(p["b"])
    return y


def _rms(x, w, eps):
    n = x * torch.rsqrt(x.pow(2).mean(-1, keepdim=True) + eps)
    return n * _t(w)


def _ln(x, eps, w=None, b=None):
    y = F.layer_norm(x, x.shape[-1:], eps=eps)
    if w is not None:
        y = y * _t(w) + _t(b)
    return y


def _gelu_tanh(x):
    return 0.5 * x * (1.0 + torch.tanh(math.sqrt(2.0 / math.pi) * (x + 0.044715 * x**3)))


def _attn(q, k, v):
    # [B, L, N, D] -> SDPA
    return (
        F.scaled_dot_product_attention(
            q.transpose(1, 2), k.transpose(1, 2), v.transpose(1, 2)
        ).transpose(1, 2)
    )


class DiTOracle:
    def __init__(self, params, cfg):
        self.p = jax_tree_to_numpy(params)
        self.cfg = cfg
        d = cfg.head_dim
        # complex rope freqs per reference rope_params split
        def rope_part(n, dim):
            fr = 1.0 / np.power(10000.0, np.arange(0, dim, 2) / dim)
            ang = np.outer(np.arange(n), fr)
            return np.exp(1j * ang)

        self._rope_cache = {}

    def _freqs(self, grid):
        if grid in self._rope_cache:
            return self._rope_cache[grid]
        d = self.cfg.head_dim
        c = d // 2
        cf, ch, cw = c - 2 * (c // 3), c // 3, c // 3
        f, h, w = grid

        def part(n, half):
            fr = 1.0 / np.power(10000.0, np.arange(0, 2 * half, 2) / (2 * half))
            return np.exp(1j * np.outer(np.arange(n), fr))

        Ff, Fh, Fw = part(f, cf), part(h, ch), part(w, cw)
        out = np.concatenate(
            [
                np.broadcast_to(Ff[:, None, None, :], (f, h, w, cf)),
                np.broadcast_to(Fh[None, :, None, :], (f, h, w, ch)),
                np.broadcast_to(Fw[None, None, :, :], (f, h, w, cw)),
            ],
            axis=-1,
        ).reshape(f * h * w, c)
        self._rope_cache[grid] = out
        return out

    def _rope(self, x, grid):
        # x [B, L, N, D]
        b, L, n, d = x.shape
        fr = self._freqs(grid)
        xc = torch.view_as_complex(x.float().reshape(b, L, n, d // 2, 2))
        frt = torch.from_numpy(fr)[None, :, None, :]
        return torch.view_as_real(xc * frt).flatten(3).float()

    def forward(self, x, t, text, clip_fea, y, vocal, n_frames):
        cfg = self.cfg
        p = self.p
        b = x.shape[0]
        pt, ph, pw = cfg.patch_size
        f, hh, ww = x.shape[2] // pt, x.shape[3] // ph, x.shape[4] // pw
        grid = (f, hh, ww)

        xin = torch.cat([x, y], dim=1)
        # patchify channel-major then matmul
        xp = xin.reshape(b, xin.shape[1], f, pt, hh, ph, ww, pw)
        xp = xp.permute(0, 2, 4, 6, 1, 3, 5, 7).reshape(b, f * hh * ww, -1)
        tokens = _lin(p["patch_embedding"], xp)

        # time embeddings
        half = cfg.freq_dim // 2
        sin = torch.outer(t.float(), torch.pow(10000, -torch.arange(half).float() / half))
        emb = torch.cat([torch.cos(sin), torch.sin(sin)], dim=1)
        e = _lin(p["time_embedding"]["fc2"], F.silu(_lin(p["time_embedding"]["fc1"], emb)))
        e0 = _lin(p["time_projection"]["fc"], F.silu(e)).reshape(b, 6, cfg.dim)

        # contexts
        ctx_text = _lin(
            p["text_embedding"]["fc2"], _gelu_tanh(_lin(p["text_embedding"]["fc1"], text))
        )
        ip = p["img_emb"]
        hcl = _ln(clip_fea, 1e-5, ip["norm1"]["w"], ip["norm1"]["b"])
        hcl = F.gelu(_lin(ip["fc1"], hcl))
        hcl = _lin(ip["fc2"], hcl)
        ctx_img = _ln(hcl, 1e-5, ip["norm2"]["w"], ip["norm2"]["b"])

        # vocal projector
        voc_ctx, _ = self.vocal_projector(vocal, tokens, e0, e, n_frames)

        n = cfg.num_heads
        d = cfg.head_dim
        eps = cfg.eps
        nb = len(jax_first(p["blocks"]))
        for i in range(nb):
            bp = jax_layer(p["blocks"], i)
            mod = _t(bp["modulation"]) + e0
            ee = [mod[:, j : j + 1] for j in range(6)]

            tmp = _ln(tokens, eps) * (1 + ee[1]) + ee[0]
            sa = bp["self_attn"]
            q = _rms(_lin(sa["q"], tmp), sa["norm_q"]["w"], eps).reshape(b, -1, n, d)
            k = _rms(_lin(sa["k"], tmp), sa["norm_k"]["w"], eps).reshape(b, -1, n, d)
            v = _lin(sa["v"], tmp).reshape(b, -1, n, d)
            q, k = self._rope(q, grid), self._rope(k, grid)
            o = _attn(q, k, v).reshape(b, -1, n * d)
            tokens = tokens + _lin(sa["o"], o) * ee[2]

            ca = bp["cross_attn"]
            normed = _ln(tokens, eps, bp["norm3"]["w"], bp["norm3"]["b"])
            q = _rms(_lin(ca["q"], normed), ca["norm_q"]["w"], eps).reshape(b, -1, n, d)
            kt = _rms(_lin(ca["k"], ctx_text), ca["norm_k"]["w"], eps).reshape(b, -1, n, d)
            vt = _lin(ca["v"], ctx_text).reshape(b, -1, n, d)
            txt = _attn(q, kt, vt)
            ki = _rms(_lin(ca["k_img"], ctx_img), ca["norm_k_img"]["w"], eps).reshape(b, -1, n, d)
            vi = _lin(ca["v_img"], ctx_img).reshape(b, -1, n, d)
            img = _attn(q, ki, vi)
            # vocal: per-frame
            L = q.shape[1]
            fv = voc_ctx.shape[1]
            vq = q.reshape(b * fv, L // fv, n, d)
            kv = _lin(ca["k_vocal"], voc_ctx).reshape(b * fv, -1, n, d)
            vv = _lin(ca["v_vocal"], voc_ctx).reshape(b * fv, -1, n, d)
            voc = _attn(vq, kv, vv).reshape(b, L, n, d)
            summed = (txt + img + voc).reshape(b, L, n * d)
            tokens = tokens + _lin(ca["o"], summed)

            tmp = _ln(tokens, eps) * (1 + ee[4]) + ee[3]
            ffn = _lin(bp["ffn"]["fc2"], _gelu_tanh(_lin(bp["ffn"]["fc1"], tmp)))
            tokens = tokens + ffn * ee[5]

        hp = self.p["head"]
        hm = _t(hp["modulation"]) + e.unsqueeze(1)
        out = _lin(hp["head"], _ln(tokens, eps) * (1 + hm[:, 1:2]) + hm[:, 0:1])
        # unpatchify (pt,ph,pw,C layout)
        c = cfg.out_dim
        out = out.reshape(b, f, hh, ww, pt, ph, pw, c)
        out = torch.einsum("bfhwpqrc->bcfphqwr", out)
        return out.reshape(b, c, f * pt, hh * ph, ww * pw)

    def vocal_projector(self, vocal, latents, e0, e, n_frames):
        from stableavatar_tpu.models.vocal_projector import window_plan

        p = self.p["vocal_projector"]
        cfg = self.cfg
        x = vocal @ _t(p["proj"]["fc"]["w"])
        x = _ln(x, 1e-5, p["proj"]["norm"]["w"], p["proj"]["norm"]["b"])

        gather, mask, k_lens, lw = window_plan(x.shape[1], n_frames, 4)
        win = x[:, torch.from_numpy(gather.reshape(-1)).long()]
        b = x.shape[0]
        fv = gather.shape[0]
        win = win.reshape(b, fv, lw, -1) * torch.from_numpy(mask)[None, :, :, None]
        xx = win.reshape(b, fv * lw, -1)

        nh = cfg.vocal_num_heads
        vd = cfg.audio_proj_dim
        d = vd // nh
        eps = cfg.eps
        for bp in p["blocks"]:
            mod = _t(bp["modulation"]) + e0
            ee = [mod[:, j : j + 1] for j in range(6)]
            tmp = _ln(xx, eps) * (1 + ee[1]) + ee[0]
            xx = xx + tmp * ee[2]
            normed = _ln(xx, eps, bp["norm3"]["w"], bp["norm3"]["b"])
            ca = bp["cross_attn"]
            q = _rms(_lin(ca["q"], normed), ca["norm_q"]["w"], eps).reshape(b * fv, -1, nh, d)
            k = _rms(_lin(ca["k"], latents), ca["norm_k"]["w"], eps).reshape(b * fv, -1, nh, d)
            v = _lin(ca["v"], latents).reshape(b * fv, -1, nh, d)
            o = _attn(q, k, v).reshape(b, -1, vd)
            xx = xx + _lin(ca["o"], o)
            tmp = _ln(xx, eps) * (1 + ee[4]) + ee[3]
            ffn = _lin(bp["ffn"]["fc2"], F.gelu(_lin(bp["ffn"]["fc1"], tmp), approximate="tanh"))
            xx = xx + ffn * ee[5]

        hm = _t(p["final_head"]["modulation"]) + e.unsqueeze(1)
        xx = _lin(p["final_head"]["final_proj"], _ln(xx, eps) * (1 + hm[:, 1:2]) + hm[:, 0:1])
        return xx.reshape(b, fv, lw, vd), k_lens


def jax_tree_to_numpy(tree):
    import jax

    return jax.tree.map(np.asarray, tree)


def jax_first(stacked):
    # stacked blocks pytree: leaves have leading layer axis
    import jax

    return jax.tree.leaves(stacked)[0]


def jax_layer(stacked, i):
    import jax

    return jax.tree.map(lambda a: a[i], stacked)

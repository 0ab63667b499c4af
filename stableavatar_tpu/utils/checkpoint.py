"""Checkpoint I/O: reference torch layouts -> JAX pytrees, and orbax for our
own checkpoints.

Covers the reference weight formats (SURVEY.md §5 "Checkpoint / resume"):
- Wan DiT `diffusion_pytorch_model.safetensors` / fine-tuned `.pt` overrides
  (`WanTransformer3DFantasyModel.from_pretrained`,
  `wan_fantasy_transformer3d_1B.py:1210-1339`), including the patch-embed
  input-channel zero-padding trick (`:1316-1320`) and size-mismatch skipping
  (`:1322-1329`);
- `Wan2.1_VAE.pth` (AutoencoderKLWan layout, `wan_vae.py:683-705`);
- `models_t5_umt5-xxl-enc-bf16.pth` (WanT5EncoderModel layout);
- `models_clip_open-clip-xlm-roberta-large-vit-huge-14.pth` (XLMRobertaCLIP);
- HF wav2vec2-base-960h (`Wav2Vec2Model`).

All converters take a flat `state_dict`-like mapping name -> numpy array and
return the corresponding pytree for our models.  Loading the torch pickle /
safetensors bytes happens host-side with `torch` (CPU) / `safetensors`.
"""

from __future__ import annotations

import os
import re
from typing import Dict, Mapping

import jax.numpy as jnp
import numpy as np


Array = np.ndarray
StateDict = Mapping[str, Array]


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a .pt/.pth/.safetensors file into numpy arrays (host RAM)."""
    if path.endswith(".safetensors"):
        from safetensors import safe_open

        out = {}
        with safe_open(path, framework="np") as f:
            for k in f.keys():
                out[k] = f.get_tensor(k)
        return out
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.float().numpy() if v.dtype == torch.bfloat16 else v.numpy() for k, v in sd.items()}


def _lin(sd, name, bias=True):
    p = {"w": jnp.asarray(np.asarray(sd[f"{name}.weight"]).T)}
    if bias and f"{name}.bias" in sd:
        p["b"] = jnp.asarray(sd[f"{name}.bias"])
    return p


def _ln(sd, name):
    return {"w": jnp.asarray(sd[f"{name}.weight"]), "b": jnp.asarray(sd[f"{name}.bias"])}


def _rms(sd, name):
    return {"w": jnp.asarray(sd[f"{name}.weight"])}


# ---------------------------------------------------------------------------
# DiT
# ---------------------------------------------------------------------------


def convert_dit(sd: StateDict, cfg) -> dict:
    """Wan DiT state dict -> init_dit pytree (stacked blocks).

    Reproduces the patch-embed channel-pad trick: if the checkpoint's
    patch_embedding has fewer input channels than cfg.in_dim (16-ch base
    checkpoint vs 36-ch talking model), missing channels are zero-filled
    (`wan_fantasy_transformer3d_1B.py:1316-1320`).
    """
    import jax

    pe_w = np.asarray(sd["patch_embedding.weight"])  # [O, I, kt, kh, kw]
    if pe_w.shape[1] < cfg.in_dim:
        pad = np.zeros(
            (pe_w.shape[0], cfg.in_dim - pe_w.shape[1], *pe_w.shape[2:]), pe_w.dtype
        )
        pe_w = np.concatenate([pe_w, pad], axis=1)
    o = pe_w.shape[0]
    patch = {
        "w": jnp.asarray(pe_w.reshape(o, -1).T),
        "b": jnp.asarray(sd["patch_embedding.bias"]),
    }

    def block(i):
        b = f"blocks.{i}"
        p = {
            "self_attn": {
                "q": _lin(sd, f"{b}.self_attn.q"),
                "k": _lin(sd, f"{b}.self_attn.k"),
                "v": _lin(sd, f"{b}.self_attn.v"),
                "o": _lin(sd, f"{b}.self_attn.o"),
                "norm_q": _rms(sd, f"{b}.self_attn.norm_q"),
                "norm_k": _rms(sd, f"{b}.self_attn.norm_k"),
            },
            "norm3": _ln(sd, f"{b}.norm3"),
            "cross_attn": {
                "q": _lin(sd, f"{b}.cross_attn.q"),
                "k": _lin(sd, f"{b}.cross_attn.k"),
                "v": _lin(sd, f"{b}.cross_attn.v"),
                "o": _lin(sd, f"{b}.cross_attn.o"),
                "norm_q": _rms(sd, f"{b}.cross_attn.norm_q"),
                "norm_k": _rms(sd, f"{b}.cross_attn.norm_k"),
                "k_img": _lin(sd, f"{b}.cross_attn.k_img"),
                "v_img": _lin(sd, f"{b}.cross_attn.v_img"),
                "norm_k_img": _rms(sd, f"{b}.cross_attn.norm_k_img"),
                "k_vocal": _lin(sd, f"{b}.cross_attn.k_vocal"),
                "v_vocal": _lin(sd, f"{b}.cross_attn.v_vocal"),
            },
            "ffn": {
                "fc1": _lin(sd, f"{b}.ffn.0"),
                "fc2": _lin(sd, f"{b}.ffn.2"),
            },
            "modulation": jnp.asarray(sd[f"{b}.modulation"]),
        }
        return p

    blocks = [block(i) for i in range(cfg.num_layers)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)

    params = {
        "patch_embedding": patch,
        "text_embedding": {
            "fc1": _lin(sd, "text_embedding.0"),
            "fc2": _lin(sd, "text_embedding.2"),
        },
        "time_embedding": {
            "fc1": _lin(sd, "time_embedding.0"),
            "fc2": _lin(sd, "time_embedding.2"),
        },
        "time_projection": {"fc": _lin(sd, "time_projection.1")},
        "img_emb": {
            "norm1": _ln(sd, "img_emb.proj.0"),
            "fc1": _lin(sd, "img_emb.proj.1"),
            "fc2": _lin(sd, "img_emb.proj.3"),
            "norm2": _ln(sd, "img_emb.proj.4"),
        },
        "blocks": stacked,
        "head": {
            "head": _lin(sd, "head.head"),
            "modulation": jnp.asarray(sd["head.modulation"]),
        },
        "vocal_projector": convert_vocal_projector(sd, cfg, prefix="vocal_projector."),
    }
    return params


def convert_vocal_projector(sd: StateDict, cfg, prefix: str = "") -> dict:
    def has(k):
        return prefix + k in sd

    if has("proj_model.proj.weight"):  # 1B single-stage
        proj = {
            "fc": _lin(sd, f"{prefix}proj_model.proj", bias=False),
            "norm": _ln(sd, f"{prefix}proj_model.norm"),
        }
    else:  # 14B two-stage
        proj = {
            "fc1": _lin(sd, f"{prefix}proj_model.proj_1", bias=False),
            "norm1": _ln(sd, f"{prefix}proj_model.norm_1"),
            "fc2": _lin(sd, f"{prefix}proj_model.proj_2", bias=False),
            "norm": _ln(sd, f"{prefix}proj_model.norm_2"),
        }

    def block(i):
        b = f"{prefix}blocks.{i}"
        return {
            "norm3": _ln(sd, f"{b}.norm3"),
            "cross_attn": {
                "q": _lin(sd, f"{b}.cross_attn.q"),
                "k": _lin(sd, f"{b}.cross_attn.k"),
                "v": _lin(sd, f"{b}.cross_attn.v"),
                "o": _lin(sd, f"{b}.cross_attn.o"),
                "norm_q": _rms(sd, f"{b}.cross_attn.norm_q"),
                "norm_k": _rms(sd, f"{b}.cross_attn.norm_k"),
            },
            "ffn": {
                "fc1": _lin(sd, f"{b}.ffn.0"),
                "fc2": _lin(sd, f"{b}.ffn.2"),
            },
            "modulation": jnp.asarray(sd[f"{b}.modulation"]),
        }

    return {
        "proj": proj,
        "blocks": [block(i) for i in range(cfg.vocal_num_layers)],
        "final_head": {
            "final_proj": _lin(sd, f"{prefix}final_head.final_proj"),
            "modulation": jnp.asarray(sd[f"{prefix}final_head.modulation"]),
        },
    }


# ---------------------------------------------------------------------------
# VAE
# ---------------------------------------------------------------------------


def _conv3d_p(sd, name):
    w = np.asarray(sd[f"{name}.weight"])  # [O, I, kt, kh, kw]
    return {
        "w": jnp.asarray(w.transpose(2, 3, 4, 1, 0)),
        "b": jnp.asarray(sd[f"{name}.bias"]),
    }


def _conv2d_p(sd, name):
    w = np.asarray(sd[f"{name}.weight"])  # [O, I, kh, kw]
    return {
        "w": jnp.asarray(w.transpose(2, 3, 1, 0)),
        "b": jnp.asarray(sd[f"{name}.bias"]),
    }


def _vae_norm(sd, name, dim):
    g = np.asarray(sd[f"{name}.gamma"]).reshape(-1)
    return {"gamma": jnp.asarray(g), "scale": float(np.sqrt(dim))}


def _vae_res(sd, name, cin, cout):
    p = {
        "norm1": _vae_norm(sd, f"{name}.residual.0", cin),
        "conv1": _conv3d_p(sd, f"{name}.residual.2"),
        "norm2": _vae_norm(sd, f"{name}.residual.3", cout),
        "conv2": _conv3d_p(sd, f"{name}.residual.6"),
    }
    if f"{name}.shortcut.weight" in sd:
        p["shortcut"] = _conv3d_p(sd, f"{name}.shortcut")
    return p


def _vae_attn(sd, name, dim):
    return {
        "norm": _vae_norm(sd, f"{name}.norm", dim),
        "qkv": _conv2d_p(sd, f"{name}.to_qkv"),
        "proj": _conv2d_p(sd, f"{name}.proj"),
    }


def convert_vae(sd: StateDict, cfg) -> dict:
    """Wan2.1_VAE state dict (keys like `encoder.downsamples.N...`) ->
    init_vae pytree.  The reference prepends "model." when loading
    (`wan_vae.py:698-701`); pass the un-prefixed dict here."""
    dims = [cfg.dim * u for u in (1,) + tuple(cfg.dim_mult)]

    enc = {"conv1": _conv3d_p(sd, "encoder.conv1"), "down": []}
    mi = 0
    for i, (cin, cout) in enumerate(zip(dims[:-1], dims[1:])):
        c = cin
        for _ in range(cfg.num_res_blocks):
            enc["down"].append(_vae_res(sd, f"encoder.downsamples.{mi}", c, cout))
            c = cout
            mi += 1
        if i != len(cfg.dim_mult) - 1:
            rp = {"conv": _conv2d_p(sd, f"encoder.downsamples.{mi}.resample.1")}
            if cfg.temporal_downsample[i]:
                rp["time_conv"] = _conv3d_p(sd, f"encoder.downsamples.{mi}.time_conv")
            enc["down"].append(rp)
            mi += 1
    d = dims[-1]
    enc.update(
        mid1=_vae_res(sd, "encoder.middle.0", d, d),
        mid_attn=_vae_attn(sd, "encoder.middle.1", d),
        mid2=_vae_res(sd, "encoder.middle.2", d, d),
        head_norm=_vae_norm(sd, "encoder.head.0", d),
        head_conv=_conv3d_p(sd, "encoder.head.2"),
    )

    ddims = [cfg.dim * u for u in (cfg.dim_mult[-1],) + tuple(reversed(cfg.dim_mult))]
    temporal_upsample = tuple(reversed(cfg.temporal_downsample))
    dec = {
        "conv1": _conv3d_p(sd, "decoder.conv1"),
        "mid1": _vae_res(sd, "decoder.middle.0", ddims[0], ddims[0]),
        "mid_attn": _vae_attn(sd, "decoder.middle.1", ddims[0]),
        "mid2": _vae_res(sd, "decoder.middle.2", ddims[0], ddims[0]),
        "up": [],
    }
    mi = 0
    for i, (cin, cout) in enumerate(zip(ddims[:-1], ddims[1:])):
        c = cin // 2 if i in (1, 2, 3) else cin
        for _ in range(cfg.num_res_blocks + 1):
            dec["up"].append(_vae_res(sd, f"decoder.upsamples.{mi}", c, cout))
            c = cout
            mi += 1
        if i != len(cfg.dim_mult) - 1:
            rp = {"conv": _conv2d_p(sd, f"decoder.upsamples.{mi}.resample.1")}
            if temporal_upsample[i]:
                rp["time_conv"] = _conv3d_p(sd, f"decoder.upsamples.{mi}.time_conv")
            dec["up"].append(rp)
            mi += 1
    dec.update(
        head_norm=_vae_norm(sd, "decoder.head.0", ddims[-1]),
        head_conv=_conv3d_p(sd, "decoder.head.2"),
    )

    return {
        "encoder": enc,
        "decoder": dec,
        "conv1": _conv3d_p(sd, "conv1"),
        "conv2": _conv3d_p(sd, "conv2"),
    }


# ---------------------------------------------------------------------------
# T5 / CLIP / wav2vec
# ---------------------------------------------------------------------------


def convert_t5(sd: StateDict, cfg) -> dict:
    def block(i):
        b = f"blocks.{i}"
        p = {
            "norm1": _rms(sd, f"{b}.norm1"),
            "attn": {
                "q": _lin(sd, f"{b}.attn.q", bias=False),
                "k": _lin(sd, f"{b}.attn.k", bias=False),
                "v": _lin(sd, f"{b}.attn.v", bias=False),
                "o": _lin(sd, f"{b}.attn.o", bias=False),
            },
            "norm2": _rms(sd, f"{b}.norm2"),
            "ffn": {
                "gate": _lin(sd, f"{b}.ffn.gate.0", bias=False),
                "fc1": _lin(sd, f"{b}.ffn.fc1", bias=False),
                "fc2": _lin(sd, f"{b}.ffn.fc2", bias=False),
            },
        }
        if f"{b}.pos_embedding.embedding.weight" in sd:
            p["pos_emb"] = jnp.asarray(sd[f"{b}.pos_embedding.embedding.weight"])
        return p

    params = {
        "token_embedding": jnp.asarray(sd["token_embedding.weight"]),
        "blocks": [block(i) for i in range(cfg.num_layers)],
        "norm": _rms(sd, "norm"),
    }
    if "pos_embedding.embedding.weight" in sd:
        params["pos_emb"] = jnp.asarray(sd["pos_embedding.embedding.weight"])
    return params


def convert_clip_visual(sd: StateDict, cfg, prefix: str = "visual.") -> dict:
    pe = np.asarray(sd[f"{prefix}patch_embedding.weight"])  # [O, 3, p, p]
    o = pe.shape[0]

    def block(i):
        b = f"{prefix}transformer.{i}"
        return {
            "norm1": _ln(sd, f"{b}.norm1"),
            "attn": {
                "qkv": _lin(sd, f"{b}.attn.to_qkv"),
                "proj": _lin(sd, f"{b}.attn.proj"),
            },
            "norm2": _ln(sd, f"{b}.norm2"),
            "mlp": {
                "fc1": _lin(sd, f"{b}.mlp.0"),
                "fc2": _lin(sd, f"{b}.mlp.2"),
            },
        }

    return {
        "patch_embedding": {"w": jnp.asarray(pe.reshape(o, -1).T)},
        "cls_embedding": jnp.asarray(sd[f"{prefix}cls_embedding"]),
        "pos_embedding": jnp.asarray(sd[f"{prefix}pos_embedding"]),
        "pre_norm": _ln(sd, f"{prefix}pre_norm"),
        "blocks": [block(i) for i in range(cfg.vision_layers)],
    }


def convert_wav2vec2(sd: StateDict, cfg) -> dict:
    """HF `Wav2Vec2Model` state dict -> init_wav2vec2 pytree."""

    def conv1d_w(name):
        w = np.asarray(sd[f"{name}.weight"])  # [O, I/g, k]
        return jnp.asarray(w.transpose(2, 1, 0))

    convs = []
    for i in range(len(cfg.conv_dims)):
        base = f"feature_extractor.conv_layers.{i}"
        p = {"w": conv1d_w(f"{base}.conv")}
        if f"{base}.layer_norm.weight" in sd:
            p["gn"] = _ln(sd, f"{base}.layer_norm")
        convs.append(p)

    # pos conv uses torch weight_norm: weight = g * v / ||v|| over (in, k) dims
    if "encoder.pos_conv_embed.conv.weight_g" in sd:
        g = np.asarray(sd["encoder.pos_conv_embed.conv.weight_g"])
        v = np.asarray(sd["encoder.pos_conv_embed.conv.weight_v"])
        norm = np.sqrt((v**2).sum(axis=(0, 1), keepdims=True))
        pos_w = g * v / np.maximum(norm, 1e-12)
    elif "encoder.pos_conv_embed.conv.parametrizations.weight.original0" in sd:
        g = np.asarray(sd["encoder.pos_conv_embed.conv.parametrizations.weight.original0"])
        v = np.asarray(sd["encoder.pos_conv_embed.conv.parametrizations.weight.original1"])
        norm = np.sqrt((v**2).sum(axis=(0, 1), keepdims=True))
        pos_w = g * v / np.maximum(norm, 1e-12)
    else:
        pos_w = np.asarray(sd["encoder.pos_conv_embed.conv.weight"])

    def block(i):
        b = f"encoder.layers.{i}"
        return {
            "attn": {
                "q": _lin(sd, f"{b}.attention.q_proj"),
                "k": _lin(sd, f"{b}.attention.k_proj"),
                "v": _lin(sd, f"{b}.attention.v_proj"),
                "o": _lin(sd, f"{b}.attention.out_proj"),
            },
            "norm1": _ln(sd, f"{b}.layer_norm"),
            "ffn": {
                "fc1": _lin(sd, f"{b}.feed_forward.intermediate_dense"),
                "fc2": _lin(sd, f"{b}.feed_forward.output_dense"),
            },
            "norm2": _ln(sd, f"{b}.final_layer_norm"),
        }

    return {
        "conv_layers": convs,
        "feature_projection": {
            "norm": _ln(sd, "feature_projection.layer_norm"),
            "proj": _lin(sd, "feature_projection.projection"),
        },
        "pos_conv": {
            "w": jnp.asarray(np.asarray(pos_w).transpose(2, 1, 0)),
            "b": jnp.asarray(sd["encoder.pos_conv_embed.conv.bias"]),
        },
        "encoder_norm": _ln(sd, "encoder.layer_norm"),
        "blocks": [block(i) for i in range(cfg.num_layers)],
    }


# ---------------------------------------------------------------------------
# our own checkpoints (orbax)
# ---------------------------------------------------------------------------


def save_checkpoint(path: str, tree) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(path, tree)
    ckpt.wait_until_finished()


def restore_checkpoint(path: str, template=None):
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckpt = ocp.StandardCheckpointer()
    if template is not None:
        return ckpt.restore(path, template)
    return ckpt.restore(path)


def merge_pt_override(params, sd: StateDict, cfg) -> dict:
    """Overlay a fine-tuned `.pt` state dict onto converted params, skipping
    size-mismatched tensors (reference non-strict merge,
    `inference.py:485-490` + `wan_fantasy_transformer3d_1B.py:1322-1331`).

    Returns the merged pytree; logs skipped keys.
    """
    override = convert_dit(sd, cfg)

    skipped = []

    def merge(path, base, new):
        if new is None:
            return base
        if hasattr(base, "shape") and hasattr(new, "shape"):
            if base.shape != new.shape:
                skipped.append("/".join(str(getattr(k, "key", k)) for k in path))
                return base
            return new
        return new

    import jax

    merged = jax.tree_util.tree_map_with_path(
        lambda p, b, n: merge(p, b, n), params, override
    )
    if skipped:
        print(f"merge_pt_override: skipped {len(skipped)} size-mismatched tensors")
    return merged


# ---------------------------------------------------------------------------
# JAX -> torch export (the inverse direction)
# ---------------------------------------------------------------------------
#
# The reference training loop writes a raw `transformer3d-*.pt` state dict
# next to every checkpoint (`train_1B_square.py:1331-1362`) so models can be
# handed to the rest of the ecosystem.  `export_dit_to_torch_state_dict` is
# the exact inverse of `convert_dit` (roundtrip bit-exact in fp32,
# tests/test_export.py); `save_torch_dit` writes the .pt (torch) or
# .safetensors file.


def _ex_lin(sd, name, p):
    sd[f"{name}.weight"] = np.asarray(p["w"], np.float32).T.copy()
    if "b" in p:
        sd[f"{name}.bias"] = np.asarray(p["b"], np.float32)


def _ex_ln(sd, name, p):
    sd[f"{name}.weight"] = np.asarray(p["w"], np.float32)
    sd[f"{name}.bias"] = np.asarray(p["b"], np.float32)


def _ex_rms(sd, name, p):
    sd[f"{name}.weight"] = np.asarray(p["w"], np.float32)


def export_vocal_projector(params, cfg, prefix: str = "") -> Dict[str, np.ndarray]:
    sd: Dict[str, np.ndarray] = {}
    pp = params["proj"]
    if "fc" in pp:
        _ex_lin(sd, f"{prefix}proj_model.proj", pp["fc"])
        _ex_ln(sd, f"{prefix}proj_model.norm", pp["norm"])
    else:
        _ex_lin(sd, f"{prefix}proj_model.proj_1", pp["fc1"])
        _ex_ln(sd, f"{prefix}proj_model.norm_1", pp["norm1"])
        _ex_lin(sd, f"{prefix}proj_model.proj_2", pp["fc2"])
        _ex_ln(sd, f"{prefix}proj_model.norm_2", pp["norm"])
    for i, bp in enumerate(params["blocks"]):
        b = f"{prefix}blocks.{i}"
        _ex_ln(sd, f"{b}.norm3", bp["norm3"])
        ca = bp["cross_attn"]
        for n in ("q", "k", "v", "o"):
            _ex_lin(sd, f"{b}.cross_attn.{n}", ca[n])
        _ex_rms(sd, f"{b}.cross_attn.norm_q", ca["norm_q"])
        _ex_rms(sd, f"{b}.cross_attn.norm_k", ca["norm_k"])
        _ex_lin(sd, f"{b}.ffn.0", bp["ffn"]["fc1"])
        _ex_lin(sd, f"{b}.ffn.2", bp["ffn"]["fc2"])
        sd[f"{b}.modulation"] = np.asarray(bp["modulation"], np.float32)
    _ex_lin(sd, f"{prefix}final_head.final_proj", params["final_head"]["final_proj"])
    sd[f"{prefix}final_head.modulation"] = np.asarray(
        params["final_head"]["modulation"], np.float32
    )
    return sd


def export_dit_to_torch_state_dict(params, cfg) -> Dict[str, np.ndarray]:
    """init_dit pytree -> Wan torch key layout (inverse of `convert_dit`).

    Stacked scan blocks are unstacked to `blocks.{i}.*`; the patch embedding
    matmul weight is reshaped back to Conv3d [O, I, kt, kh, kw].  Quantized
    (w8/storage-int8) leaves must be dequantized by the caller first — this
    exports the canonical bf16/f32 tree."""
    import jax

    sd: Dict[str, np.ndarray] = {}

    pt, ph, pw = cfg.patch_size
    pe = np.asarray(params["patch_embedding"]["w"], np.float32)  # [I*k, O]
    o = pe.shape[1]
    sd["patch_embedding.weight"] = (
        pe.T.reshape(o, cfg.in_dim, pt, ph, pw).copy()
    )
    sd["patch_embedding.bias"] = np.asarray(params["patch_embedding"]["b"], np.float32)

    _ex_lin(sd, "text_embedding.0", params["text_embedding"]["fc1"])
    _ex_lin(sd, "text_embedding.2", params["text_embedding"]["fc2"])
    _ex_lin(sd, "time_embedding.0", params["time_embedding"]["fc1"])
    _ex_lin(sd, "time_embedding.2", params["time_embedding"]["fc2"])
    _ex_lin(sd, "time_projection.1", params["time_projection"]["fc"])
    _ex_ln(sd, "img_emb.proj.0", params["img_emb"]["norm1"])
    _ex_lin(sd, "img_emb.proj.1", params["img_emb"]["fc1"])
    _ex_lin(sd, "img_emb.proj.3", params["img_emb"]["fc2"])
    _ex_ln(sd, "img_emb.proj.4", params["img_emb"]["norm2"])

    blocks = params["blocks"]
    for i in range(cfg.num_layers):
        bp = jax.tree.map(lambda a: a[i], blocks)
        b = f"blocks.{i}"
        sa = bp["self_attn"]
        for n in ("q", "k", "v", "o"):
            _ex_lin(sd, f"{b}.self_attn.{n}", sa[n])
        _ex_rms(sd, f"{b}.self_attn.norm_q", sa["norm_q"])
        _ex_rms(sd, f"{b}.self_attn.norm_k", sa["norm_k"])
        _ex_ln(sd, f"{b}.norm3", bp["norm3"])
        ca = bp["cross_attn"]
        for n in ("q", "k", "v", "o", "k_img", "v_img", "k_vocal", "v_vocal"):
            _ex_lin(sd, f"{b}.cross_attn.{n}", ca[n])
        _ex_rms(sd, f"{b}.cross_attn.norm_q", ca["norm_q"])
        _ex_rms(sd, f"{b}.cross_attn.norm_k", ca["norm_k"])
        _ex_rms(sd, f"{b}.cross_attn.norm_k_img", ca["norm_k_img"])
        _ex_lin(sd, f"{b}.ffn.0", bp["ffn"]["fc1"])
        _ex_lin(sd, f"{b}.ffn.2", bp["ffn"]["fc2"])
        sd[f"{b}.modulation"] = np.asarray(bp["modulation"], np.float32)

    _ex_lin(sd, "head.head", params["head"]["head"])
    sd["head.modulation"] = np.asarray(params["head"]["modulation"], np.float32)

    sd.update(
        export_vocal_projector(
            params["vocal_projector"], cfg, prefix="vocal_projector."
        )
    )
    return sd


def save_torch_dit(path: str, params, cfg):
    """Write the exported state dict as .pt (torch.save) or .safetensors."""
    sd = export_dit_to_torch_state_dict(params, cfg)
    if path.endswith(".safetensors"):
        from safetensors.numpy import save_file

        save_file(sd, path)
        return path
    import torch

    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, path)
    return path

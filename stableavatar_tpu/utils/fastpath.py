"""Inference fast-path parameter preparation (TPU MXU int8 + fused rope).

Two transforms over a DiT parameter pytree (`models/dit.py:init_dit` layout):

1. **Split-pair rope permutation** — self-attention q/k projection output
   channels (and their RMS-norm weights) are permuted per head so rope pairs
   live at (j, j + d/2) instead of interleaved (2j, 2j+1)
   (`ops/rope.py:split_pair_permutation`).  Attention logits are invariant
   under this joint permutation; it lets the flash kernel fuse the rotation
   as two contiguous half-register ops (`ops/flash_attention.py`).
2. **int8 quantization** of every per-block linear (self/cross attention
   projections + FFN), in one of two forms:
   - `quant=True` — COMPUTE quantization (W8A8): the matmul runs on the
     int8 MXU at ~2x bf16 throughput (`utils/quantization.py:int8_linear`).
     Activations are dynamically quantized; numerics shift accordingly.
   - `quant="store"` — STORAGE quantization only: weights live as int8 +
     per-channel scales (half the HBM) and are dequantized to bf16 at use
     (XLA fuses the dequant multiply into the matmul).  This is the TPU
     analog of the reference's fp8 weight-storage memory mode
     (`wan/utils/fp8_optimization.py:28-56`): weight-rounding error only,
     bf16 compute.

Prepared params are consumed by `dit_forward(..., rope_split=True,
attn_quant=...)`.  They are an inference-only representation: not meant for
training, export, or checkpointing (keep the canonical bf16 tree for those).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from stableavatar_tpu.config import DiTConfig
from stableavatar_tpu.ops.rope import split_pair_permutation
from stableavatar_tpu.utils.quantization import (
    quantize_weight,
    quantize_weight_for_compute,
)

# per-block linear params large enough to benefit from the int8 MXU
_QUANT_TARGETS = (
    ("self_attn", "q"),
    ("self_attn", "k"),
    ("self_attn", "v"),
    ("self_attn", "o"),
    ("cross_attn", "q"),
    ("cross_attn", "k"),
    ("cross_attn", "v"),
    ("cross_attn", "o"),
    ("cross_attn", "k_img"),
    ("cross_attn", "v_img"),
    ("cross_attn", "k_vocal"),
    ("cross_attn", "v_vocal"),
    ("ffn", "fc1"),
    ("ffn", "fc2"),
)


def _copy2(tree):
    """Shallow-copy nested dicts two levels deep (leaves shared)."""
    return {
        k: ({kk: vv for kk, vv in v.items()} if isinstance(v, dict) else v)
        for k, v in tree.items()
    }


def prepare_fast_params(params, cfg: DiTConfig, quant=True):
    """Return a fast-path param tree (input tree is not modified).

    quant=True quantizes for int8 MXU COMPUTE (W8A8); quant="store"
    quantizes weight STORAGE only (bf16 compute, `apply_linear` dequant
    dispatch); quant=False applies only the rope permutation (use with
    `attn_quant="none"` for a bf16-but-fused-rope configuration).
    """
    out = dict(params)
    blocks = _copy2(params["blocks"])

    perm = jnp.asarray(split_pair_permutation(cfg.head_dim, cfg.num_heads))
    sa = blocks["self_attn"] = dict(blocks["self_attn"])
    for proj in ("q", "k"):
        p = dict(sa[proj])
        p["w"] = p["w"][..., perm]
        if "b" in p:
            p["b"] = p["b"][..., perm]
        sa[proj] = p
        np_ = dict(sa[f"norm_{proj}"])
        np_["w"] = np_["w"][..., perm]
        sa[f"norm_{proj}"] = np_

    if quant:
        for mod, name in _QUANT_TARGETS:
            grp = blocks[mod] = dict(blocks[mod])
            p = grp[name]
            if quant == "store":
                new = {"w": quantize_weight(p["w"])}
            else:
                new = {"w8": quantize_weight_for_compute(p["w"])}
            if "b" in p:
                new["b"] = p["b"]
            grp[name] = new

    out["blocks"] = blocks
    return out

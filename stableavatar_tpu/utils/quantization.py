"""Quantized weight storage — TPU analog of the reference fp8 offload mode.

The reference's `model_cpu_offload_and_qfloat8` stores weights in float8 and
autocasts on use (`wan/utils/fp8_optimization.py:28-56`) to fit 1.3B+T5 in
13 GB.  On TPU we store int8 per-output-channel symmetric quantized weights
(half the HBM of bf16) and dequantize at use; XLA fuses the dequant multiply
into the following matmul.  Optionally the dequant-matmul can run as a Pallas
int8 kernel for MXU int8 throughput (later perf pass).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_MIN_QUANT_SIZE = 2**16


def quantize_weight(w: jnp.ndarray):
    """[.., d_in, d_out] float -> {'q': int8, 's': fp16 scale per out-channel}."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)
    scale = jnp.maximum(amax / 127.0, 1e-12)
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return {"q": q, "s": scale.astype(jnp.float16)}


def dequantize_weight(p, dtype=jnp.bfloat16):
    return (p["q"].astype(jnp.float32) * p["s"].astype(jnp.float32)).astype(dtype)


def is_quantized(leaf) -> bool:
    return isinstance(leaf, dict) and "q" in leaf and "s" in leaf


def quantize_params(params, min_size: int = _MIN_QUANT_SIZE):
    """Quantize every large linear weight leaf named 'w' in the pytree."""

    def visit(path, leaf):
        name = str(getattr(path[-1], "key", path[-1])) if path else ""
        if (
            name == "w"
            and hasattr(leaf, "ndim")
            and leaf.ndim >= 2
            and leaf.size >= min_size
            and jnp.issubdtype(leaf.dtype, jnp.floating)
        ):
            return quantize_weight(leaf)
        return leaf

    return jax.tree_util.tree_map_with_path(
        visit, params, is_leaf=lambda x: hasattr(x, "ndim")
    )


def dequantize_params(params, dtype=jnp.bfloat16):
    def visit(leaf):
        if is_quantized(leaf):
            return dequantize_weight(leaf, dtype)
        return leaf

    return jax.tree.map(visit, params, is_leaf=lambda x: is_quantized(x) or hasattr(x, "ndim"))


# ---------------------------------------------------------------------------
# int8 COMPUTE quantization (W8A8) — the MXU fast path
# ---------------------------------------------------------------------------
#
# Distinct from the storage quant above: here the matmul itself runs on the
# int8 MXU (394 TOPS on v5e = 2x bf16; measured 292 TOPS effective for the
# full dynamic-quant W8A8 linear at the DiT FFN shape, scripts/
# microbench_int8.py).  Weights are per-out-channel symmetric int8;
# activations are quantized per token (dynamic absmax row scales) at use.
# A linear param dict carries {"w8": {"q": int8 [d_in, d_out],
# "s": f32 [d_out]}} instead of "w"; `apply_linear` dispatches on it.


def quantize_weight_for_compute(w: jnp.ndarray):
    """[.., d_in, d_out] float -> {'q': int8, 's': f32 [.., d_out]}."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=-2)
    scale = jnp.maximum(amax / 127.0, 1e-12)
    q = jnp.clip(jnp.round(wf / scale[..., None, :]), -127, 127).astype(jnp.int8)
    return {"q": q, "s": scale}


def int8_linear(x: jnp.ndarray, w8, b=None) -> jnp.ndarray:
    """y = x @ W (+ b) on the int8 MXU with dynamic per-row activation quant.

    x: [..., d_in] float; w8: {'q': int8 [d_in, d_out], 's': f32 [d_out]}.
    """
    xf = x.astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0, 1e-10)
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(
        xq, w8["q"], (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = (y.astype(jnp.float32) * sx * w8["s"].astype(jnp.float32)).astype(x.dtype)
    if b is not None:
        y = y + b.astype(x.dtype)
    return y

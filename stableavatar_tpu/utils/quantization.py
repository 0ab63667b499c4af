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

"""Normalization primitives with fp32 internals.

The reference computes every norm in float32 and casts back to the activation
dtype (`wan/models/wan_fantasy_transformer3d_1B.py:326-355`).  We keep the same
numeric contract: reductions in fp32, output cast back to the input dtype, and
the affine weight applied *after* the cast (matching `WanRMSNorm.forward`).
XLA fuses these into the surrounding matmuls, so there is no reason to hand
write a Pallas kernel here.
"""

from __future__ import annotations

from typing import Optional

import jax.lax as lax
import jax.numpy as jnp


def _rsqrt(x):
    return lax.rsqrt(x)


def rms_norm(x: jnp.ndarray, weight: Optional[jnp.ndarray] = None, eps: float = 1e-5):
    """RMSNorm over the last axis; fp32 internals.

    Matches reference `WanRMSNorm` (`wan_fantasy_transformer3d_1B.py:326-342`):
    ``norm(x.float()).type_as(x) * weight`` — note the weight multiplies the
    *cast-back* value, in the weight's own dtype promotion.
    """
    xf = x.astype(jnp.float32)
    normed = xf * _rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    normed = normed.astype(x.dtype)
    if weight is not None:
        normed = normed * weight
    return normed


def layer_norm(
    x: jnp.ndarray,
    weight: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
    eps: float = 1e-6,
):
    """LayerNorm over the last axis; fp32 internals, cast back to input dtype.

    Matches reference `WanLayerNorm` (`wan_fantasy_transformer3d_1B.py:345-355`)
    which runs `F.layer_norm` on `x.float()` then casts back; when affine, the
    weight/bias participate in fp32 (torch applies them inside layer_norm before
    the cast back).
    """
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    normed = (xf - mean) * _rsqrt(var + eps)
    if weight is not None:
        normed = normed * weight.astype(jnp.float32)
    if bias is not None:
        normed = normed + bias.astype(jnp.float32)
    return normed.astype(x.dtype)


def t5_rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-6):
    """T5-style RMSNorm (no mean subtraction, weight in weight dtype).

    Matches reference `T5LayerNorm` (`wan/models/wan_text_encoder.py:44-56`):
    the input is scaled by rsqrt of the fp32 mean-square computed from x, then
    cast to the weight dtype if the weight is half precision.
    """
    xf = x.astype(jnp.float32)
    normed = x * _rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps).astype(x.dtype)
    return weight * normed.astype(weight.dtype)

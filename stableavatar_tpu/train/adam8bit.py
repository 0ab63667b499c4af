"""AdamW with int8-quantized second moment — the `--use_8bit_adam`
(bitsandbytes) analog for TPU.

The reference optionally swaps torch AdamW for bitsandbytes 8-bit Adam
(`train_1B_square.py:910-918`) to shrink optimizer state.  Here the second
moment (nu) is stored as per-block int8 with fp32 block scales (block = last
axis), dequantized inside the update; the first moment stays bf16.  For a
1.3B model this cuts optimizer state from ~10.4 GB (fp32 mu+nu) to ~3.9 GB.

Implemented as a self-contained optax GradientTransformation.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class _QuantState(NamedTuple):
    q: jnp.ndarray  # int8 values
    scale: jnp.ndarray  # fp32 per-last-axis-block scale


def _quantize(x: jnp.ndarray) -> _QuantState:
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    scale = jnp.maximum(amax / 127.0, 1e-20)
    q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return _QuantState(q, scale.astype(jnp.float32))


def _dequantize(s: _QuantState) -> jnp.ndarray:
    return s.q.astype(jnp.float32) * s.scale


class Adam8BitState(NamedTuple):
    count: jnp.ndarray
    mu: optax.Updates  # bf16
    nu: optax.Updates  # _QuantState pytree


def scale_by_adam8bit(b1: float = 0.9, b2: float = 0.999, eps: float = 1e-10):
    def init_fn(params):
        mu = jax.tree.map(lambda p: jnp.zeros_like(p, dtype=jnp.bfloat16), params)
        nu = jax.tree.map(lambda p: _quantize(jnp.zeros_like(p, dtype=jnp.float32)), params)
        return Adam8BitState(jnp.zeros([], jnp.int32), mu, nu)

    def update_fn(updates, state, params=None):
        count = state.count + 1
        b1c = 1 - b1**count.astype(jnp.float32)
        b2c = 1 - b2**count.astype(jnp.float32)

        def upd(g, mu, nu_q):
            g = g.astype(jnp.float32)
            mu_f = mu.astype(jnp.float32) * b1 + g * (1 - b1)
            nu_f = _dequantize(nu_q) * b2 + jnp.square(g) * (1 - b2)
            step = (mu_f / b1c) / (jnp.sqrt(nu_f / b2c) + eps)
            return step, mu_f.astype(jnp.bfloat16), _quantize(nu_f)

        flat_u, treedef = jax.tree.flatten(updates)
        flat_mu = treedef.flatten_up_to(state.mu)
        flat_nu = treedef.flatten_up_to(state.nu)
        out = [upd(g, m, n) for g, m, n in zip(flat_u, flat_mu, flat_nu)]
        steps = treedef.unflatten([o[0] for o in out])
        mu = treedef.unflatten([o[1] for o in out])
        nu = treedef.unflatten([o[2] for o in out])
        return steps, Adam8BitState(count, mu, nu)

    return optax.GradientTransformation(init_fn, update_fn)


def adamw8bit(
    learning_rate: float,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-10,
    weight_decay: float = 3e-2,
):
    return optax.chain(
        scale_by_adam8bit(b1, b2, eps),
        optax.add_decayed_weights(weight_decay),
        optax.scale(-learning_rate),
    )

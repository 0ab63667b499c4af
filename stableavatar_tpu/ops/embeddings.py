"""Timestep / positional embeddings."""

from __future__ import annotations

import jax.numpy as jnp


def sinusoidal_embedding_1d(dim: int, position: jnp.ndarray) -> jnp.ndarray:
    """Sinusoidal timestep embedding, [cos | sin] layout.

    Matches reference `sinusoidal_embedding_1d`
    (`wan_fantasy_transformer3d_1B.py:210-220`): float64 there; fp32 here is
    plenty for the t in [0, 1000] range, and fp64 is unavailable on TPU.

    Args:
      dim: embedding dim (even).
      position: [...] timestep values.

    Returns: [..., dim] fp32.
    """
    assert dim % 2 == 0
    half = dim // 2
    pos = position.astype(jnp.float32)
    freqs = jnp.power(10000.0, -jnp.arange(half, dtype=jnp.float32) / half)
    sinusoid = pos[..., None] * freqs
    return jnp.concatenate([jnp.cos(sinusoid), jnp.sin(sinusoid)], axis=-1)

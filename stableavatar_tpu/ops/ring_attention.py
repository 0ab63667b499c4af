"""Ring attention over the 'sp' mesh axis.

TPU-native replacement for xfuser's ring long-context attention
(`wan/dist/wan_xfuser.py:72-115`, ring x ulysses composition at
`inference.py:445-449`): K/V shards rotate around the ICI ring with
`lax.ppermute` while each device accumulates combinable flash-attention
partials for its local queries.  Partials are carried in normalized form
(o_i = acc_i / l_i, lse_i = m_i + log l_i); two partials over disjoint key
sets merge exactly as

    lse* = logsumexp_i(lse_i),   o* = sum_i o_i * exp(lse_i - lse*)

Use when a single device cannot hold the full K/V (14B at long sequence);
for everything smaller the Ulysses-style head resharding in
`models/dit.py::_self_attention` is cheaper (one all-to-all pair instead of
W-1 permutes).

The per-chunk partials come from the fused Pallas flash kernel
(`ops/flash_attention.py:flash_attention_with_stats`, which emits LSE from
the same online-softmax pass) on TPU, and from an equivalent jnp reference
on CPU — which also makes the ring logic testable on the virtual CPU mesh.
Rope must be applied to q/k before entering the ring (positions are global;
each device's k chunk keeps rotating), so the in-kernel rope fusion is not
used here.  `quant` selects the int8 MXU path per chunk.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from stableavatar_tpu.ops import flash_attention as fa


def _stats_jnp(q, k, v, scale):
    """(o, lse) partials, jnp reference path (materializes [B,N,Lq,Lk] —
    CPU/testing only).  o [B, Lq, N, D] in q.dtype, lse [B, Lq, N] f32."""
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    s = jnp.einsum("bqnd,bknd->bnqk", qf, kf) * scale
    m = jnp.max(s, axis=-1)  # [B, N, Lq]
    p = jnp.exp(s - m[..., None])
    l = jnp.sum(p, axis=-1)
    o = jnp.einsum("bnqk,bknd->bqnd", p, v.astype(jnp.float32))
    o = o / jnp.maximum(l[..., None].transpose(0, 2, 1, 3), 1e-30)
    lse = (m + jnp.log(jnp.maximum(l, 1e-30))).transpose(0, 2, 1)
    return o.astype(q.dtype), lse


def attention_partials(q, k, v, scale: Optional[float] = None, quant: str = "none"):
    """Per-chunk combinable partials (o, lse).  Fused Pallas kernel on TPU,
    jnp reference elsewhere."""
    d = q.shape[-1]
    if scale is None:
        scale = d**-0.5
    if jax.default_backend() == "tpu":
        return fa.flash_attention_with_stats(q, k, v, scale=scale, quant=quant)
    return _stats_jnp(q, k, v, scale)


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    axis_name: str = "sp",
    scale: Optional[float] = None,
    quant: str = "none",
) -> jnp.ndarray:
    """Attention with K/V rotating around the `axis_name` ring.

    Call under `shard_map` with q, k, v sequence-sharded over `axis_name`
    (each device sees its local [B, L/W, N, D] chunks, rope already
    applied).  Output is the local query chunk's attention over the GLOBAL
    key/value sequence.

    INFERENCE-ONLY: the backward of the custom VJP raises — training shards
    with ulysses/sp instead (`parallel/sharding.py`); fail loudly rather
    than let autodiff silently differentiate through ppermute ring math
    that was never validated backward.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    return _ring(q, k, v, axis_name, scale, quant)


from functools import partial as _partial  # noqa: E402


@_partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _ring(q, k, v, axis_name, scale, quant):
    w = jax.lax.psum(1, axis_name)
    perm = [(i, (i + 1) % w) for i in range(w)]

    o0, lse0 = attention_partials(q, k, v, scale, quant)

    def body(i, carry):
        k_cur, v_cur, o, lse = carry
        k_cur = jax.lax.ppermute(k_cur, axis_name, perm)
        v_cur = jax.lax.ppermute(v_cur, axis_name, perm)
        o_i, lse_i = attention_partials(q, k_cur, v_cur, scale, quant)
        m = jnp.maximum(lse, lse_i)
        w_old = jnp.exp(lse - m)
        w_new = jnp.exp(lse_i - m)
        denom = w_old + w_new
        o = (
            o.astype(jnp.float32) * (w_old / denom)[..., None]
            + o_i.astype(jnp.float32) * (w_new / denom)[..., None]
        ).astype(o.dtype)
        lse = m + jnp.log(denom)
        return (k_cur, v_cur, o, lse)

    _, _, o, _ = jax.lax.fori_loop(0, w - 1, body, (k, v, o0, lse0))
    return o.astype(q.dtype)


def _ring_fwd(q, k, v, axis_name, scale, quant):
    return _ring(q, k, v, axis_name, scale, quant), None


def _ring_bwd(axis_name, scale, quant, res, g):
    raise NotImplementedError(
        "ring_attention has no VJP (inference-only); train with "
        "attn_impl='ulysses' instead"
    )


_ring.defvjp(_ring_fwd, _ring_bwd)

"""Unified attention API with ragged-key (`k_lens`) semantics.

The reference funnels every attention call through a single wrapper that
dispatches FlashAttention-3 -> FlashAttention-2 -> torch SDPA and emulates
ragged batches by packing with cu_seqlens
(`wan/models/wan_fantasy_transformer3d_1B.py:49-207`).  On TPU there is no
separate "flash" library: XLA already emits a fused, online-softmax attention
for `jax.nn.dot_product_attention`, and for the biggest DiT self-attention
shapes we provide a hand-tiled Pallas kernel
(`stableavatar_tpu/ops/flash_attention.py`).

Ragged keys (`k_lens`) become a static-shaped length mask — no packing, no
dynamic shapes, jit-friendly.

Shapes follow the reference convention: q [B, Lq, N, D], k/v [B, Lk, N, D],
output [B, Lq, N, D].
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    k_lens: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    causal: bool = False,
    backend: str = "auto",
    rope: Optional[jnp.ndarray] = None,
    quant: str = "none",
) -> jnp.ndarray:
    """Fused scaled dot-product attention.

    Args:
      q: [B, Lq, N, D]
      k, v: [B, Lk, N, D]
      k_lens: optional [B] int32 — number of valid keys per batch row; keys at
        positions >= k_lens[b] are masked out (reference `attention()` k_lens
        semantics, `wan_fantasy_transformer3d_1B.py:163-171`).
      scale: softmax scale; defaults to D**-0.5.
      causal: causal masking (unused by the Wan models; kept for API parity).
      backend: "auto" | "xla" | "pallas".
      rope: optional packed [L, D] cos||sin table (`ops/rope.py:pack_split`);
        q/k must be in split-pair channel layout.  The Pallas path fuses the
        rotation into the kernel; the XLA path applies it out-of-kernel.
      quant: "none" | "qk" | "qkpv" — int8 MXU fast path (Pallas only;
        inference only).  The XLA path ignores it (full precision).

    Returns: [B, Lq, N, D] in q.dtype.
    """
    use_pallas = backend == "pallas" or (backend == "auto" and _use_pallas(q, k))
    if use_pallas:
        from stableavatar_tpu.ops.flash_attention import flash_attention

        if quant != "none":
            # int8 path: rope fuses into the kernel's XLA quantization prep
            return flash_attention(
                q, k, v, k_lens=k_lens, scale=scale, causal=causal, rope=rope,
                quant=quant,
            )
        if rope is not None:
            # split-pair rotation as a fused XLA pass is faster than
            # re-rotating per (q-block, k-block) cell inside the kernel
            # (measured: scripts/bench_dit_step.py)
            from stableavatar_tpu.ops.rope import rope_apply_split

            dt = q.dtype
            q = rope_apply_split(q, rope).astype(dt)
            k = rope_apply_split(k, rope).astype(dt)
        return flash_attention(q, k, v, k_lens=k_lens, scale=scale, causal=causal)
    if rope is not None:
        from stableavatar_tpu.ops.rope import rope_apply_split

        dt = q.dtype
        q = rope_apply_split(q, rope).astype(dt)
        k = rope_apply_split(k, rope).astype(dt)
    return _xla_attention(q, k, v, k_lens=k_lens, scale=scale, causal=causal)


def _use_pallas(q: jnp.ndarray, k: jnp.ndarray) -> bool:
    """Use the Pallas kernel on TPU for long-query attention.  XLA's
    dot_product_attention materializes the full [B,N,Lq,Lk] fp32 logits
    (66 GB at the 21.5k-token DiT self-attention — measured OOM), so every
    long-Lq call must go through the flash kernel; short-Lq calls (vocal
    per-frame, VAE) are fine on XLA."""
    if jax.default_backend() != "tpu":
        return False
    lq, d = q.shape[1], q.shape[3]
    return lq >= 2048 and d % 64 == 0


def _xla_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    k_lens: Optional[jnp.ndarray],
    scale: Optional[float],
    causal: bool,
) -> jnp.ndarray:
    """XLA fused attention path (`jax.nn.dot_product_attention`)."""
    return jax.nn.dot_product_attention(
        q,
        k,
        v,
        scale=scale,
        is_causal=causal,
        key_value_seq_lengths=k_lens,
        implementation="xla",
    )

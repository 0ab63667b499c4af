"""Fused dual-context cross-attention for TPU (Pallas).

The DiT cross-attention (`models/dit.py:_cross_attention`, reference
`wan_fantasy_transformer3d_1B.py:504-605`) computes

    out = attn(q, k_text, v_text) + attn(q, k_img, v_img)

— two SEPARATE softmaxes over short contexts (Lk = 512 text / 257 image at
the umT5/CLIP token budgets), summed.  Run as two generic flash calls this
regime measures only ~82 TF/s vs 140 for self-attention (docs/PERF.md):
each call's grid has a single k step, so the per-cell fixed cost (q-block
load, accumulator init, finalize divide, output write) amortizes over ~42x
fewer MXU FLOPs than the 21.5k-token self-attention, and q (198 MB at the
512^2 window) is streamed from HBM twice, out written twice, plus a third
elementwise pass for the add.

This kernel exploits the structural fact that EACH context fits one
k-block, so no online-softmax machinery is needed at all:

- both contexts are concatenated (each zero-padded to a lane multiple) into
  one [Lk1p + Lk2p, D] block kept resident in VMEM across the whole grid;
- one MXU dot produces the joint logits s = q_blk @ [k1 || k2]^T;
- the softmax is SEGMENTED: per-segment row max / row sum, each column
  normalized by ITS segment's statistics (exact, not online — single
  block), padding columns forced to zero mass;
- one MXU dot p_norm @ [v1 || v2] then yields exactly
  attn(q, k1, v1) + attn(q, k2, v2) because the normalized segment rows sum
  independently;
- q is read once, out written once, no scratch accumulators, grid
  (batch*heads, q_blocks) with no k dimension.

Numerics match the two-call path to bf16 rounding (same exp2 softmax
domain, same dot precision); equality asserted in
tests/test_cross_attention.py.  Inference-only (no VJP): the training path
keeps the two generic attention calls.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stableavatar_tpu.ops.flash_attention import EXP2_SOFTMAX, LOG2E, NEG_INF

def _dual_body(
    q_ref,   # [1, BQ, D]
    kc_ref,  # [1, LKP, D]  (k1 padded || k2 padded)
    vc_ref,  # [1, LKP, D]
    o_ref,   # [1, BQ, D]
    *,
    scale: float,
    p1: int,   # padded length of segment 1 (segment 2 starts here)
    l1: int,   # valid keys in segment 1
    l2: int,   # valid keys in segment 2
):
    q = q_ref[0]
    kc = kc_ref[0]
    vc = vc_ref[0]

    s = jax.lax.dot_general(
        q, kc, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = s * scale  # exp2 mode: log2(e) pre-folded by the caller

    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    seg1 = col < p1
    # select on int32 bounds, not on booleans: an i1-valued where lowers to
    # an i8->i1 arith.trunci that Mosaic rejects ("Unsupported target
    # bitwidth for truncation", measured on v5e)
    valid = col < jnp.where(seg1, l1, p1 + l2)
    s = jnp.where(valid, s, NEG_INF)

    exp = jnp.exp2 if EXP2_SOFTMAX else jnp.exp
    # per-segment exact softmax statistics (single block per segment)
    m1 = jnp.max(jnp.where(seg1, s, NEG_INF), axis=1, keepdims=True)
    m2 = jnp.max(jnp.where(seg1, NEG_INF, s), axis=1, keepdims=True)
    p = exp(s - jnp.where(seg1, m1, m2))
    p = jnp.where(valid, p, 0.0)
    l1s = jnp.sum(jnp.where(seg1, p, 0.0), axis=1, keepdims=True)
    l2s = jnp.sum(jnp.where(seg1, 0.0, p), axis=1, keepdims=True)
    inv1 = 1.0 / jnp.maximum(l1s, 1e-30)
    inv2 = 1.0 / jnp.maximum(l2s, 1e-30)
    p = p * jnp.where(seg1, inv1, inv2)

    o_ref[0] = jax.lax.dot_general(
        p.astype(vc.dtype), vc, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def _pad_seq(x, target):
    pad = target - x.shape[1]
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0), (0, 0)))
    return x


def _dual_reference(q, k1, v1, k2, v2, scale):
    """Two fused-XLA attention calls — the semantics oracle and the
    non-TPU fallback (identical math to models/dit.py's two-call path)."""
    a = jax.nn.dot_product_attention(q, k1, v1, scale=scale,
                                     implementation="xla")
    b = jax.nn.dot_product_attention(q, k2, v2, scale=scale,
                                     implementation="xla")
    return a + b


def dual_context_attention(
    q: jnp.ndarray,   # [B, Lq, N, D]
    k1: jnp.ndarray,  # [B, L1, N, D]
    v1: jnp.ndarray,
    k2: jnp.ndarray,  # [B, L2, N, D]
    v2: jnp.ndarray,
    *,
    scale: Optional[float] = None,
    block_q: int = 1024,
    backend: str = "auto",
    interpret: bool = False,
) -> jnp.ndarray:
    """attn(q,k1,v1) + attn(q,k2,v2), routed to the measured-fastest path.

    Routing is decided by the IN-CONTEXT measurement, not the isolated
    microbench — the two disagree.  Full DiT window step, same process,
    min of 3 (scripts/bench_cross_route.py, v5e, fast path):

        two Pallas flash calls   3.045 s/step   (shipped r4 path)
        two XLA SDPA calls       3.191 s/step
        fused Pallas (this file) 2.944 s/step   <- winner, adopted

    The isolated chain (scripts/bench_cross_fused.py) ranks them the
    OPPOSITE way (XLA 9.7 ms/layer < fused 16.8 < two-Pallas 20.1): with
    the whole chip to itself, XLA streams the materialized f32 logits at
    full HBM bandwidth, but inside the real block that ~1.9 GB/layer of
    logit traffic competes with the surrounding projections and loses to
    the kernel that never leaves VMEM.  `auto` therefore picks the fused
    kernel for long-q TPU shapes (same lq>=2048 criterion as
    ops/attention.py:_use_pallas); `STABLEAVATAR_DUAL_CROSS` in
    {"xla","pallas"} forces a path for experiments.  Inference-only (no
    VJP on the kernel path)."""
    import os

    b, lq, n, d = q.shape
    if scale is None:
        scale = d ** -0.5
    if backend == "auto":
        backend = os.environ.get("STABLEAVATAR_DUAL_CROSS", "auto")
    if backend == "auto":
        use_pallas = jax.default_backend() == "tpu" and lq >= 2048
    else:
        use_pallas = backend == "pallas"
    if not use_pallas and not interpret:
        return _dual_reference(q, k1, v1, k2, v2, scale)

    l1, l2 = k1.shape[1], k2.shape[1]
    p1 = -(-l1 // 128) * 128
    p2 = -(-l2 // 128) * 128
    lkp = p1 + p2
    kc = jnp.concatenate([_pad_seq(k1, p1), _pad_seq(k2, p2)], axis=1)
    vc = jnp.concatenate([_pad_seq(v1, p1), _pad_seq(v2, p2)], axis=1)

    block_q = min(block_q, max(128, -(-lq // 128) * 128))
    pad_q = (-lq) % block_q
    qp = jnp.pad(q, ((0, 0), (0, pad_q), (0, 0), (0, 0)))
    lqp = lq + pad_q

    def to_bh(x, l):
        return x.transpose(0, 2, 1, 3).reshape(b * n, l, d)

    qp, kc, vc = to_bh(qp, lqp), to_bh(kc, lkp), to_bh(vc, lkp)

    import functools

    kernel = functools.partial(
        _dual_body,
        scale=scale * LOG2E if EXP2_SOFTMAX else scale,
        p1=p1, l1=l1, l2=l2,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b * n, lqp // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh, iq: (bh, iq, 0)),
            pl.BlockSpec((1, lkp, d), lambda bh, iq: (bh, 0, 0)),
            pl.BlockSpec((1, lkp, d), lambda bh, iq: (bh, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda bh, iq: (bh, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((b * n, lqp, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * n * lqp * lkp * d,
            bytes_accessed=2 * b * n * (2 * lqp + 2 * lkp) * d,
            transcendentals=b * n * lqp * lkp,
        ),
        interpret=interpret,
    )(qp, kc, vc)

    return out.reshape(b, n, lqp, d).transpose(0, 2, 1, 3)[:, :lq]

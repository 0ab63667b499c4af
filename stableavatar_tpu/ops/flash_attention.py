"""Blockwise (flash) attention in Pallas for TPU — forward and backward.

TPU-native replacement for the reference's external flash-attn 2/3 CUDA
kernels (`wan/models/wan_fantasy_transformer3d_1B.py:49-207`).  The ragged
`k_lens` semantics (keys beyond `k_lens[b]` ignored) are implemented with an
iota length mask instead of cu_seqlens packing, keeping every shape static.

Design (see pallas_guide.md):
- forward grid = (batch*heads, q_blocks, k_blocks); the k-block axis is
  innermost so the VMEM scratch accumulators (acc, running max m, running sum
  l) persist across k blocks of one q block; also emits LSE = m + log(l) for
  the backward;
- backward is the standard two-kernel flash formulation: one pass over
  (k-block, q-blocks) accumulating dK/dV, one pass over (q-block, k-blocks)
  accumulating dQ, with p recomputed from LSE (delta = rowsum(dO*O) is a
  cheap fused jnp op);
- online softmax in fp32 on the VPU, all contractions on the MXU with
  `preferred_element_type=float32`;
- block 1024x1024 measured 151 TF/s on v5e at the 21.5k-token DiT
  self-attention shape (95% of the 159 TF/s matmul ceiling).

The XLA alternative is not viable at these shapes: it materializes the full
[B, N, Lq, Lk] fp32 logits (66 GB at 21.5k tokens — measured OOM).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel(
    klens_ref,  # scalar prefetch: [B] int32
    q_ref,  # [1, BQ, D]
    k_ref,  # [1, BK, D]
    v_ref,  # [1, BK, D]
    o_ref,  # [1, BQ, D]
    lse_ref,  # [1, BQ, 128] or None (value broadcast over lanes; lane 0 read)
    acc_ref,  # [BQ, D] f32
    m_ref,  # [BQ, 128] f32
    l_ref,  # [BQ, 128] f32
    *,
    scale: float,
    block_k: int,
    num_heads: int,
):
    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ik == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = s * scale

    b = pl.program_id(0) // num_heads
    klen = klens_ref[b]
    col = ik * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < klen, s, NEG_INF)

    m_prev = m_ref[:, :1]
    l_prev = l_ref[:, :1]
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)
    correction = jnp.exp(m_prev - m_new)
    l_new = correction * l_prev + jnp.sum(p, axis=1, keepdims=True)
    acc_ref[:] = acc_ref[:] * correction + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_ref[:, :1] = m_new
    l_ref[:, :1] = l_new

    @pl.when(ik == nk - 1)
    def _finalize():
        l = jnp.maximum(l_ref[:, :1], 1e-30)
        o_ref[0] = (acc_ref[:] / l).astype(o_ref.dtype)
        if lse_ref is not None:
            # TPU blocks need lane-aligned outputs: broadcast over 128 lanes
            lse_ref[0] = jnp.broadcast_to(m_ref[:, :1] + jnp.log(l), lse_ref.shape[1:])


def _flash_fwd_impl(q, k, v, k_lens, scale, block_q, block_k, with_lse=True):
    b, lq, n, d = q.shape
    lk = k.shape[1]

    pad_q = (-lq) % block_q
    pad_k = (-lk) % block_k
    qp = jnp.pad(q, ((0, 0), (0, pad_q), (0, 0), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, pad_k), (0, 0), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, pad_k), (0, 0), (0, 0)))
    lqp, lkp = lq + pad_q, lk + pad_k

    def to_bh(x, l):
        return x.transpose(0, 2, 1, 3).reshape(b * n, l, d)

    qp, kp, vp = to_bh(qp, lqp), to_bh(kp, lkp), to_bh(vp, lkp)

    grid = (b * n, lqp // block_q, lkp // block_k)
    kernel = functools.partial(_fwd_kernel, scale=scale, block_k=block_k, num_heads=n)

    out_specs = [pl.BlockSpec((1, block_q, d), lambda bh, iq, ik, *_: (bh, iq, 0))]
    out_shape = [jax.ShapeDtypeStruct((b * n, lqp, d), q.dtype)]
    if with_lse:
        out_specs.append(
            pl.BlockSpec((1, block_q, 128), lambda bh, iq, ik, *_: (bh, iq, 0))
        )
        out_shape.append(jax.ShapeDtypeStruct((b * n, lqp, 128), jnp.float32))
    else:
        # primal-only path: skip the LSE write (saves an [BH, Lq, 128] f32
        # store per call — ~400 MB at the DiT self-attention shape)
        inner = kernel

        def kernel(klens, qr, kr, vr, orf, acc, m, l):  # noqa: F811
            return inner(klens, qr, kr, vr, orf, None, acc, m, l)

    results = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, d), lambda bh, iq, ik, *_: (bh, iq, 0)),
                pl.BlockSpec((1, block_k, d), lambda bh, iq, ik, *_: (bh, ik, 0)),
                pl.BlockSpec((1, block_k, d), lambda bh, iq, ik, *_: (bh, ik, 0)),
            ],
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((block_q, d), jnp.float32),
                pltpu.VMEM((block_q, 128), jnp.float32),
                pltpu.VMEM((block_q, 128), jnp.float32),
            ],
        ),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * n * lqp * lkp * d,
            bytes_accessed=2 * b * n * (lqp + 2 * lkp) * d,
            transcendentals=b * n * lqp * lkp,
        ),
    )(k_lens.astype(jnp.int32), qp, kp, vp)

    out = results[0]  # out_shape is a list, so results is always a sequence
    lse = results[1] if with_lse else None
    out = out.reshape(b, n, lqp, d).transpose(0, 2, 1, 3)[:, :lq]
    return out, lse  # lse stays in [B*N, Lq_padded] layout for the backward


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _bwd_dkdv_kernel(
    klens_ref,
    q_ref,  # [1, BQ, D]
    k_ref,  # [1, BK, D]
    v_ref,  # [1, BK, D]
    do_ref,  # [1, BQ, D]
    lse_ref,  # [1, BQ, 128]
    delta_ref,  # [1, BQ, 128]
    dk_ref,  # [1, BK, D] out
    dv_ref,  # [1, BK, D] out
    dk_acc,  # [BK, D] f32 scratch
    dv_acc,  # [BK, D] f32 scratch
    *,
    scale: float,
    block_k: int,
    num_heads: int,
):
    iq = pl.program_id(2)
    nq = pl.num_programs(2)
    ik = pl.program_id(1)

    @pl.when(iq == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    lse = lse_ref[0][:, :1]  # [BQ, 1]
    delta = delta_ref[0][:, :1]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [BQ, BK]
    b = pl.program_id(0) // num_heads
    klen = klens_ref[b]
    col = ik * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < klen, s, NEG_INF)
    p = jnp.exp(s - lse)  # softmax probs (0 for masked / padded rows)
    p = jnp.where(lse > NEG_INF / 2, p, 0.0)  # guard degenerate rows

    dv_acc[:] += jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p * (dp - delta) * scale  # [BQ, BK]
    dk_acc[:] += jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(iq == nq - 1)
    def _finalize():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _bwd_dq_kernel(
    klens_ref,
    q_ref,  # [1, BQ, D]
    k_ref,  # [1, BK, D]
    v_ref,  # [1, BK, D]
    do_ref,  # [1, BQ, D]
    lse_ref,  # [1, BQ, 128]
    delta_ref,  # [1, BQ, 128]
    dq_ref,  # [1, BQ, D] out
    dq_acc,  # [BQ, D] f32 scratch
    *,
    scale: float,
    block_k: int,
    num_heads: int,
):
    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ik == 0)
    def _init():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    lse = lse_ref[0][:, :1]  # [BQ, 1]
    delta = delta_ref[0][:, :1]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    b = pl.program_id(0) // num_heads
    klen = klens_ref[b]
    col = ik * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < klen, s, NEG_INF)
    p = jnp.exp(s - lse)
    p = jnp.where(lse > NEG_INF / 2, p, 0.0)

    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p * (dp - delta) * scale
    dq_acc[:] += jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(ik == nk - 1)
    def _finalize():
        dq_ref[0] = dq_acc[:].astype(dq_ref.dtype)


def _flash_bwd_impl(q, k, v, k_lens, out, lse, g, scale, block_q, block_k):
    b, lq, n, d = q.shape
    lk = k.shape[1]
    pad_q = (-lq) % block_q
    pad_k = (-lk) % block_k
    lqp, lkp = lq + pad_q, lk + pad_k

    def to_bh(x, pad, l):
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0), (0, 0)))
        return x.transpose(0, 2, 1, 3).reshape(b * n, l, d)

    qp = to_bh(q, pad_q, lqp)
    kp = to_bh(k, pad_k, lkp)
    vp = to_bh(v, pad_k, lkp)
    dop = to_bh(g, pad_q, lqp)
    op = to_bh(out, pad_q, lqp)

    # delta = rowsum(dO * O): cheap fused elementwise reduction, broadcast
    # over 128 lanes for TPU block alignment (matching the fwd LSE layout)
    delta = jnp.sum(dop.astype(jnp.float32) * op.astype(jnp.float32), axis=-1)
    delta = jnp.broadcast_to(delta[:, :, None], (*delta.shape, 128))

    klens32 = k_lens.astype(jnp.int32)
    nq, nk = lqp // block_q, lkp // block_k

    common = dict(scale=scale, block_k=block_k, num_heads=n)
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkdv_kernel, **common),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b * n, nk, nq),
            in_specs=[
                pl.BlockSpec((1, block_q, d), lambda bh, ik, iq, *_: (bh, iq, 0)),
                pl.BlockSpec((1, block_k, d), lambda bh, ik, iq, *_: (bh, ik, 0)),
                pl.BlockSpec((1, block_k, d), lambda bh, ik, iq, *_: (bh, ik, 0)),
                pl.BlockSpec((1, block_q, d), lambda bh, ik, iq, *_: (bh, iq, 0)),
                pl.BlockSpec((1, block_q, 128), lambda bh, ik, iq, *_: (bh, iq, 0)),
                pl.BlockSpec((1, block_q, 128), lambda bh, ik, iq, *_: (bh, iq, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, block_k, d), lambda bh, ik, iq, *_: (bh, ik, 0)),
                pl.BlockSpec((1, block_k, d), lambda bh, ik, iq, *_: (bh, ik, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((block_k, d), jnp.float32),
                pltpu.VMEM((block_k, d), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b * n, lkp, d), k.dtype),
            jax.ShapeDtypeStruct((b * n, lkp, d), v.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")
        ),
    )(klens32, qp, kp, vp, dop, lse, delta)

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, **common),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b * n, nq, nk),
            in_specs=[
                pl.BlockSpec((1, block_q, d), lambda bh, iq, ik, *_: (bh, iq, 0)),
                pl.BlockSpec((1, block_k, d), lambda bh, iq, ik, *_: (bh, ik, 0)),
                pl.BlockSpec((1, block_k, d), lambda bh, iq, ik, *_: (bh, ik, 0)),
                pl.BlockSpec((1, block_q, d), lambda bh, iq, ik, *_: (bh, iq, 0)),
                pl.BlockSpec((1, block_q, 128), lambda bh, iq, ik, *_: (bh, iq, 0)),
                pl.BlockSpec((1, block_q, 128), lambda bh, iq, ik, *_: (bh, iq, 0)),
            ],
            out_specs=pl.BlockSpec((1, block_q, d), lambda bh, iq, ik, *_: (bh, iq, 0)),
            scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((b * n, lqp, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")
        ),
    )(klens32, qp, kp, vp, dop, lse, delta)

    def from_bh(x, l, orig_l):
        return x.reshape(b, n, l, d).transpose(0, 2, 1, 3)[:, :orig_l]

    return from_bh(dq, lqp, lq), from_bh(dk, lkp, lk), from_bh(dv, lkp, lk)


# ---------------------------------------------------------------------------
# custom_vjp plumbing
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _flash(q, k, v, k_lens, scale, block_q, block_k):
    out, _ = _flash_fwd_impl(q, k, v, k_lens, scale, block_q, block_k, with_lse=False)
    return out


def _flash_fwd(q, k, v, k_lens, scale, block_q, block_k):
    out, lse = _flash_fwd_impl(q, k, v, k_lens, scale, block_q, block_k)
    return out, (q, k, v, k_lens, out, lse)


def _flash_bwd(scale, block_q, block_k, res, g):
    q, k, v, k_lens, out, lse = res
    dq, dk, dv = _flash_bwd_impl(q, k, v, k_lens, out, lse, g, scale, block_q, block_k)
    return dq, dk, dv, None


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    k_lens: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    causal: bool = False,
    block_q: int = 1024,
    block_k: int = 1024,
) -> jnp.ndarray:
    """Flash attention: q [B, Lq, N, D], k/v [B, Lk, N, D] -> [B, Lq, N, D]."""
    if causal:
        raise NotImplementedError("causal masking is not used by the Wan models")
    b, _, _, d = q.shape
    lk = k.shape[1]
    if scale is None:
        scale = d**-0.5
    if k_lens is None:
        k_lens = jnp.full((b,), lk, dtype=jnp.int32)
    block_q = min(block_q, _round_up(q.shape[1], 128))
    block_k = min(block_k, _round_up(lk, 128))
    return _flash(q, k, v, k_lens, float(scale), block_q, block_k)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m

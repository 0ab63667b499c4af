"""Blockwise (flash) attention in Pallas for TPU — forward and backward.

TPU-native replacement for the reference's external flash-attn 2/3 CUDA
kernels (`wan/models/wan_fantasy_transformer3d_1B.py:49-207`).  The ragged
`k_lens` semantics (keys beyond `k_lens[b]` ignored) are implemented with an
iota length mask instead of cu_seqlens packing, keeping every shape static.

Design (see pallas_guide.md):

- forward grid = (batch*heads, q_blocks, k_blocks); the k-block axis is
  innermost so the VMEM scratch accumulators (acc, running max m, running sum
  l) persist across k blocks of one q block; optionally emits LSE =
  m + log(l) for the backward / ring-attention partial combining;
- **split-pair RoPE** (`ops/rope.py:split_pair_permutation`): q/k weights
  are pre-permuted so the rotation is two contiguous half-register ops; the
  kernel can fuse it per block (`rope=` on the bf16 path) but the measured
  optimum on v5e applies it as one fused XLA pass per tensor — the kernel is
  VPU-bound at the margin, so per-cell re-rotation loses
  (scripts/bench_dit_step.py);
- **int8 MXU path** (`quant="qk"` / `"qkpv"`): v5e int8 matmul throughput is
  2x bf16 (394 vs 197 TOPS — measured via scripts/microbench_*).  q/k are
  quantized with ONE dynamic absmax scale per (batch, head) slab — coarser
  than per-token, acceptable because RMS-normed q/k have near-uniform
  per-token magnitudes (see the `_quant_slab` comment); fp32 softmax logits
  reconstructed exactly as (q8·k8) * sq * sk * scale, in ONE fused XLA prep
  pass, with k pre-transposed to the MXU-native [D, L] layout, in the spirit
  of SageAttention (arXiv:2410.02367), which shows int8 QK^T is visually
  lossless for video diffusion DiTs.  `"qkpv"` additionally runs P·V on the
  int8 MXU: P is rescaled per-row to its running block max (error tracks
  each block's true softmax mass, Sage's per-block trick), V per-channel;
- backward is the standard two-kernel flash formulation: one pass over
  (k-block, q-blocks) accumulating dK/dV, one pass over (q-block, k-blocks)
  accumulating dQ, with p recomputed from LSE (delta = rowsum(dO*O) is a
  cheap fused jnp op); rope is recomputed in-kernel and inverted on the
  dq/dk accumulators at finalize (the rotation is orthogonal).  The backward
  always runs bf16 — int8 is an inference fast path;
- online softmax in fp32 on the VPU, all contractions on the MXU with an
  explicit `preferred_element_type`.

The XLA alternative is not viable at these shapes: it materializes the full
[B, N, Lq, Lk] fp32 logits (66 GB at 21.5k tokens — measured OOM).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LOG2E = 1.4426950408889634  # log2(e)
LN2 = 0.6931471805599453

# exp2-based online softmax: the VPU exponential unit is base-2; computing
# softmax in the log2 domain (log2(e) pre-folded into the logit scale, one
# multiply saved per [BQ, BK] cell, exp -> exp2) shaves VPU work off the
# non-MXU-overlapped tail.  LSE converts back to natural log at finalize so
# backward/ring consumers are unchanged.  Measured on-chip before enabling.
EXP2_SOFTMAX = True

# static-bound softmax (round-5 VPU lever, int8 path only): replace the
# online running max with a PRECOMPUTED upper bound on each (slab, q-block)'s
# logits — Cauchy-Schwarz on the exact int8 operands, max_rows ||q8||2 *
# max_cols ||k8||2 * sqk, computed in one cheap XLA pass over q8/k8 (O(L*D)
# vs the kernel's O(L^2*D)).  With a static bound the kernel drops, per
# [BQ, BK] cell: the row-max reduction, the correction exp, and the
# acc/l rescale multiplies — softmax(s) = exp(s - M)/sum(exp(s - M)) is
# shift-invariant for ANY M >= rowmax, and f32 exp underflow for
# over-bounded rows only discards mass that is e^-40-ish relative anyway.
# LSE = M + log(l) stays exact, so backward/ring contracts are unchanged.
# Off by default until an on-chip step measurement shows a win (project
# rule: adopt only measured wins).
import os as _os

STATIC_MAX = _os.environ.get("STABLEAVATAR_STATIC_MAX", "0") == "1"


# ---------------------------------------------------------------------------
# in-kernel helpers
# ---------------------------------------------------------------------------


def _rot(x, t):
    """Rotate [R, D] fp32 rows by packed cos||sin table t [R, D] (split-pair
    layout: pair j lives at channels (j, j + D/2))."""
    half = x.shape[-1] // 2
    c, s = t[:, :half], t[:, half:]
    x0, x1 = x[:, :half], x[:, half:]
    return jnp.concatenate([x0 * c - x1 * s, x0 * s + x1 * c], axis=-1)


def _rot_inv(g, t):
    """Inverse (transpose) rotation — the VJP of `_rot` w.r.t. x."""
    half = g.shape[-1] // 2
    c, s = t[:, :half], t[:, half:]
    g0, g1 = g[:, :half], g[:, half:]
    return jnp.concatenate([g0 * c + g1 * s, -g0 * s + g1 * c], axis=-1)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_body(
    klens_ref,
    q_ref,  # [1, BQ, D]
    k_ref,  # [1, BK, D]
    v_ref,  # [1, BK, D]
    ropeq_ref,  # [BQ, D] f32 packed cos||sin, or None
    ropek_ref,  # [BK, D] f32, or None
    o_ref,  # [1, BQ, D]
    lse_ref,  # [1, BQ, 128] or None (value broadcast over lanes; lane 0 read)
    acc_ref,  # [BQ, D] f32
    m_ref,  # [BQ, 128] f32
    l_ref,  # [BQ, 128] f32
    *,
    scale: float,
    block_k: int,
    num_heads: int,
    need_mask: bool,
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
    dt = q.dtype

    if ropeq_ref is not None:
        q = _rot(q.astype(jnp.float32), ropeq_ref[...]).astype(dt)
        k = _rot(k.astype(jnp.float32), ropek_ref[...]).astype(dt)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    # exp2 mode: log2(e) is folded into `scale` by the caller — s lives in
    # the log2 domain from here on, saving one [BQ, BK] multiply per cell
    s = s * scale

    if need_mask:
        b = pl.program_id(0) // num_heads
        klen = klens_ref[b]
        col = ik * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < klen, s, NEG_INF)

    exp = jnp.exp2 if EXP2_SOFTMAX else jnp.exp
    m_prev = m_ref[:, :1]
    l_prev = l_ref[:, :1]
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    correction = exp(m_prev - m_new)

    p = exp(s - m_new)
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
            # TPU blocks need lane-aligned outputs: broadcast over 128 lanes.
            # exp2 mode: m is base-2 — convert so LSE is ALWAYS natural-log
            # (backward + ring partial merging contract)
            m_nat = m_ref[:, :1] * LN2 if EXP2_SOFTMAX else m_ref[:, :1]
            lse_ref[0] = jnp.broadcast_to(m_nat + jnp.log(l), lse_ref.shape[1:])


def _make_fwd_kernel(apply_rope, with_lse, **kw):
    def kernel(*refs):
        i = 1  # refs[0] is the klens scalar-prefetch
        q_ref, k_ref, v_ref = refs[i : i + 3]
        i += 3
        ropeq_ref = ropek_ref = None
        if apply_rope:
            ropeq_ref, ropek_ref = refs[i : i + 2]
            i += 2
        o_ref = refs[i]
        i += 1
        lse_ref = None
        if with_lse:
            lse_ref = refs[i]
            i += 1
        acc_ref, m_ref, l_ref = refs[i : i + 3]
        _fwd_body(
            refs[0], q_ref, k_ref, v_ref, ropeq_ref, ropek_ref, o_ref, lse_ref,
            acc_ref, m_ref, l_ref, **kw,
        )

    return kernel


def _pad_rope(rope, l_padded):
    pad = l_padded - rope.shape[0]
    if pad:
        rope = jnp.pad(rope, ((0, pad), (0, 0)))
    return rope.astype(jnp.float32)


def _flash_fwd_impl(
    q, k, v, k_lens, rope, scale, block_q, block_k, with_lse=True,
    need_mask=True,
):
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
    kernel = _make_fwd_kernel(
        apply_rope=rope is not None,
        with_lse=with_lse,
        scale=scale * LOG2E if EXP2_SOFTMAX else scale,
        block_k=block_k,
        num_heads=n,
        need_mask=need_mask,
    )

    in_specs = [
        pl.BlockSpec((1, block_q, d), lambda bh, iq, ik, *_: (bh, iq, 0)),
        pl.BlockSpec((1, block_k, d), lambda bh, iq, ik, *_: (bh, ik, 0)),
        pl.BlockSpec((1, block_k, d), lambda bh, iq, ik, *_: (bh, ik, 0)),
    ]
    inputs = [k_lens.astype(jnp.int32), qp, kp, vp]
    if rope is not None:
        ropeq = _pad_rope(rope, lqp)
        ropek = _pad_rope(rope, lkp) if lkp != lqp else ropeq
        in_specs.append(pl.BlockSpec((block_q, d), lambda bh, iq, ik, *_: (iq, 0)))
        in_specs.append(pl.BlockSpec((block_k, d), lambda bh, iq, ik, *_: (ik, 0)))
        inputs.extend([ropeq, ropek])

    out_specs = [pl.BlockSpec((1, block_q, d), lambda bh, iq, ik, *_: (bh, iq, 0))]
    out_shape = [jax.ShapeDtypeStruct((b * n, lqp, d), q.dtype)]
    if with_lse:
        out_specs.append(
            pl.BlockSpec((1, block_q, 128), lambda bh, iq, ik, *_: (bh, iq, 0))
        )
        out_shape.append(jax.ShapeDtypeStruct((b * n, lqp, 128), jnp.float32))
    # else: primal-only path skips the LSE write (saves an [BH, Lq, 128] f32
    # store per call — ~400 MB at the DiT self-attention shape)

    results = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
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
    )(*inputs)

    out = results[0]  # out_shape is a list, so results is always a sequence
    lse = results[1] if with_lse else None
    out = out.reshape(b, n, lqp, d).transpose(0, 2, 1, 3)[:, :lq]
    return out, lse  # lse stays in [B*N, Lq_padded] layout for the backward


# ---------------------------------------------------------------------------
# int8 MXU forward (pre-quantized operands)
# ---------------------------------------------------------------------------
#
# Measured on v5e (scripts/bench_attn_blocks.py): the flash grid streams bf16
# dots at 188 TF/s and int8-QK + bf16-PV dots at 239 TF/s effective — but
# ONLY when operands arrive pre-quantized in MXU-native layouts (k transposed
# [D, L] so the contraction is the standard (1,)x(0,) form).  Quantizing
# inside the kernel per (q-block, k-block) cell is a net LOSS (measured
# 3.53 -> 4.47 s/step): the flash kernel is VPU-bound at the margin, not
# MXU-bound, so per-cell quantize work costs more than the int8 dot saves.
# Hence: rope + per-token quantization run ONCE per tensor as XLA ops
# (fused, HBM-cheap — int8 operands also halve K streaming traffic), and the
# kernel consumes int8 directly.


def _int8_fwd_body(
    klens_ref,
    sqk_ref,  # [B*N] f32 scalar-prefetch: per-(batch,head) sq*sk*scale
    q8_ref,  # [1, BQ, D] int8
    k8t_ref,  # [1, D, BK] int8 (pre-transposed)
    v_ref,  # [1, BK, D] bf16, or int8 when quant_pv
    sv_ref,  # [1, 1, D] f32 per-channel v scales, or None
    o_ref,  # [1, BQ, D]
    lse_ref,  # [1, BQ, 128] or None
    acc_ref,  # [BQ, D] f32
    m_ref,  # [BQ, 128] f32
    l_ref,  # [BQ, 128] f32
    *,
    block_k: int,
    num_heads: int,
    need_mask: bool,
    quant_pv: bool,
    v_int8: bool = False,
):
    ik = pl.program_id(2)
    nk = pl.num_programs(2)
    bh = pl.program_id(0)

    @pl.when(ik == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    # q/k are RMS-normalized in the Wan blocks (norm_q/norm_k) and rope is
    # norm-preserving, so ONE scalar scale per (batch, head) slab loses
    # almost nothing vs per-token scales — and a scalar multiply fuses into
    # the int32->f32 convert pass instead of costing two [BQ, BK] VPU sweeps
    # exp2 mode: log2(e) is pre-folded into sqk by the caller (free — it is
    # a host-side scalar product), so s is in the log2 domain
    s = jax.lax.dot_general(
        q8_ref[0], k8t_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    s = s * sqk_ref[bh]

    if need_mask:
        b = bh // num_heads
        klen = klens_ref[b]
        col = ik * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < klen, s, NEG_INF)

    exp = jnp.exp2 if EXP2_SOFTMAX else jnp.exp
    m_prev = m_ref[:, :1]
    l_prev = l_ref[:, :1]
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    correction = exp(m_prev - m_new)

    if quant_pv:
        # P rescaled to its per-row block max so the int8 error tracks each
        # block's true softmax mass; V per-channel (pre-quantized), its scale
        # applied once at finalize
        p_rel = exp(s - m_cur)  # rowmax exactly 1
        p8 = jnp.clip(jnp.round(p_rel * 127.0), 0.0, 127.0).astype(jnp.int8)
        pv = jax.lax.dot_general(
            p8, v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
        factor = exp(m_cur - m_new)  # [BQ, 1]
        acc_ref[:] = acc_ref[:] * correction + pv * (factor * (1.0 / 127.0))
        l_new = correction * l_prev + jnp.sum(p_rel, axis=1, keepdims=True) * factor
    elif v_int8:
        # V streamed as int8 (halves V HBM traffic), converted to bf16 in
        # VMEM for the PV dot; the per-channel scale is applied ONCE at
        # finalize (out of the k-block loop).  P stays full precision —
        # unlike quant_pv there is no in-cell P quantization VPU cost.
        p = exp(s - m_new)
        l_new = correction * l_prev + jnp.sum(p, axis=1, keepdims=True)
        acc_ref[:] = acc_ref[:] * correction + jax.lax.dot_general(
            p.astype(jnp.bfloat16), v_ref[0].astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    else:
        p = exp(s - m_new)
        l_new = correction * l_prev + jnp.sum(p, axis=1, keepdims=True)
        acc_ref[:] = acc_ref[:] * correction + jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    m_ref[:, :1] = m_new
    l_ref[:, :1] = l_new

    @pl.when(ik == nk - 1)
    def _finalize():
        l = jnp.maximum(l_ref[:, :1], 1e-30)
        out = acc_ref[:] / l
        if quant_pv or v_int8:
            out = out * sv_ref[0]
        o_ref[0] = out.astype(o_ref.dtype)
        if lse_ref is not None:
            m_nat = m_ref[:, :1] * LN2 if EXP2_SOFTMAX else m_ref[:, :1]
            lse_ref[0] = jnp.broadcast_to(m_nat + jnp.log(l), lse_ref.shape[1:])


def _int8_fwd_body_static(
    klens_ref,
    sqk_ref,  # [B*N] f32 scalar-prefetch: per-(batch,head) sq*sk*scale
    mstat_ref,  # [B*N, nq] f32 scalar-prefetch: logit upper bound per q-block
    q8_ref,  # [1, BQ, D] int8
    k8t_ref,  # [1, D, BK] int8 (pre-transposed)
    v_ref,  # [1, BK, D] bf16, or int8 when v_int8
    sv_ref,  # [1, 1, D] f32 per-channel v scales, or None
    o_ref,  # [1, BQ, D]
    lse_ref,  # [1, BQ, 128] or None
    acc_ref,  # [BQ, D] f32
    l_ref,  # [BQ, 128] f32
    *,
    block_k: int,
    num_heads: int,
    need_mask: bool,
    v_int8: bool,
):
    """Static-bound softmax variant of `_int8_fwd_body` (see STATIC_MAX):
    no running max, no correction rescales — p = exp(s - M) with M a
    precomputed per-(slab, q-block) bound, pure accumulation of l and acc."""
    ik = pl.program_id(2)
    nk = pl.num_programs(2)
    bh = pl.program_id(0)
    iq = pl.program_id(1)

    @pl.when(ik == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        l_ref[:] = jnp.zeros_like(l_ref)

    s = jax.lax.dot_general(
        q8_ref[0], k8t_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    s = s * sqk_ref[bh]

    if need_mask:
        b = bh // num_heads
        klen = klens_ref[b]
        col = ik * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < klen, s, NEG_INF)

    exp = jnp.exp2 if EXP2_SOFTMAX else jnp.exp
    m = mstat_ref[bh, iq]  # scalar: >= rowmax(s) by Cauchy-Schwarz
    p = exp(s - m)
    l_ref[:, :1] = l_ref[:, :1] + jnp.sum(p, axis=1, keepdims=True)
    if v_int8:
        acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
            p.astype(jnp.bfloat16), v_ref[0].astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    else:
        acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(ik == nk - 1)
    def _finalize():
        l = jnp.maximum(l_ref[:, :1], 1e-30)
        out = acc_ref[:] / l
        if v_int8:
            out = out * sv_ref[0]
        o_ref[0] = out.astype(o_ref.dtype)
        if lse_ref is not None:
            m_nat = m * LN2 if EXP2_SOFTMAX else m
            lse_ref[0] = jnp.broadcast_to(
                m_nat + jnp.log(l), lse_ref.shape[1:]
            )


def _make_int8_static_kernel(v_int8, with_lse, **kw):
    def kernel(*refs):
        i = 3  # refs[0]=klens, refs[1]=sqk, refs[2]=mstat (scalar prefetch)
        q8_ref, k8t_ref, v_ref = refs[i : i + 3]
        i += 3
        sv_ref = None
        if v_int8:
            sv_ref = refs[i]
            i += 1
        o_ref = refs[i]
        i += 1
        lse_ref = None
        if with_lse:
            lse_ref = refs[i]
            i += 1
        acc_ref, l_ref = refs[i : i + 2]
        _int8_fwd_body_static(
            refs[0], refs[1], refs[2], q8_ref, k8t_ref, v_ref, sv_ref,
            o_ref, lse_ref, acc_ref, l_ref, v_int8=v_int8, **kw,
        )

    return kernel


def _make_int8_kernel(quant_pv, v_int8, with_lse, **kw):
    def kernel(*refs):
        i = 2  # refs[0]=klens, refs[1]=sqk (scalar prefetch)
        q8_ref, k8t_ref, v_ref = refs[i : i + 3]
        i += 3
        sv_ref = None
        if quant_pv or v_int8:
            sv_ref = refs[i]
            i += 1
        o_ref = refs[i]
        i += 1
        lse_ref = None
        if with_lse:
            lse_ref = refs[i]
            i += 1
        acc_ref, m_ref, l_ref = refs[i : i + 3]
        _int8_fwd_body(
            refs[0], refs[1], q8_ref, k8t_ref, v_ref, sv_ref, o_ref,
            lse_ref, acc_ref, m_ref, l_ref, quant_pv=quant_pv,
            v_int8=v_int8, **kw,
        )

    return kernel


def _quant_slab(x):
    """Per-(batch, head) slab int8 quantization of [B, L, N, D] fp32 ->
    (int8, scales [B, N] f32)."""
    s = jnp.maximum(jnp.max(jnp.abs(x), axis=(1, 3)) * (1.0 / 127.0), 1e-10)
    q = jnp.clip(
        jnp.round(x / s[:, None, :, None]), -127.0, 127.0
    ).astype(jnp.int8)
    return q, s


def _flash_int8_impl(
    q, k, v, k_lens, rope, scale, block_q, block_k, quant_pv,
    with_lse=False, v_int8=False, static_max=False,
):
    """int8 forward: rope + per-slab quantization as fused XLA prep, then
    the int8 kernel.  q/k [B, L, N, D] (split-pair layout when rope given).
    v_int8 streams V as int8 + per-channel scale (halved V HBM traffic,
    bf16 PV dot in-kernel) without quantizing P.  static_max replaces the
    online running max with a precomputed per-(slab, q-block) logit bound
    (see STATIC_MAX); incompatible with quant_pv (whose int8 P needs the
    true per-block rowmax to keep quantization error bounded)."""
    from stableavatar_tpu.ops.rope import rope_apply_split

    b, lq, n, d = q.shape
    lk = k.shape[1]

    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    if rope is not None:
        qf = rope_apply_split(qf, rope)
        kf = rope_apply_split(kf, rope)
    q8, sq = _quant_slab(qf)
    k8, sk = _quant_slab(kf)
    eff_scale = scale * LOG2E if EXP2_SOFTMAX else scale
    sqk = (sq * sk * eff_scale).reshape(b * n)  # [B*N] scalar per grid slab

    pad_q = (-lq) % block_q
    pad_k = (-lk) % block_k
    lqp, lkp = lq + pad_q, lk + pad_k
    need_mask = (k_lens is not None) or pad_k > 0
    if k_lens is None:
        k_lens = jnp.full((b,), lk, dtype=jnp.int32)

    q8 = jnp.pad(q8, ((0, 0), (0, pad_q), (0, 0), (0, 0)))
    k8 = jnp.pad(k8, ((0, 0), (0, pad_k), (0, 0), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, pad_k), (0, 0), (0, 0)))

    q8 = q8.transpose(0, 2, 1, 3).reshape(b * n, lqp, d)
    k8t = k8.transpose(0, 2, 3, 1).reshape(b * n, d, lkp)

    static_max = static_max and not quant_pv
    if static_max:
        # Cauchy-Schwarz logit bound on the EXACT int8 operands, per
        # (slab, q-block): max_rows ||q8||2 * max_cols ||k8||2 * sqk.
        # O(L*D) XLA prep vs the kernel's O(L^2*D); q-padding rows are
        # zero -> bound 0, and their p = exp(0-0) = 1 rows are discarded.
        q8f = q8.astype(jnp.float32)
        qn = jnp.sqrt(jnp.sum(q8f * q8f, axis=2))  # [B*N, Lqp]
        qn_blk = qn.reshape(b * n, lqp // block_q, block_q).max(axis=2)
        k8f = k8t.astype(jnp.float32)
        kn = jnp.sqrt(jnp.sum(k8f * k8f, axis=1)).max(axis=1)  # [B*N]
        # sqk already carries scale (and log2e in exp2 mode), so the bound
        # lives in the kernel's logit domain
        mstat = sqk[:, None] * qn_blk * kn[:, None]  # [B*N, nq] f32
        inputs = [k_lens.astype(jnp.int32), sqk, mstat, q8, k8t]
    else:
        inputs = [k_lens.astype(jnp.int32), sqk, q8, k8t]
    in_specs = [
        pl.BlockSpec((1, block_q, d), lambda bh, iq, ik, *_: (bh, iq, 0)),
        pl.BlockSpec((1, d, block_k), lambda bh, iq, ik, *_: (bh, 0, ik)),
    ]

    if quant_pv or v_int8:
        vf = v.astype(jnp.float32)
        sv = jnp.maximum(
            jnp.max(jnp.abs(vf), axis=1, keepdims=True) * (1.0 / 127.0), 1e-10
        )  # [B, 1, N, D]
        v8 = jnp.clip(jnp.round(vf / sv), -127.0, 127.0).astype(jnp.int8)
        v8 = jnp.pad(v8, ((0, 0), (0, pad_k), (0, 0), (0, 0)))
        vp = v8.transpose(0, 2, 1, 3).reshape(b * n, lkp, d)
        svt = sv.transpose(0, 2, 1, 3).reshape(b * n, 1, d)
        inputs.extend([vp, svt])
        in_specs.append(
            pl.BlockSpec((1, block_k, d), lambda bh, iq, ik, *_: (bh, ik, 0))
        )
        in_specs.append(pl.BlockSpec((1, 1, d), lambda bh, iq, ik, *_: (bh, 0, 0)))
        out_dtype = v.dtype
    else:
        vp = vp.transpose(0, 2, 1, 3).reshape(b * n, lkp, d)
        inputs.append(vp)
        in_specs.append(
            pl.BlockSpec((1, block_k, d), lambda bh, iq, ik, *_: (bh, ik, 0))
        )
        out_dtype = v.dtype

    out_specs = [pl.BlockSpec((1, block_q, d), lambda bh, iq, ik, *_: (bh, iq, 0))]
    out_shape = [jax.ShapeDtypeStruct((b * n, lqp, d), out_dtype)]
    if with_lse:
        out_specs.append(
            pl.BlockSpec((1, block_q, 128), lambda bh, iq, ik, *_: (bh, iq, 0))
        )
        out_shape.append(jax.ShapeDtypeStruct((b * n, lqp, 128), jnp.float32))

    if static_max:
        kernel = _make_int8_static_kernel(
            v_int8=v_int8,
            with_lse=with_lse,
            block_k=block_k,
            num_heads=n,
            need_mask=need_mask,
        )
        scratch_shapes = [
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ]
    else:
        kernel = _make_int8_kernel(
            quant_pv=quant_pv,
            v_int8=v_int8,
            with_lse=with_lse,
            block_k=block_k,
            num_heads=n,
            need_mask=need_mask,
        )
        scratch_shapes = [
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ]

    results = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3 if static_max else 2,
            grid=(b * n, lqp // block_q, lkp // block_k),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch_shapes,
        ),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")
        ),
        cost_estimate=pl.CostEstimate(
            flops=3 * b * n * lqp * lkp * d,
            bytes_accessed=b * n * (lqp * d * 3 + lkp * d * 3),
            transcendentals=b * n * lqp * lkp,
        ),
    )(*inputs)

    out = results[0]
    lse = results[1] if with_lse else None
    out = out.reshape(b, n, lqp, d).transpose(0, 2, 1, 3)[:, :lq]
    return out, lse


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _bwd_dkdv_body(
    klens_ref,
    q_ref,  # [1, BQ, D]
    k_ref,  # [1, BK, D]
    v_ref,  # [1, BK, D]
    do_ref,  # [1, BQ, D]
    lse_ref,  # [1, BQ, 128]
    delta_ref,  # [1, BQ, 128]
    ropeq_ref,  # [BQ, D] or None
    ropek_ref,  # [BK, D] or None
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
    dt = q.dtype
    if ropeq_ref is not None:
        q = _rot(q.astype(jnp.float32), ropeq_ref[...]).astype(dt)
        k = _rot(k.astype(jnp.float32), ropek_ref[...]).astype(dt)
    v = v_ref[0]
    do = do_ref[0]
    lse = lse_ref[0][:, :1]  # [BQ, 1]
    delta = delta_ref[0][:, :1]

    # log2-domain logits (scale*log2e folded into one multiply) + exp2:
    # saves a [BQ, BK] VPU multiply per cell vs natural exp
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * (scale * LOG2E if EXP2_SOFTMAX else scale)  # [BQ, BK]
    b = pl.program_id(0) // num_heads
    klen = klens_ref[b]
    col = ik * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < klen, s, NEG_INF)
    if EXP2_SOFTMAX:
        p = jnp.exp2(s - lse * LOG2E)  # lse is natural-log; [BQ, 1] convert
    else:
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
        dk = dk_acc[:]
        if ropek_ref is not None:
            # grads flow back through the (orthogonal) rotation
            dk = _rot_inv(dk, ropek_ref[...])
        dk_ref[0] = dk.astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _bwd_dq_body(
    klens_ref,
    q_ref,  # [1, BQ, D]
    k_ref,  # [1, BK, D]
    v_ref,  # [1, BK, D]
    do_ref,  # [1, BQ, D]
    lse_ref,  # [1, BQ, 128]
    delta_ref,  # [1, BQ, 128]
    ropeq_ref,  # [BQ, D] or None
    ropek_ref,  # [BK, D] or None
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
    dt = q.dtype
    if ropeq_ref is not None:
        q = _rot(q.astype(jnp.float32), ropeq_ref[...]).astype(dt)
        k = _rot(k.astype(jnp.float32), ropek_ref[...]).astype(dt)
    v = v_ref[0]
    do = do_ref[0]
    lse = lse_ref[0][:, :1]  # [BQ, 1]
    delta = delta_ref[0][:, :1]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * (scale * LOG2E if EXP2_SOFTMAX else scale)
    b = pl.program_id(0) // num_heads
    klen = klens_ref[b]
    col = ik * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < klen, s, NEG_INF)
    if EXP2_SOFTMAX:
        p = jnp.exp2(s - lse * LOG2E)
    else:
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
        dq = dq_acc[:]
        if ropeq_ref is not None:
            dq = _rot_inv(dq, ropeq_ref[...])
        dq_ref[0] = dq.astype(dq_ref.dtype)


def _make_bwd_kernel(body, apply_rope, **kw):
    def kernel(*refs):
        i = 1
        q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref = refs[i : i + 6]
        i += 6
        ropeq_ref = ropek_ref = None
        if apply_rope:
            ropeq_ref, ropek_ref = refs[i : i + 2]
            i += 2
        rest = refs[i:]
        body(
            refs[0], q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
            ropeq_ref, ropek_ref, *rest, **kw,
        )

    return kernel


def _flash_bwd_impl(q, k, v, k_lens, rope, out, lse, g, scale, block_q, block_k):
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

    apply_rope = rope is not None
    rope_inputs = []
    if apply_rope:
        ropeq = _pad_rope(rope, lqp)
        ropek = _pad_rope(rope, lkp) if lkp != lqp else ropeq
        rope_inputs = [ropeq, ropek]

    common = dict(scale=scale, block_k=block_k, num_heads=n)

    dkdv_in_specs = [
        pl.BlockSpec((1, block_q, d), lambda bh, ik, iq, *_: (bh, iq, 0)),
        pl.BlockSpec((1, block_k, d), lambda bh, ik, iq, *_: (bh, ik, 0)),
        pl.BlockSpec((1, block_k, d), lambda bh, ik, iq, *_: (bh, ik, 0)),
        pl.BlockSpec((1, block_q, d), lambda bh, ik, iq, *_: (bh, iq, 0)),
        pl.BlockSpec((1, block_q, 128), lambda bh, ik, iq, *_: (bh, iq, 0)),
        pl.BlockSpec((1, block_q, 128), lambda bh, ik, iq, *_: (bh, iq, 0)),
    ]
    if apply_rope:
        dkdv_in_specs.append(pl.BlockSpec((block_q, d), lambda bh, ik, iq, *_: (iq, 0)))
        dkdv_in_specs.append(pl.BlockSpec((block_k, d), lambda bh, ik, iq, *_: (ik, 0)))

    dk, dv = pl.pallas_call(
        _make_bwd_kernel(_bwd_dkdv_body, apply_rope, **common),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b * n, nk, nq),
            in_specs=dkdv_in_specs,
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
    )(klens32, qp, kp, vp, dop, lse, delta, *rope_inputs)

    dq_in_specs = [
        pl.BlockSpec((1, block_q, d), lambda bh, iq, ik, *_: (bh, iq, 0)),
        pl.BlockSpec((1, block_k, d), lambda bh, iq, ik, *_: (bh, ik, 0)),
        pl.BlockSpec((1, block_k, d), lambda bh, iq, ik, *_: (bh, ik, 0)),
        pl.BlockSpec((1, block_q, d), lambda bh, iq, ik, *_: (bh, iq, 0)),
        pl.BlockSpec((1, block_q, 128), lambda bh, iq, ik, *_: (bh, iq, 0)),
        pl.BlockSpec((1, block_q, 128), lambda bh, iq, ik, *_: (bh, iq, 0)),
    ]
    if apply_rope:
        dq_in_specs.append(pl.BlockSpec((block_q, d), lambda bh, iq, ik, *_: (iq, 0)))
        dq_in_specs.append(pl.BlockSpec((block_k, d), lambda bh, iq, ik, *_: (ik, 0)))

    dq = pl.pallas_call(
        _make_bwd_kernel(_bwd_dq_body, apply_rope, **common),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b * n, nq, nk),
            in_specs=dq_in_specs,
            out_specs=pl.BlockSpec((1, block_q, d), lambda bh, iq, ik, *_: (bh, iq, 0)),
            scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((b * n, lqp, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")
        ),
    )(klens32, qp, kp, vp, dop, lse, delta, *rope_inputs)

    def from_bh(x, l, orig_l):
        return x.reshape(b, n, l, d).transpose(0, 2, 1, 3)[:, :orig_l]

    return from_bh(dq, lqp, lq), from_bh(dk, lkp, lk), from_bh(dv, lkp, lk)


# ---------------------------------------------------------------------------
# custom_vjp plumbing
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _flash(q, k, v, k_lens, rope, scale, block_q, block_k, need_mask):
    out, _ = _flash_fwd_impl(
        q, k, v, k_lens, rope, scale, block_q, block_k, with_lse=False,
        need_mask=need_mask,
    )
    return out


def _flash_fwd(q, k, v, k_lens, rope, scale, block_q, block_k, need_mask):
    out, lse = _flash_fwd_impl(
        q, k, v, k_lens, rope, scale, block_q, block_k, need_mask=need_mask
    )
    return out, (q, k, v, k_lens, rope, out, lse)


def _flash_bwd(scale, block_q, block_k, need_mask, res, g):
    q, k, v, k_lens, rope, out, lse = res
    dq, dk, dv = _flash_bwd_impl(
        q, k, v, k_lens, rope, out, lse, g, scale, block_q, block_k
    )
    return dq, dk, dv, None, None


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    k_lens: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    causal: bool = False,
    rope: Optional[jnp.ndarray] = None,
    quant: str = "none",
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
    static_max: Optional[bool] = None,
) -> jnp.ndarray:
    """Flash attention: q [B, Lq, N, D], k/v [B, Lk, N, D] -> [B, Lq, N, D].

    rope: optional packed [L, D] cos||sin table (`ops/rope.py:pack_split`) —
      q/k must then be in split-pair channel layout (pre-permuted weights).
    quant: "none" | "qk" | "qkv" | "qkpv" — int8 MXU fast paths (inference
      only; the quantized paths are not differentiable).  "qkv" additionally
      streams V as int8 (+ per-channel scale applied at finalize) without
      quantizing P.
    Default blocks are per-path v5e sweep winners (/tmp probe scripts,
    docs/PERF.md): int8 primal 1536x1536 (53.6 vs 58.1 ms/layer at 1024²);
    bf16 keeps 1024² because the same blocks feed the backward kernels,
    whose VMEM budget is tighter.
    """
    if causal:
        raise NotImplementedError("causal masking is not used by the Wan models")
    if block_q is None:
        block_q = 1536 if quant != "none" else 1024
    if block_k is None:
        block_k = 1536 if quant != "none" else 1024
    b, _, _, d = q.shape
    lk = k.shape[1]
    if scale is None:
        scale = d**-0.5
    block_q = min(block_q, _round_up(q.shape[1], 128))
    block_k = min(block_k, _round_up(lk, 128))
    if quant != "none":
        out, _ = _flash_int8_impl(
            q, k, v, k_lens, rope, float(scale), block_q, block_k,
            quant_pv=quant == "qkpv", v_int8=quant == "qkv",
            static_max=STATIC_MAX if static_max is None else static_max,
        )
        return out
    need_mask = (k_lens is not None) or (lk % block_k != 0)
    if k_lens is None:
        k_lens = jnp.full((b,), lk, dtype=jnp.int32)
    return _flash(q, k, v, k_lens, rope, float(scale), block_q, block_k, need_mask)


def flash_attention_with_stats(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    k_lens: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    rope: Optional[jnp.ndarray] = None,
    quant: str = "none",
    block_q: int = 1024,
    block_k: int = 1024,
    static_max: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Forward returning (out [B, Lq, N, D], lse [B, Lq, N] fp32).

    The log-sum-exp output makes partial results combinable — the primitive
    ring attention needs (`ops/ring_attention.py`): two partials (o1, lse1),
    (o2, lse2) over disjoint key sets merge as
    ``o = (o1 * e1 + o2 * e2) / (e1 + e2)`` with ``ei = exp(lsei - max)``.
    """
    b, lq, n, d = q.shape
    lk = k.shape[1]
    if scale is None:
        scale = d**-0.5
    block_q = min(block_q, _round_up(lq, 128))
    block_k = min(block_k, _round_up(lk, 128))
    if quant != "none":
        out, lse = _flash_int8_impl(
            q, k, v, k_lens, rope, float(scale), block_q, block_k,
            quant_pv=quant == "qkpv", v_int8=quant == "qkv", with_lse=True,
            static_max=STATIC_MAX if static_max is None else static_max,
        )
    else:
        need_mask = (k_lens is not None) or (lk % block_k != 0)
        if k_lens is None:
            k_lens = jnp.full((b,), lk, dtype=jnp.int32)
        out, lse = _flash_fwd_impl(
            q, k, v, k_lens, rope, float(scale), block_q, block_k,
            with_lse=True, need_mask=need_mask,
        )
    lqp = _round_up(lq, block_q)
    lse = lse[:, :, 0].reshape(b, n, lqp)[:, :, :lq].transpose(0, 2, 1)
    return out, lse


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m

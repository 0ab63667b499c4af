"""Attention kernel block-size sweep + dots-only upper bound probe."""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, N, L, D = 3, 12, 21504, 128
FLOPS = 4 * B * N * L * L * D
CH = 10


def measure(fn, *args, n=CH):
    out = fn(*args)
    float(jnp.sum(out.ravel()[:1].astype(jnp.float32)))
    t0 = time.perf_counter()
    out = fn(*args)
    float(jnp.sum(out.ravel()[:1].astype(jnp.float32)))
    total = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(jnp.sum(out.ravel()[:1].astype(jnp.float32)))
    floor = time.perf_counter() - t0
    return max(total - floor, 1e-9) / n


def sweep():
    from stableavatar_tpu.ops.flash_attention import flash_attention

    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, L, N, D), jnp.bfloat16)

    for bq, bk in [(1024, 1024), (512, 2048), (1024, 2048), (2048, 1024),
                   (512, 1024), (1536, 1536), (768, 1536)]:
        if L % bq or L % bk:
            # kernel pads; fine
            pass

        @jax.jit
        def run(q, bq=bq, bk=bk):
            def body(i, h):
                return flash_attention(h, h, h, block_q=bq, block_k=bk)

            return jax.lax.fori_loop(0, CH, body, q)

        try:
            t = measure(run, q)
            print(f"bq={bq:5d} bk={bk:5d}: {t*1e3:8.2f} ms  {FLOPS/t/1e12:6.1f} TF/s",
                  flush=True)
        except Exception as e:
            print(f"bq={bq:5d} bk={bk:5d}: FAILED {type(e).__name__}", flush=True)


def dots_only():
    """Same grid/blocks as the flash kernel, but only the two dots + a trivial
    accumulate — the MXU-only upper bound for this structure."""
    bq = bk = 1024

    def kernel(q_ref, k_ref, v_ref, o_ref, acc_ref):
        ik = pl.program_id(2)
        nk = pl.num_programs(2)

        @pl.when(ik == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        s = jax.lax.dot_general(
            q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_ref[:] += jax.lax.dot_general(
            s.astype(jnp.bfloat16), v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(ik == nk - 1)
        def _():
            o_ref[0] = acc_ref[:].astype(o_ref.dtype)

    @jax.jit
    def run(q):
        def body(i, h):
            return pl.pallas_call(
                kernel,
                grid=(B * N, L // bq, L // bk),
                in_specs=[
                    pl.BlockSpec((1, bq, D), lambda bh, iq, ik: (bh, iq, 0)),
                    pl.BlockSpec((1, bk, D), lambda bh, iq, ik: (bh, ik, 0)),
                    pl.BlockSpec((1, bk, D), lambda bh, iq, ik: (bh, ik, 0)),
                ],
                out_specs=pl.BlockSpec((1, bq, D), lambda bh, iq, ik: (bh, iq, 0)),
                out_shape=jax.ShapeDtypeStruct((B * N, L, D), h.dtype),
                scratch_shapes=[pltpu.VMEM((bq, D), jnp.float32)],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "parallel", "arbitrary")
                ),
                cost_estimate=pl.CostEstimate(
                    flops=4 * B * N * L * L * D,
                    bytes_accessed=2 * B * N * L * D * 3,
                    transcendentals=0,
                ),
            )(h, h, h)

        return jax.lax.fori_loop(0, CH, body, q.reshape(B * N, L, D))

    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, L, N, D), jnp.bfloat16)
    t = measure(run, q)
    print(f"dots-only       : {t*1e3:8.2f} ms  {FLOPS/t/1e12:6.1f} TF/s", flush=True)


def int8_dots_only():
    """QK int8 (pre-quantized, k pre-transposed) + PV bf16 upper bound."""
    bq = bk = 1024

    def kernel(q_ref, kt_ref, v_ref, o_ref, acc_ref):
        ik = pl.program_id(2)
        nk = pl.num_programs(2)

        @pl.when(ik == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        s = jax.lax.dot_general(
            q_ref[0], kt_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        p = (s >> 7).astype(jnp.bfloat16)
        acc_ref[:] += jax.lax.dot_general(
            p, v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(ik == nk - 1)
        def _():
            o_ref[0] = acc_ref[:].astype(o_ref.dtype)

    @jax.jit
    def run(q8, k8t, v):
        def body(i, acc):
            o = pl.pallas_call(
                kernel,
                grid=(B * N, L // bq, L // bk),
                in_specs=[
                    pl.BlockSpec((1, bq, D), lambda bh, iq, ik: (bh, iq, 0)),
                    pl.BlockSpec((1, D, bk), lambda bh, iq, ik: (bh, 0, ik)),
                    pl.BlockSpec((1, bk, D), lambda bh, iq, ik: (bh, ik, 0)),
                ],
                out_specs=pl.BlockSpec((1, bq, D), lambda bh, iq, ik: (bh, iq, 0)),
                out_shape=jax.ShapeDtypeStruct((B * N, L, D), jnp.bfloat16),
                scratch_shapes=[pltpu.VMEM((bq, D), jnp.float32)],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "parallel", "arbitrary")
                ),
                cost_estimate=pl.CostEstimate(
                    flops=4 * B * N * L * L * D,
                    bytes_accessed=B * N * L * D * 4,
                    transcendentals=0,
                ),
            )(q8, k8t, v)
            return acc + jnp.sum(o[:, :1, :1].astype(jnp.float32))

        return jax.lax.fori_loop(0, CH, body, jnp.zeros(()))

    key = jax.random.PRNGKey(0)
    q8 = (jax.random.normal(key, (B * N, L, D)) * 10).astype(jnp.int8)
    k8t = (jax.random.normal(key, (B * N, D, L)) * 10).astype(jnp.int8)
    v = jax.random.normal(key, (B * N, L, D), jnp.bfloat16)
    t = measure(run, q8, k8t, v)
    print(f"int8QK dots-only: {t*1e3:8.2f} ms  {FLOPS/t/1e12:6.1f} TF/s", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "dots"):
        dots_only()
        int8_dots_only()
    if which in ("all", "sweep"):
        sweep()

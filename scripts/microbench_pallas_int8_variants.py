"""Probe Mosaic int8 matmul lowering variants to find the fast path."""

import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, K, N = 21504, 1536, 1536
CH = 200


def measure(fn, *args):
    out = fn(*args)
    float(jnp.sum(out.ravel()[:1].astype(jnp.float32)))
    t0 = time.perf_counter()
    out = fn(*args)
    float(jnp.sum(out.ravel()[:1].astype(jnp.float32)))
    total = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(jnp.sum(out.ravel()[:1].astype(jnp.float32)))
    floor = time.perf_counter() - t0
    return max(total - floor, 1e-9) / CH


def build(BM, BN, kernel, out_dtype):
    def call(a, b):
        return pl.pallas_call(
            kernel,
            grid=(M // BM, N // BN),
            in_specs=[
                pl.BlockSpec((BM, K), lambda i, j: (i, 0)),
                pl.BlockSpec((K, BN), lambda i, j: (0, j)),
            ],
            out_specs=pl.BlockSpec((BM, BN), lambda i, j: (i, j)),
            out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
            cost_estimate=pl.CostEstimate(
                flops=2 * M * K * N, bytes_accessed=M * K + K * N + M * N,
                transcendentals=0,
            ),
        )(a, b)

    @jax.jit
    def chained(a, b):
        def body(i, acc):
            return call(acc, b)

        return jax.lax.fori_loop(0, CH, body, a)

    return chained


# int8 x int8 -> int32 accum -> requant to int8 inside kernel
def k_requant(a_ref, b_ref, o_ref):
    acc = jax.lax.dot_general(
        a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    o_ref[:] = jnp.clip(acc >> 8, -127, 127).astype(jnp.int8)


# int8 x int8 -> int32 accum -> f32 scale -> bf16 out (the flash/linear pattern)
def k_scaled(a_ref, b_ref, o_ref):
    acc = jax.lax.dot_general(
        a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    o_ref[:] = (acc.astype(jnp.float32) * 0.0039).astype(jnp.bfloat16)


def k_bf16(a_ref, b_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def main():
    key = jax.random.PRNGKey(0)
    flops = 2 * M * K * N
    a16 = jax.random.normal(key, (M, K), jnp.bfloat16)
    b16 = jax.random.normal(key, (K, N), jnp.bfloat16)
    a8 = (a16.astype(jnp.float32) * 10).astype(jnp.int8)
    b8 = (b16.astype(jnp.float32) * 10).astype(jnp.int8)

    for bm, bn in [(1024, 512), (2688, 768), (1024, 1536)]:
        t = measure(build(bm, bn, k_requant, jnp.int8), a8, b8)
        print(f"int8 requant {bm}x{bn}: {t*1e3:7.2f} ms  {flops/t/1e12:6.1f} TOP/s")

    # scaled variant: bf16 out, chain re-feeds bf16 a? needs int8 in; use one-shot timing instead
    def once(a, b):
        return build(1024, 512, k_scaled, jnp.bfloat16)

    t = measure(build(1024, 1536, k_bf16, jnp.bfloat16), a16, b16)
    print(f"bf16 1024x1536       : {t*1e3:7.2f} ms  {flops/t/1e12:6.1f} TF/s")


if __name__ == "__main__":
    main()

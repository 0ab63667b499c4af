"""Does a Pallas kernel's int8 dot_general hit ~2x bf16 MXU rates?

Chained-inside-jit timing (RPC-floor-safe, see bench.py).
"""

import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, K, N = 21504, 1536, 1536  # square-ish so we can chain M,K -> M,N -> ...
CH = 20
BM, BN = 1024, 512


def mm_pallas(dtype, acc_dtype):
    def kernel(a_ref, b_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=acc_dtype,
        ).astype(o_ref.dtype)

    def call(a, b):
        return pl.pallas_call(
            kernel,
            grid=(M // BM, N // BN),
            in_specs=[
                pl.BlockSpec((BM, K), lambda i, j: (i, 0)),
                pl.BlockSpec((K, BN), lambda i, j: (0, j)),
            ],
            out_specs=pl.BlockSpec((BM, BN), lambda i, j: (i, j)),
            out_shape=jax.ShapeDtypeStruct((M, N), dtype),
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


def main():
    key = jax.random.PRNGKey(0)
    flops = 2 * M * K * N

    a16 = jax.random.normal(key, (M, K), jnp.bfloat16)
    b16 = jax.random.normal(key, (K, N), jnp.bfloat16)
    t = measure(mm_pallas(jnp.bfloat16, jnp.float32), a16, b16)
    print(f"Pallas bf16: {t*1e3:7.2f} ms  {flops/t/1e12:6.1f} TF/s")

    a8 = (a16.astype(jnp.float32) * 10).astype(jnp.int8)
    b8 = (b16.astype(jnp.float32) * 10).astype(jnp.int8)
    t = measure(mm_pallas(jnp.int8, jnp.int32), a8, b8)
    print(f"Pallas int8: {t*1e3:7.2f} ms  {flops/t/1e12:6.1f} TOP/s")


if __name__ == "__main__":
    main()

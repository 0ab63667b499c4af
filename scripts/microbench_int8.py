"""Microbenchmark: is int8 matmul actually ~2x bf16 on this chip?

Timing recipe for the tunneled platform (see bench.py): chain N iterations
inside ONE jit (fori_loop), force with a host read, subtract the RPC floor
measured on an already-computed buffer.
"""

import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, K, N = 21504, 1536, 8960
CH = 20  # chained iterations per dispatch


def measure(fn, *args):
    out = fn(*args)
    float(jnp.sum(out.ravel()[:1]))  # compile + warm
    t0 = time.perf_counter()
    out = fn(*args)
    float(jnp.sum(out.ravel()[:1]))
    total = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(jnp.sum(out.ravel()[:1]))
    floor = time.perf_counter() - t0
    return max(total - floor, 1e-9) / CH


def main():
    key = jax.random.PRNGKey(0)
    a16 = jax.random.normal(key, (M, K), jnp.bfloat16)
    b16 = jax.random.normal(key, (K, N), jnp.bfloat16)
    c16 = jax.random.normal(key, (N, K), jnp.bfloat16)
    a8 = (a16.astype(jnp.float32) * 10).astype(jnp.int8)
    b8 = (b16.astype(jnp.float32) * 10).astype(jnp.int8)
    c8 = (c16.astype(jnp.float32) * 10).astype(jnp.int8)

    # 2 matmuls per iteration (there and back), no transcendentals
    @jax.jit
    def mm_bf16(a, b, c):
        def body(i, acc):
            h = jax.lax.dot_general(acc, b, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            return jax.lax.dot_general(h.astype(jnp.bfloat16), c,
                                       (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32
                                       ).astype(jnp.bfloat16)
        return jax.lax.fori_loop(0, CH, body, a)

    @jax.jit
    def mm_int8(a, b, c):
        def body(i, acc):
            h = jax.lax.dot_general(acc, b, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            h8 = (h >> 8).astype(jnp.int8)
            o = jax.lax.dot_general(h8, c, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            return (o >> 8).astype(jnp.int8)
        return jax.lax.fori_loop(0, CH, body, a)

    # W8A8 with dynamic per-row activation quant, like the real linear layer
    @jax.jit
    def mm_w8a8(a, b, c):
        def q(x):
            s = jnp.max(jnp.abs(x), axis=-1, keepdims=True).astype(jnp.float32) / 127.0
            xq = jnp.round(x.astype(jnp.float32) / jnp.maximum(s, 1e-9)).astype(jnp.int8)
            return xq, s

        def body(i, acc):
            xq, s = q(acc)
            h = jax.lax.dot_general(xq, b, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            h = (h.astype(jnp.float32) * s).astype(jnp.bfloat16)
            xq2, s2 = q(h)
            o = jax.lax.dot_general(xq2, c, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            return (o.astype(jnp.float32) * s2).astype(jnp.bfloat16)
        return jax.lax.fori_loop(0, CH, body, a)

    flops = 2 * 2 * M * K * N  # 2 matmuls per iteration
    t = measure(mm_bf16, a16, b16, c16)
    print(f"XLA bf16       : {t*1e3:8.2f} ms/iter  {flops/t/1e12:6.1f} TF/s")
    t = measure(mm_int8, a8, b8, c8)
    print(f"XLA int8 (pure): {t*1e3:8.2f} ms/iter  {flops/t/1e12:6.1f} TOP/s")
    t = measure(mm_w8a8, a16, b8, c8)
    print(f"XLA w8a8 (dyn) : {t*1e3:8.2f} ms/iter  {flops/t/1e12:6.1f} TOP/s")


if __name__ == "__main__":
    main()

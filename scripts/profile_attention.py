"""Microbenchmarks on the real chip: matmul MFU ceiling, Pallas flash
attention block sweep at the DiT self/cross shapes."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, n=4):
    out = fn(*args)
    float(jnp.sum(out[..., :1, :1].astype(jnp.float32)))  # compile+force
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    float(jnp.sum(out[..., :1, :1].astype(jnp.float32)))
    t0b = time.perf_counter()
    total = t0b - t0
    # rpc floor
    float(jnp.sum(out[..., :1, :1].astype(jnp.float32)))
    rpc = time.perf_counter() - t0b
    return max(total - rpc, 1e-9) / n


def main():
    key = jax.random.PRNGKey(0)

    m = k = n = 8192
    a = jax.random.normal(key, (m, k), jnp.bfloat16)
    b = jax.random.normal(key, (k, n), jnp.bfloat16)

    @jax.jit
    def mm(a, b):
        x = a
        for _ in range(8):
            x = (x @ b) * 0.01
        return x

    t = timeit(mm, a, b) / 8
    print(f"matmul {m}: {t*1e3:.2f} ms -> {2*m*k*n/t/1e12:.1f} TF/s")

    from stableavatar_tpu.ops.flash_attention import flash_attention

    # self-attention shape
    bsz, L, N, D = 3, 21504, 12, 128
    q = jax.random.normal(key, (bsz, L, N, D), jnp.bfloat16)
    kk = jax.random.normal(key, (bsz, L, N, D), jnp.bfloat16)
    v = jax.random.normal(key, (bsz, L, N, D), jnp.bfloat16)
    aflops = 4 * bsz * N * L * L * D

    for bq, bk in [(512, 512), (1024, 512), (512, 1024), (1024, 1024), (2048, 512), (256, 1024)]:
        fn = jax.jit(lambda q, k, v, bq=bq, bk=bk: flash_attention(q, k, v, block_q=bq, block_k=bk))
        try:
            t = timeit(fn, q, kk, v)
            print(f"self pallas bq={bq} bk={bk}: {t*1e3:.1f} ms -> {aflops/t/1e12:.1f} TF/s")
        except Exception as e:
            print(f"self pallas bq={bq} bk={bk}: FAILED {type(e).__name__}: {str(e)[:100]}")

    # cross-attention shape (text+img kv: 769 tokens)
    Lk = 769
    kc = jax.random.normal(key, (bsz, Lk, N, D), jnp.bfloat16)
    vc = jax.random.normal(key, (bsz, Lk, N, D), jnp.bfloat16)
    cflops = 4 * bsz * N * L * Lk * D

    fx = jax.jit(lambda q, k, v: jax.nn.dot_product_attention(q, k, v, implementation="xla"))
    t = timeit(fx, q, kc, vc)
    print(f"cross xla: {t*1e3:.1f} ms -> {cflops/t/1e12:.1f} TF/s")
    for bq in (512, 1024, 2048):
        fn = jax.jit(lambda q, k, v, bq=bq: flash_attention(q, k, v, block_q=bq, block_k=1024))
        try:
            t = timeit(fn, q, kc, vc)
            print(f"cross pallas bq={bq}: {t*1e3:.1f} ms -> {cflops/t/1e12:.1f} TF/s")
        except Exception as e:
            print(f"cross pallas bq={bq}: FAILED {type(e).__name__}: {str(e)[:100]}")

    # correctness spot check
    got = jax.jit(lambda q, k, v: flash_attention(q, k, v))(q[:1, :2048], kk[:1, :2048], v[:1, :2048])
    want = fx(q[:1, :2048], kk[:1, :2048], v[:1, :2048])
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - want.astype(jnp.float32))))
    print(f"pallas vs xla max abs err (bf16): {err:.4f}")


if __name__ == "__main__":
    main()

"""block_q sweep for the CROSS-attention regime (Lq=21504, Lk=512/257).

The default bf16 blocks (1024x1024) were swept at the SELF-attention shape
(Lk=21504); at cross-attn Lk fits one k-block, so the grid is (B*N, nq, 1)
= 756 cells of ~2.7e8 FLOPs each — small enough that per-cell overhead can
dominate (measured 82 TF/s vs 140 for self-attn, docs/PERF.md).  This sweep
times the full cross-attn call (txt Lk=512 + img Lk=257, summed like
models/dit.py:_cross_attention) per layer, chained 30x, for block_q in
{1024, 1536, 2048, 3072}.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from stableavatar_tpu.ops.flash_attention import flash_attention

B, L, N, D = 3, 21504, 12, 128
LAYERS = 30


def measure(fn, *args, n=1):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    total = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.block_until_ready(out)
    floor = time.perf_counter() - t0
    return max(total - floor, 1e-9) / n


def main():
    key = jax.random.PRNGKey(0)
    kq, kt, ki = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, L, N, D), jnp.bfloat16)
    kv_t = jax.random.normal(kt, (B, 512, N, D), jnp.bfloat16)
    kv_i = jax.random.normal(ki, (B, 257, N, D), jnp.bfloat16)

    for bq in (1024, 1536, 2048, 3072):

        @jax.jit
        def chain(q, kv_t, kv_i, bq=bq):
            def body(i, h):
                txt = flash_attention(h, kv_t, kv_t, block_q=bq)
                img = flash_attention(h, kv_i, kv_i, block_q=bq)
                return (txt + img).astype(h.dtype)

            return jax.lax.fori_loop(0, LAYERS, body, q)

        t = measure(chain, q, kv_t, kv_i, n=LAYERS)
        flops = 4 * B * N * L * (512 + 257) * D  # two MAC dots, per layer
        print(
            f"bq={bq:5d}: {t*1e3:7.2f} ms/layer  -> {t*LAYERS:6.3f} s/step"
            f"  ({flops/t/1e12:.0f} TF/s)",
            flush=True,
        )


if __name__ == "__main__":
    main()

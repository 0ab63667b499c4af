"""Compare attention kernels at the DiT self-attention shape:
our flash kernel vs jax's official mosaic flash / splash attention."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

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


def main():
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, N, L, D), jnp.bfloat16)

    # ours (layout [B, L, N, D])
    from stableavatar_tpu.ops.flash_attention import flash_attention

    @jax.jit
    def ours(q):
        def body(i, h):
            o = flash_attention(
                h.transpose(0, 2, 1, 3), h.transpose(0, 2, 1, 3),
                h.transpose(0, 2, 1, 3),
            )
            return o.transpose(0, 2, 1, 3)

        return jax.lax.fori_loop(0, CH, body, q)

    t = measure(ours, q)
    print(f"ours bq=bk=1024 : {t*1e3:8.2f} ms  {FLOPS/t/1e12:6.1f} TF/s")

    @jax.jit
    def ours_nt(q):
        # without the transposes (kernel-native layout timing)
        def body(i, h):
            return flash_attention(h, h, h)

        return jax.lax.fori_loop(0, CH, body, q.transpose(0, 2, 1, 3))

    t = measure(ours_nt, q)
    print(f"ours (no xpose) : {t*1e3:8.2f} ms  {FLOPS/t/1e12:6.1f} TF/s")

    # official mosaic flash attention ([B, N, L, D])
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, flash_attention as mosaic_flash,
    )

    bs = BlockSizes(
        block_q=1024, block_k_major=1024, block_k=1024, block_b=1,
        block_q_major_dkv=1024, block_k_major_dkv=1024, block_q_dkv=1024,
        block_k_dkv=1024, block_q_dq=1024, block_k_dq=1024, block_k_major_dq=1024,
    )

    @jax.jit
    def official(q):
        def body(i, h):
            return mosaic_flash(h, h, h, causal=False, sm_scale=D**-0.5,
                                block_sizes=bs)

        return jax.lax.fori_loop(0, CH, body, q)

    t = measure(official, q)
    print(f"mosaic flash    : {t*1e3:8.2f} ms  {FLOPS/t/1e12:6.1f} TF/s")

    # splash attention (MHA, full mask)
    try:
        from jax.experimental.pallas.ops.tpu.splash_attention import (
            BlockSizes as SplashBlocks, FullMask, MultiHeadMask,
        )
        from jax.experimental.pallas.ops.tpu.splash_attention.splash_attention_kernel import (
            make_splash_mha_single_device,
        )

        mask = MultiHeadMask([FullMask((L, L)) for _ in range(N)])
        sbs = SplashBlocks(
            block_q=1024, block_kv=1024, block_kv_compute=1024,
            block_q_dkv=1024, block_kv_dkv=1024, block_kv_dkv_compute=1024,
            block_q_dq=1024, block_kv_dq=1024,
        )
        splash = make_splash_mha_single_device(mask=mask, block_sizes=sbs)

        @jax.jit
        def run_splash(q):
            def body(i, h):
                o = jax.vmap(splash)(h * (D**-0.5), h, h)
                return o.astype(h.dtype)

            return jax.lax.fori_loop(0, CH, body, q)

        t = measure(run_splash, q)
        print(f"splash          : {t*1e3:8.2f} ms  {FLOPS/t/1e12:6.1f} TF/s")
    except Exception as e:
        print("splash failed:", type(e).__name__, e)


if __name__ == "__main__":
    main()

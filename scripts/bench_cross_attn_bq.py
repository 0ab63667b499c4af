"""block_q sweep for the CROSS-attention regime (Lq=21504, Lk=512/257).

The default bf16 blocks (1024x1024) were swept at the SELF-attention shape
(Lk=21504); at cross-attn Lk fits one k-block, so the grid is (B*N, nq, 1)
= 756 cells of ~2.7e8 FLOPs each — small enough that per-cell overhead can
dominate (measured 82 TF/s vs 140 for self-attn, docs/PERF.md).  This sweep
times the txt (Lk=512) + img (Lk=257) cross-attn calls, summed like
models/dit.py:_cross_attention, per layer, chained 30x.

Sweep restricted to divisors of Lq=21504 (1024/1536/3072): non-dividing
block_q values pad q (flash_attention.py pads to the next block multiple),
so their useful-FLOPs TF/s would be understated relative to the dividing
configs and the ranking unfair (ADVICE r4).

NOT covered here: the vocal branch — it is a third flash_attention call in
a different regime (per-frame regrouped batch b*f with Lq=L/f plus k_lens
masking); a block_q winner from this sweep must not be applied to that call
site blindly (see bench_vocal_attn in this file for a separate timing).
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
REPS = 5  # one-shot timings on a shared TPU are noisy; report min over reps


def measure(fn, *args, n=1, reps=REPS):
    out = fn(*args)
    jax.block_until_ready(out)  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best / n


def bench_txt_img():
    key = jax.random.PRNGKey(0)
    kq, kt, ki = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, L, N, D), jnp.bfloat16)
    kv_t = jax.random.normal(kt, (B, 512, N, D), jnp.bfloat16)
    kv_i = jax.random.normal(ki, (B, 257, N, D), jnp.bfloat16)

    for bq in (1024, 1536, 3072):  # divisors of 21504 only (docstring)

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


def bench_vocal_attn():
    """The vocal branch's own regime: q regrouped to (B*f, L/f, N, D) with
    k_lens-masked audio keys (models/dit.py:_cross_attention vocal path)."""
    import numpy as np

    f = 21
    la = 64  # padded per-frame audio window length
    key = jax.random.PRNGKey(1)
    kq, kv = jax.random.split(key)
    qv = jax.random.normal(kq, (B * f, L // f, N, D), jnp.bfloat16)
    kvv = jax.random.normal(kv, (B * f, la, N, D), jnp.bfloat16)
    k_lens = jnp.asarray(np.full((B * f,), 49), jnp.int32)

    @jax.jit
    def chain(qv, kvv, k_lens):
        def body(i, h):
            return flash_attention(h, kvv, kvv, k_lens=k_lens).astype(h.dtype)

        return jax.lax.fori_loop(0, LAYERS, body, qv)

    t = measure(chain, qv, kvv, k_lens, n=LAYERS)
    print(f"vocal branch: {t*1e3:7.2f} ms/layer -> {t*LAYERS:6.3f} s/step",
          flush=True)


def main():
    bench_txt_img()
    bench_vocal_attn()


if __name__ == "__main__":
    main()

"""Round-3 attention levers, measured at the DiT self-attention shape
(VERDICT r2 'weak' #2): exp2-based softmax (log2e folded into the logit
scale) and int8 V streaming ("qkv").  Chained-jit timing with RPC-floor
subtraction (scripts/microbench_int8.py method).

Usage: python scripts/bench_attn_levers.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

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


def bench(quant, exp2, block=None):
    from stableavatar_tpu.ops import flash_attention as fa

    fa.EXP2_SOFTMAX = exp2
    kw = {}
    if block:
        kw = {"block_q": block, "block_k": block}

    @jax.jit
    def run(q, k, v):
        def body(i, h):
            return fa.flash_attention(h, k, v, quant=quant, **kw)

        return jax.lax.fori_loop(0, CH, body, q)

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 3)
    q = jax.random.normal(ks[0], (B, L, N, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, L, N, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, L, N, D), jnp.bfloat16)
    dt = measure(run, q, k, v)
    print(f"quant={quant:5s} exp2={int(exp2)} block={block or 'def'}: "
          f"{dt*1e3:7.1f} ms/layer  {FLOPS/dt/1e12:6.1f} TF/s-equiv", flush=True)
    return dt


def numerics(quant):
    """Max-rel error of the quant/exp2 path vs the bf16 exp reference."""
    from stableavatar_tpu.ops import flash_attention as fa

    key = jax.random.PRNGKey(7)
    ks = jax.random.split(key, 3)
    b, l, n, d = 2, 1024, 4, 128
    q = jax.random.normal(ks[0], (b, l, n, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, l, n, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (b, l, n, d), jnp.bfloat16)
    fa.EXP2_SOFTMAX = False
    ref = np.asarray(fa.flash_attention(q, k, v, quant="none")).astype(np.float32)
    fa.EXP2_SOFTMAX = True
    got = np.asarray(fa.flash_attention(q, k, v, quant=quant)).astype(np.float32)
    denom = np.maximum(np.abs(ref), 1e-2)
    print(f"numerics quant={quant} exp2=1 vs bf16-exp: "
          f"max-rel {np.max(np.abs(got - ref) / denom):.4f}", flush=True)


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    base = bench("qk", False)
    e2 = bench("qk", True)
    qkv = bench("qkv", True)
    qkv_noe2 = bench("qkv", False)
    bf16 = bench("none", False)
    bf16_e2 = bench("none", True)
    print(f"\nexp2 on int8-qk: {base*1e3:.1f} -> {e2*1e3:.1f} ms "
          f"({(base-e2)/base*100:+.1f}%)")
    print(f"qkv (int8 V) vs qk (both exp2): {e2*1e3:.1f} -> {qkv*1e3:.1f} ms "
          f"({(e2-qkv)/e2*100:+.1f}%)")
    print(f"exp2 on bf16: {bf16*1e3:.1f} -> {bf16_e2*1e3:.1f} ms "
          f"({(bf16-bf16_e2)/bf16*100:+.1f}%)")
    numerics("qk")
    numerics("qkv")


if __name__ == "__main__":
    main()

"""Fused dual-context cross-attn kernel vs the two-call path, on-chip.

Times the txt (Lk=512) + img (Lk=257) cross-attention of one DiT window
step (Lq=21504, B=3, N=12, D=128 — models/dit.py:_cross_attention) three
ways, chained LAYERS x inside one jit (RPC-floor-safe, see
scripts/microbench_int8.py):

  a) two Pallas flash calls + add   (shipped two-call path, 82 TF/s in
     docs/PERF.md's component budget)
  b) fused dual-context kernel      (ops/cross_attention.py)
  c) two XLA dot_product_attention  (materializes [B,N,Lq,Lk] f32 logits —
     viable at these SHORT contexts, included as the "let XLA do it" bar)

Useful FLOPs counted for the UNPADDED segment lengths (512 + 257).

WARNING — this ISOLATED ranking disagrees with the in-context one and
must not drive routing decisions.  Measured v5e: isolated, XLA (c) wins
(9.7 ms/layer vs fused 16.8 vs two-Pallas 20.1); inside the full DiT step
(scripts/bench_cross_route.py) the order INVERTS — fused 2.944 s/step <
two-Pallas 3.045 < XLA 3.191 — because the XLA path's ~1.9 GB/layer of
materialized f32 logits has the HBM to itself here but competes with the
surrounding projections in the real block.  Route from bench_cross_route.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

B, L, N, D = 3, 21504, 12, 128
L1, L2 = 512, 257
LAYERS = 30
REPS = 5

FLOPS = 4 * B * N * L * (L1 + L2) * D * LAYERS


def make_chain(fn, kvs):
    """One jitted program running fn LAYERS times with a serializing carry.
    Built ONCE per fn: rebuilding the closure per rep would re-trace and
    re-compile every call (a fresh callable misses the jit cache) and time
    compiles instead of the kernel."""

    def body(x, _):
        out = fn(x, *kvs)
        x = x + 0.0 * out[:, :1].mean()  # serialize on out
        return x, out[:, 0, 0, 0]

    @jax.jit
    def run(x):
        x, outs = jax.lax.scan(body, x, None, length=LAYERS)
        return outs.sum() + x.mean()

    return run


def measure(fn, q, kvs):
    run = make_chain(fn, kvs)
    float(run(q))  # compile + warm (block_until_ready no-op over the tunnel)
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        r = run(q)
        float(r)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    from stableavatar_tpu.ops.attention import attention
    from stableavatar_tpu.ops.cross_attention import dual_context_attention

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    q = jax.random.normal(ks[0], (B, L, N, D), jnp.bfloat16)
    k1 = jax.random.normal(ks[1], (B, L1, N, D), jnp.bfloat16)
    v1 = jax.random.normal(ks[2], (B, L1, N, D), jnp.bfloat16)
    k2 = jax.random.normal(ks[3], (B, L2, N, D), jnp.bfloat16)
    v2 = jax.random.normal(ks[4], (B, L2, N, D), jnp.bfloat16)
    kvs = (k1, v1, k2, v2)

    def two_pallas(x, k1, v1, k2, v2):
        return (attention(x, k1, v1, backend="pallas")
                + attention(x, k2, v2, backend="pallas"))

    def fused(x, k1, v1, k2, v2):
        return dual_context_attention(x, k1, v1, k2, v2, backend="pallas")

    def two_xla(x, k1, v1, k2, v2):
        a = jax.nn.dot_product_attention(x, k1, v1, implementation="xla")
        b = jax.nn.dot_product_attention(x, k2, v2, implementation="xla")
        return a + b

    for name, fn in [("two_pallas", two_pallas), ("fused", fused),
                     ("two_xla", two_xla)]:
        try:
            s = measure(fn, q, kvs)
            print(f"{name:12s} {s*1000/LAYERS:8.2f} ms/layer  "
                  f"{FLOPS/s/1e12:6.1f} TF/s  ({s:.3f}s / {LAYERS} layers)",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:12s} FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()

"""Same-process A/B of the dual-context cross-attention ROUTE inside the
full DiT window step (fast path, bench geometry).

The microbench (scripts/bench_cross_fused.py) measured the isolated
txt+img calls: two-XLA 9.7 ms/layer < fused-pallas 16.8 < two-pallas 20.1.
But in-context the XLA route materializes ~2.4 GB of f32 logits per layer,
which competes for HBM with everything around it, and the chained-layer
microbench serializes differently than the real block.  This script times
the REAL `dit_forward` under each route in ONE process so run-to-run
tunnel variance cannot flip the ranking (VERDICT r4: adopt only measured
wins).

Routes (env STABLEAVATAR_DUAL_CROSS, read at trace time):
  off    -> two Pallas flash calls (r4 shipped path)
  xla    -> fused helper, XLA two-SDPA branch
  pallas -> fused helper, single-pass Pallas kernel

Usage: python scripts/bench_cross_route.py [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

N_INNER = 8


def measure(fn, args, reps):
    out = fn(*args)
    float(jnp.sum(out[0, 0, 0, 0]))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(out[0, 0, 0, 0]))
        total = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(jnp.sum(out[0, 0, 0, 0]))
        floor = time.perf_counter() - t0
        best = min(best, max(total - floor, 1e-9) / N_INNER)
    return best


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    jax.config.update("jax_compilation_cache_dir", "/tmp/stableavatar_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    from stableavatar_tpu.config import WAN_1_3B
    from stableavatar_tpu.models.dit import cast_params, dit_forward, init_dit
    from stableavatar_tpu.utils.fastpath import prepare_fast_params

    cfg = WAN_1_3B
    key = jax.random.PRNGKey(0)
    f, lh, lw = 21, 64, 64
    la = 167

    params = cast_params(init_dit(key, cfg), jnp.bfloat16)
    p = prepare_fast_params(params, cfg, quant=True)

    x = jnp.asarray(np.random.randn(3, 16, f, lh, lw), jnp.bfloat16)
    t = jnp.full((3,), 500.0, jnp.float32)
    text = jnp.asarray(np.random.randn(3, cfg.text_len, cfg.text_dim), jnp.bfloat16)
    clip_fea = jnp.asarray(np.random.randn(3, cfg.clip_tokens, cfg.clip_dim), jnp.bfloat16)
    y = jnp.asarray(np.random.randn(3, 20, f, lh, lw), jnp.bfloat16)
    vocal = jnp.asarray(np.random.randn(1, la, cfg.audio_in_dim), jnp.bfloat16)
    args = (p, x, t, text, clip_fea, y, vocal)

    results = {}
    for route in ("off", "xla", "pallas"):
        os.environ["STABLEAVATAR_DUAL_CROSS"] = route

        @jax.jit
        def steps_n(params, x, t, text, clip_fea, y, vocal):
            def body(i, lat):
                out = dit_forward(
                    params, cfg, lat, t, text, clip_fea, y, vocal,
                    video_sample_n_frames=81, vocal_cfg_tile=True,
                    rope_split=True, attn_quant="qk",
                )
                return (lat.astype(jnp.float32) - 0.01 * out).astype(lat.dtype)

            return jax.lax.fori_loop(0, N_INNER, body, x)

        dt = measure(steps_n, args, reps)
        results[route] = dt
        print(f"route={route:7s}: {dt:7.3f} s/step (min of {reps})", flush=True)

    best = min(results, key=results.get)
    print(f"winner: {best}  ({results[best]:.3f} s/step)", flush=True)


if __name__ == "__main__":
    main()

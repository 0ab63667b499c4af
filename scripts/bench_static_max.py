"""Same-process A/B of the STATIC-bound softmax (ops/flash_attention.py
STATIC_MAX) inside the full DiT window step (fast path, bench geometry).

With a precomputed per-(slab, q-block) logit bound the int8 flash kernel
drops the row-max reduction, the correction exp, and the acc/l rescale
multiplies per [BQ, BK] cell — the remaining VPU work per cell is one exp
pass + one sum reduction.  docs/PERF.md measures the bf16 kernel's ~25%
gap to the dots-only ceiling as non-overlapped softmax VPU time, so the
expected win is a fraction of that tail.  Numerics: softmax is
shift-invariant for any bound >= rowmax (parity test:
tests/test_fastpath.py::test_flash_kernel_static_max_matches_online);
over-bounding only underflows mass that is ~e^-40 relative.

Times the REAL `dit_forward` under each route in ONE process so run-to-run
tunnel variance cannot flip the ranking (adopt only measured wins).

Usage: python scripts/bench_static_max.py [reps]
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
    from stableavatar_tpu.ops import flash_attention as fa
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
    outs = {}
    # interleave the routes twice: A B A B separates a real ranking from a
    # tunnel drift that happens to straddle the switch
    for tag, static in (("online", False), ("static", True),
                        ("online2", False), ("static2", True)):
        fa.STATIC_MAX = static  # read at trace time by flash_attention

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
        results[tag] = dt
        outs[tag] = np.asarray(steps_n(*args)[:, :, 0, :4, :4], np.float32)
        print(f"route={tag:8s}: {dt:7.3f} s/step (min of {reps})", flush=True)

    on = min(results["online"], results["online2"])
    st = min(results["static"], results["static2"])
    rel = float(np.max(np.abs(outs["online"] - outs["static"])))
    print(f"online {on:.3f} vs static {st:.3f} s/step "
          f"({(on - st) * 1e3:+.0f} ms; probe-slice max|diff| {rel:.2e})",
          flush=True)
    print("ADOPT static_max" if st < on - 0.02 else "keep online max",
          flush=True)


if __name__ == "__main__":
    main()

"""14B single-chip feasibility probe (VERDICT r2 item 8).

Answers, with numbers: can ONE 16 GB v5e hold a 14B window step with int8
weight storage, and if not, what is the boundary and the minimum fsdp
degree?

Part 1 (host, exact): param-tree byte budget from `jax.eval_shape` over
`init_dit(WAN_14B)` — no device memory touched.  The reference 14B config
(`/root/reference/wan/configs/wan_t2v_14B.py:20-28`, fantasy vocal branches
added by `wan_fantasy_transformer3d_14B.py`) yields 18.95B params; int8
block linears + bf16 rest = 19.66 GB, ABOVE the 16 GB HBM of a v5e before
any activation.  Conclusion is static: weights alone do not fit; minimum
fsdp degree is 2 (9.8 GB/chip weights + activations fits comfortably —
the fsdp=8 plan/step tests in tests/test_sharding.py exercise exactly that
sharding on the virtual mesh).

Part 2 (chip, optional: --on-chip): measure the deepest layer truncation
that DOES fit with int8 weights and time one 512x512 window step at that
depth, extrapolating linearly to 40 layers for the projected per-step cost
once >=2 chips are available.

Output: one JSON line per finding (BENCH-style).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def budget():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp  # noqa: F401

    from stableavatar_tpu.config import WAN_14B
    from stableavatar_tpu.models.dit import init_dit
    from stableavatar_tpu.utils.fastpath import _QUANT_TARGETS

    shapes = jax.eval_shape(lambda k: init_dit(k, WAN_14B), jax.random.PRNGKey(0))
    total_params = sum(x.size for x in jax.tree.leaves(shapes))
    blocks = shapes["blocks"]
    qparams = sum(blocks[m][n]["w"].size for m, n in _QUANT_TARGETS)
    rest_bytes = (total_params - qparams) * 2
    int8_total = qparams + rest_bytes
    out = {
        "metric": "wan14b_int8_weight_bytes",
        "value": round(int8_total / 1e9, 2),
        "unit": "GB",
        "detail": {
            "total_params_B": round(total_params / 1e9, 2),
            "quantized_block_params_B": round(qparams / 1e9, 2),
            "bf16_rest_GB": round(rest_bytes / 1e9, 2),
            "v5e_hbm_GB": 16,
            "fits_single_chip": bool(int8_total < 15.5e9),
            "min_fsdp_degree": 2,
            "per_chip_GB_at_fsdp2": round(int8_total / 2 / 1e9, 2),
        },
    }
    print(json.dumps(out))
    return out


def try_depth_main(n_layers: int):
    """Single-depth worker (run in a SUBPROCESS: an OOM at one depth can
    poison the device client for later allocations, so each depth gets a
    fresh process).  Prints `DEPTH_OK <seconds>` or raises."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/stableavatar_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    from stableavatar_tpu.config import WAN_14B
    from stableavatar_tpu.models.dit import dit_forward, init_dit
    from stableavatar_tpu.utils.fastpath import prepare_fast_params

    size, frames = 512, 21
    cfg = dataclasses.replace(WAN_14B, num_layers=n_layers)
    # materialize the FINAL int8-storage structure directly (zeros/ones in
    # the target dtypes): a fused init+quantize jit holds the bf16 tree and
    # the int8 tree live simultaneously (~1.5x the steady-state bytes) and
    # would OOM ~12 layers — the steady state is what we are probing.
    # Values don't affect step timing; RMS-norm eps keeps zeros finite.
    shapes = jax.eval_shape(
        lambda k: prepare_fast_params(init_dit(k, cfg), cfg, quant=True),
        jax.random.PRNGKey(0),
    )

    def materialize(leaf):
        if leaf.dtype == jnp.int8:
            return jnp.zeros(leaf.shape, jnp.int8)
        if leaf.dtype == jnp.float32:
            return jnp.full(leaf.shape, 0.01, jnp.float32)
        return jnp.zeros(leaf.shape, leaf.dtype)

    params = jax.jit(lambda: jax.tree.map(materialize, shapes))()
    jax.block_until_ready(jax.tree.leaves(params)[0])
    lat = jnp.zeros((3, 16, frames, size // 8, size // 8), jnp.bfloat16)
    y = jnp.zeros((3, 20, frames, size // 8, size // 8), jnp.bfloat16)
    text = jnp.zeros((3, cfg.text_len, cfg.text_dim), jnp.bfloat16)
    clip = jnp.zeros((3, cfg.clip_tokens, cfg.clip_dim), jnp.bfloat16)
    vocal = jnp.zeros((1, 340, cfg.audio_in_dim), jnp.bfloat16)
    t = jnp.full((3,), 500.0, jnp.float32)

    f = jax.jit(
        lambda p, l: dit_forward(
            p, cfg, l, t, text, clip, y, vocal,
            video_sample_n_frames=(frames - 1) * 4 + 1,
            vocal_cfg_tile=True, rope_split=True, attn_quant="qk",
        )
    )
    out = f(params, lat)
    np.asarray(out[0, 0, 0, 0, 0])  # force (tunnel-safe)
    t0 = time.perf_counter()
    out = f(params, lat)
    np.asarray(out[0, 0, 0, 0, 0])
    print(f"DEPTH_OK {time.perf_counter() - t0:.4f}", flush=True)


def on_chip_probe(max_layers: int):
    """Find the deepest int8-weight truncation that completes a window step."""
    import subprocess

    size, frames = 512, 21
    lh = lw = size // 16  # latent/2 (patch)
    tokens = frames * lh * lw

    def try_depth(n_layers):
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--depth", str(n_layers)],
            capture_output=True, text=True, timeout=1800,
        )
        for line in r.stdout.splitlines():
            if line.startswith("DEPTH_OK"):
                return float(line.split()[1])
        msg = r.stdout + r.stderr
        if ("RESOURCE_EXHAUSTED" in msg or "OOM" in msg
                or "out of memory" in msg.lower() or "memory" in msg.lower()):
            print(f"# depth {n_layers}: OOM", flush=True)
            return None
        raise RuntimeError(f"depth {n_layers} failed non-OOM:\n{msg[-2000:]}")

    lo_fit, hi_fail = 0, max_layers + 1
    timings = {}
    n = max_layers
    while True:
        dt = try_depth(n)
        if dt is None:
            hi_fail = n
        else:
            timings[n] = dt
            lo_fit = n
        if hi_fail - lo_fit <= 1:
            break
        n = (lo_fit + hi_fail) // 2 if lo_fit else hi_fail // 2

    best = max(timings) if timings else 0
    proj = timings[best] / best * 40 if best else None
    print(json.dumps({
        "metric": "wan14b_singlechip_max_layers_int8",
        "value": best,
        "unit": "layers",
        "detail": {
            "tokens": tokens,
            "step_s_at_max_depth": round(timings.get(best, 0.0), 3),
            "projected_40layer_step_s": round(proj, 3) if proj else None,
            "first_failing_depth": hi_fail,
            "timings": {str(k): round(v, 3) for k, v in timings.items()},
        },
    }))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--on-chip", action="store_true")
    ap.add_argument("--max-layers", type=int, default=40)
    ap.add_argument("--depth", type=int, default=None)  # subprocess worker
    args = ap.parse_args()
    if args.depth is not None:
        try_depth_main(args.depth)
    elif args.on_chip:
        on_chip_probe(args.max_layers)
    else:
        budget()

"""On-chip DiT window-step benchmark across fast-path configurations.

Usage: python scripts/bench_dit_step.py [configs...]
  configs from: base, rope, rope_qk, rope_qkpv, full (rope+qkpv+w8a8), w8a8
  default: base full
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from stableavatar_tpu.config import WAN_1_3B
from stableavatar_tpu.models.dit import cast_params, dit_forward, init_dit
from stableavatar_tpu.utils.fastpath import prepare_fast_params

N_INNER = 8


def measure(fn, *args):
    out = fn(*args)
    float(jnp.sum(out[0, 0, 0, 0]))
    t0 = time.perf_counter()
    out = fn(*args)
    float(jnp.sum(out[0, 0, 0, 0]))
    total = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(jnp.sum(out[0, 0, 0, 0]))
    floor = time.perf_counter() - t0
    return max(total - floor, 1e-9) / N_INNER


def main():
    configs = sys.argv[1:] or ["base", "full"]
    cfg = WAN_1_3B
    key = jax.random.PRNGKey(0)
    f, lh, lw = 21, 64, 64
    la = 167

    params = cast_params(init_dit(key, cfg), jnp.bfloat16)

    x = jnp.asarray(np.random.randn(3, 16, f, lh, lw), jnp.bfloat16)
    t = jnp.full((3,), 500.0, jnp.float32)
    text = jnp.asarray(np.random.randn(3, cfg.text_len, cfg.text_dim), jnp.bfloat16)
    clip_fea = jnp.asarray(np.random.randn(3, cfg.clip_tokens, cfg.clip_dim), jnp.bfloat16)
    y = jnp.asarray(np.random.randn(3, 20, f, lh, lw), jnp.bfloat16)
    vocal = jnp.asarray(np.random.randn(1, la, cfg.audio_in_dim), jnp.bfloat16)

    variants = {
        "base": (params, False, "none"),
        "rope": (None, True, "none"),       # prepared, no quant linears
        "rope_qk": (None, True, "qk"),
        "rope_qkpv": (None, True, "qkpv"),
        "w8a8": ("quant_only", False, "none"),
        "full": ("quant", True, "qk"),
    }

    prepared_noq = None
    prepared_q = None

    for name in configs:
        p, rope_split, quant = variants[name]
        if p is None:
            if prepared_noq is None:
                prepared_noq = prepare_fast_params(params, cfg, quant=False)
            p = prepared_noq
        elif p == "quant":
            if prepared_q is None:
                prepared_q = prepare_fast_params(params, cfg, quant=True)
            p = prepared_q
        elif p == "quant_only":
            # w8a8 linears without rope permutation
            from stableavatar_tpu.utils.fastpath import _QUANT_TARGETS, _copy2
            from stableavatar_tpu.utils.quantization import quantize_weight_for_compute

            q = dict(params)
            blocks = _copy2(params["blocks"])
            for mod, nm in _QUANT_TARGETS:
                grp = blocks[mod] = dict(blocks[mod])
                pp = grp[nm]
                new = {"w8": quantize_weight_for_compute(pp["w"])}
                if "b" in pp:
                    new["b"] = pp["b"]
                grp[nm] = new
            q["blocks"] = blocks
            p = q

        @jax.jit
        def steps_n(params, x, t, text, clip_fea, y, vocal, rs=rope_split, qt=quant):
            def body(i, lat):
                out = dit_forward(
                    params, cfg, lat, t, text, clip_fea, y, vocal,
                    video_sample_n_frames=81, vocal_cfg_tile=True,
                    rope_split=rs, attn_quant=qt,
                )
                return (lat.astype(jnp.float32) - 0.01 * out).astype(lat.dtype)

            return jax.lax.fori_loop(0, N_INNER, body, x)

        dt = measure(steps_n, p, x, t, text, clip_fea, y, vocal)
        print(f"{name:10s}: {dt:7.3f} s/step", flush=True)


if __name__ == "__main__":
    main()

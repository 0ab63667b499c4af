"""Component-level timing of the 1.3B DiT step at the 512^2 window shape.

Times each hot component as a 30-layer chained jit (RPC-floor-safe), to
locate where the 3.5 s/step goes.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from stableavatar_tpu.config import WAN_1_3B
from stableavatar_tpu.models.dit import init_dit, cast_params
from stableavatar_tpu.ops.attention import attention
from stableavatar_tpu.ops.norms import layer_norm, rms_norm
from stableavatar_tpu.ops.rope import rope_freqs_3d, rope_apply
from stableavatar_tpu.models.vocal_projector import apply_linear

cfg = WAN_1_3B
B, L, N, D = 3, 21504, 12, 128
DIM, FFN = 1536, 8960
LAYERS = 30


def measure(fn, *args, n=1):
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
    x = jax.random.normal(key, (B, L, DIM), jnp.bfloat16)
    freqs = rope_freqs_3d((21, 32, 32), D)

    params = cast_params(init_dit(key, cfg), jnp.bfloat16)
    bp0 = jax.tree.map(lambda a: a[0], params["blocks"])

    # 1) flash self-attention kernel alone (with the to_bh transposes)
    @jax.jit
    def attn_chain(x):
        def body(i, h):
            q = h.reshape(B, L, N, D)
            o = attention(q, q, q, backend="pallas")
            return o.reshape(B, L, DIM)

        return jax.lax.fori_loop(0, LAYERS, body, x)

    t = measure(attn_chain, x, n=LAYERS)
    print(f"self-attn flash (incl reshape): {t*1e3:8.2f} ms/layer  -> {t*LAYERS:6.3f} s/step")

    # 2) qkvo projections + rms norms + rope (the self-attn epilogue)
    sa = bp0["self_attn"]

    @jax.jit
    def proj_chain(x):
        def body(i, h):
            q = rms_norm(apply_linear(sa["q"], h), sa["norm_q"]["w"], 1e-6).reshape(B, L, N, D)
            k = rms_norm(apply_linear(sa["k"], h), sa["norm_k"]["w"], 1e-6).reshape(B, L, N, D)
            v = apply_linear(sa["v"], h).reshape(B, L, N, D)
            q = rope_apply(q, freqs).astype(h.dtype)
            k = rope_apply(k, freqs).astype(h.dtype)
            o = apply_linear(sa["o"], (q + k + v).reshape(B, L, DIM))
            return o

        return jax.lax.fori_loop(0, LAYERS, body, x)

    t = measure(proj_chain, x, n=LAYERS)
    print(f"qkvo proj + norms + rope      : {t*1e3:8.2f} ms/layer  -> {t*LAYERS:6.3f} s/step")

    # 2b) same without rope
    @jax.jit
    def proj_chain_norope(x):
        def body(i, h):
            q = rms_norm(apply_linear(sa["q"], h), sa["norm_q"]["w"], 1e-6)
            k = rms_norm(apply_linear(sa["k"], h), sa["norm_k"]["w"], 1e-6)
            v = apply_linear(sa["v"], h)
            o = apply_linear(sa["o"], q + k + v)
            return o

        return jax.lax.fori_loop(0, LAYERS, body, x)

    t = measure(proj_chain_norope, x, n=LAYERS)
    print(f"qkvo proj + norms (no rope)   : {t*1e3:8.2f} ms/layer  -> {t*LAYERS:6.3f} s/step")

    # 3) FFN with modulated LN epilogue
    ffn = bp0["ffn"]
    e = jax.random.normal(key, (B, 1, DIM), jnp.bfloat16)

    @jax.jit
    def ffn_chain(x):
        def body(i, h):
            temp = (layer_norm(h, eps=1e-6) * (1 + e) + e).astype(h.dtype)
            y = apply_linear(ffn["fc2"], jax.nn.gelu(apply_linear(ffn["fc1"], temp), approximate=True))
            return h + y * e

        return jax.lax.fori_loop(0, LAYERS, body, x)

    t = measure(ffn_chain, x, n=LAYERS)
    print(f"FFN (+modulated LN epilogue)  : {t*1e3:8.2f} ms/layer  -> {t*LAYERS:6.3f} s/step")

    # 4) cross-attention full branch
    ca = bp0["cross_attn"]
    ctx_t = jax.random.normal(key, (B, 512, DIM), jnp.bfloat16)
    ctx_i = jax.random.normal(key, (B, 257, DIM), jnp.bfloat16)

    @jax.jit
    def cross_chain(x):
        def body(i, h):
            q = rms_norm(apply_linear(ca["q"], h), ca["norm_q"]["w"], 1e-6).astype(h.dtype).reshape(B, L, N, D)
            k = rms_norm(apply_linear(ca["k"], ctx_t), ca["norm_k"]["w"], 1e-6).astype(h.dtype).reshape(B, -1, N, D)
            v = apply_linear(ca["v"], ctx_t).reshape(B, -1, N, D)
            txt = attention(q, k, v)
            ki = rms_norm(apply_linear(ca["k_img"], ctx_i), ca["norm_k_img"]["w"], 1e-6).astype(h.dtype).reshape(B, -1, N, D)
            vi = apply_linear(ca["v_img"], ctx_i).reshape(B, -1, N, D)
            img = attention(q, ki, vi)
            return apply_linear(ca["o"], (txt + img).reshape(B, L, DIM))

        return jax.lax.fori_loop(0, LAYERS, body, x)

    t = measure(cross_chain, x, n=LAYERS)
    print(f"cross-attn (text+img)         : {t*1e3:8.2f} ms/layer  -> {t*LAYERS:6.3f} s/step")


if __name__ == "__main__":
    main()

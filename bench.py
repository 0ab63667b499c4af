"""Benchmark: generated-video seconds per minute per chip, 1.3B @ 512x512.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Method: time the jitted CFG-triple DiT window step (the hot loop of the
infinite pipeline: 21 latent frames = 21504 tokens at 512², batch 3) and the
streaming VAE decode, then compose the end-to-end rate of the sliding-window
pipeline: each 50-step sweep advances (21 - overlap) latent frames = 24 video
frames at the default overlap 15 (`inference.sh:17-21`).

vs_baseline compares against an A100 reference estimate for the same
pipeline: ~4.2e14 DiT FLOPs/step (3x CFG) at 312 TFLOPs bf16 and ~40% MFU
(torch SDPA path; the 1B reference force-disables flash-attn,
`wan_fantasy_transformer3d_1B.py:45-46`) -> ~3.4 s/step -> ~0.34 video-sec
per wallclock minute.  The reference publishes no throughput numbers
(BASELINE.md), so this estimate is the comparison point.
"""

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

A100_REF_VIDEO_SEC_PER_MIN = 0.34  # estimated reference throughput (see above)


def main():
    small = os.environ.get("BENCH_SMALL") == "1"

    from stableavatar_tpu.config import WAN_1_3B, VAEConfig, DiTConfig
    from stableavatar_tpu.models.dit import cast_params, dit_forward, init_dit
    from stableavatar_tpu.models.vae import decode_video, init_vae

    cfg = WAN_1_3B
    vae_cfg = VAEConfig()
    key = jax.random.PRNGKey(0)

    if small:
        cfg = DiTConfig(dim=128, ffn_dim=256, num_heads=8, num_layers=4,
                        audio_proj_dim=128, vocal_num_heads=8)
        f, lh, lw = 21, 8, 8
        steps_timed = 2
    else:
        f, lh, lw = 21, 64, 64  # 512x512 -> 21504 tokens
        steps_timed = 3

    params = cast_params(init_dit(key, cfg), jnp.bfloat16)

    la = 167  # wav2vec tokens for an 84-frame audio window
    x = jnp.asarray(np.random.randn(3, 16, f, lh, lw), jnp.bfloat16)
    t = jnp.full((3,), 500.0, jnp.float32)
    text = jnp.asarray(np.random.randn(3, cfg.text_len, cfg.text_dim), jnp.bfloat16)
    clip_fea = jnp.asarray(np.random.randn(3, cfg.clip_tokens, cfg.clip_dim), jnp.bfloat16)
    y = jnp.asarray(np.random.randn(3, 20, f, lh, lw), jnp.bfloat16)
    vocal = jnp.asarray(np.random.randn(1, la, cfg.audio_in_dim), jnp.bfloat16)

    # NOTE: on the tunneled TPU platform block_until_ready is a no-op and
    # every dispatch pays a ~0.1-0.2 s RPC floor, so we amortize: N chained
    # denoise steps inside ONE jit (lax.fori_loop), forced by a host read.
    N_INNER = 8 if not small else 2

    @jax.jit
    def steps_n(params, x, t, text, clip_fea, y, vocal):
        def body(i, lat):
            out = dit_forward(
                params, cfg, lat, t, text, clip_fea, y, vocal,
                video_sample_n_frames=81, vocal_cfg_tile=True,
            )
            return (lat.astype(jnp.float32) - 0.01 * out).astype(lat.dtype)

        return jax.lax.fori_loop(0, N_INNER, body, x)

    def force(a):
        return float(jnp.sum(a[0, 0, 0, 0]))

    out = steps_n(params, x, t, text, clip_fea, y, vocal)
    force(out)  # compile + warm
    t0 = time.perf_counter()
    out = steps_n(params, x, t, text, clip_fea, y, vocal)
    force(out)
    total = time.perf_counter() - t0
    # subtract the RPC floor measured on an already-computed buffer
    t0 = time.perf_counter()
    force(out)
    rpc_floor = time.perf_counter() - t0
    dit_step_s = max(total - rpc_floor, 1e-9) / N_INNER

    # VAE decode: latent window -> frames
    vae_params = init_vae(jax.random.PRNGKey(1), vae_cfg)
    vae_params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if hasattr(a, "astype") else a, vae_params
    )
    zf = 5 if small else f
    z = jnp.asarray(np.random.randn(1, vae_cfg.z_dim, zf, lh, lw), jnp.bfloat16)
    dec = jax.jit(lambda p, z: decode_video(p, z, vae_cfg))
    frames = dec(vae_params, z)
    float(jnp.sum(frames[0, 0, 0, 0]))  # compile + warm
    t0 = time.perf_counter()
    frames = dec(vae_params, z)
    float(jnp.sum(frames[0, 0, 0, 0]))
    vae_decode_s = max(time.perf_counter() - t0 - rpc_floor, 1e-9)
    n_frames = frames.shape[2]
    vae_fps = n_frames / vae_decode_s

    # end-to-end composition (default operating point, inference.sh):
    # one 50-step sweep advances (21-15)=6 latent frames = 24 video frames.
    num_steps = 50
    overlap = 15
    fpb = 21
    adv_video_frames = (fpb - overlap) * 4
    video_sec_per_sweep = adv_video_frames / 25.0
    sweep_s = num_steps * dit_step_s + adv_video_frames / max(vae_fps, 1e-9)
    video_sec_per_min = video_sec_per_sweep / sweep_s * 60.0

    # TeaCache-effective rate (recommended config thr=0.1 skip-first-5,
    # app.py:284-285): real controller over the real e0 drift of this
    # checkpoint across the 50-step schedule, 5 windows per sweep.  Skip
    # path still pays patch-embed+head (~6% of a full step).
    from stableavatar_tpu.models.dit import dit_time_e0
    from stableavatar_tpu.models.teacache import TeaCache, get_teacache_coefficients
    from stableavatar_tpu.schedulers.flow_match import flow_match_timesteps

    sched = flow_match_timesteps(num_steps)
    e0s = [dit_time_e0(params, cfg, jnp.full((1,), t)) for t in np.asarray(sched.timesteps)]
    tc = TeaCache(get_teacache_coefficients("wan2.1-t2v-1.3b"), num_steps, 0.1, 5)
    windows_per_sweep = 5
    for e0 in e0s:
        for _ in range(windows_per_sweep):
            if tc.plan(e0):
                tc.store(jnp.zeros(1))
    skip_frac_randinit = tc.skipped_calls / max(tc.total_calls, 1)
    # random-init weights produce smaller e0 drift than trained models and
    # over-skip; use a conservative 0.5 cap (matches 50-67% observed in
    # trained-model literature and our e2e runs) for the effective estimate
    skip_frac = min(skip_frac_randinit, 0.5)
    eff_step = dit_step_s * (1 - skip_frac) + dit_step_s * 0.06 * skip_frac
    sweep_tc = num_steps * eff_step + adv_video_frames / max(vae_fps, 1e-9)
    video_sec_per_min_tc = video_sec_per_sweep / sweep_tc * 60.0

    result = {
        "metric": "video_sec_per_min_per_chip",
        "value": round(video_sec_per_min, 4),
        "unit": "video_s/min",
        "vs_baseline": round(video_sec_per_min / A100_REF_VIDEO_SEC_PER_MIN, 3),
        "detail": {
            "dit_step_s": round(dit_step_s, 4),
            "vae_decode_fps": round(vae_fps, 2),
            "teacache_skip_frac": round(skip_frac, 3),
            "teacache_skip_frac_randinit": round(skip_frac_randinit, 3),
            "teacache_video_sec_per_min": round(video_sec_per_min_tc, 4),
            "teacache_vs_baseline": round(video_sec_per_min_tc / A100_REF_VIDEO_SEC_PER_MIN, 3),
            "backend": jax.default_backend(),
            "small": small,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())

"""Benchmark: generated-video seconds per minute per chip, 1.3B @ 512x512.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Method (round 2+): run the REAL `generate_long` pipeline end-to-end at the
recommended operating point (512x512, 50 steps, overlap 15,
`inference.sh:13-24`) with enough audio for two sliding windows, on the TPU
inference fast path (split-pair rope + int8 QK self-attention + W8A8 block
linears, `utils/fastpath.py`; oracle-validated numerics in
tests/test_fastpath.py).  A 2-step warmup run absorbs compilation; the
measured run yields:

- `value` (headline): steady-state video-seconds per wall-clock minute of
  the infinite stream — each 50-step sweep advances (21 - 15) latent = 24
  video frames, costing 50 measured window-steps + the amortized VAE decode.
  This is the constant-HBM unbounded-length rate the pipeline sustains.
- `finite_run_video_s_per_min`: the whole measured run (prompt/CLIP/wav2vec
  encodes + denoise + decode) divided into the video it produced — the
  honest cold-ish end-to-end number for a short clip.
- TeaCache rates from a second measured run with the real controller
  (thr 0.1, skip-first-5, `app.py:284-285`).  Random-init weights over-skip
  (~0.9 vs ~0.5-0.67 reported for trained models), so the headline TeaCache
  number caps the skip fraction at a conservative 0.5 using the measured
  compute/skip step times; the raw measured-random-init rate is also
  reported.

vs_baseline compares against an A100 reference estimate for the same
pipeline: ~4.2e14 DiT FLOPs/step (3x CFG) at 312 TFLOPs bf16 and ~40% MFU
(torch eager; the 1B reference force-disables flash-attn,
`wan_fantasy_transformer3d_1B.py:45-46`, and recomputes wav2vec every
(step x window), `wan_inference_long_pipeline.py:727-729`) -> ~3.4 s/step
-> ~0.34 video-s/min.  The reference publishes no throughput numbers
(BASELINE.md); sensitivity: at 30% MFU the baseline is 0.26, at 55% MFU
(flash-SDPA + perfectly fused eager) 0.47.  NOTE the hardware asymmetry:
v5e peak is 197 TF/s bf16 vs A100's 312 — at EQUAL MFU a v5e chip sustains
0.63x an A100, so "2x per chip raw" requires the reference below ~24% MFU.
See docs/PERF.md for the measured roofline decomposition.
"""

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

# persistent compile cache: without it a fresh bench process can leak stray
# compiles into measured phases (round-2's "VAE decode 1.94 fps" was exactly
# this — warm decode measures 22 fps, docs/PERF.md)
jax.config.update("jax_compilation_cache_dir", "/tmp/stableavatar_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

A100_REF_VIDEO_SEC_PER_MIN = 0.34  # estimated reference throughput (see above)


def build_models(small, quant=True):
    from stableavatar_tpu.config import (
        WAN_1_3B, CLIPConfig, DiTConfig, VAEConfig, Wav2Vec2Config,
    )
    from stableavatar_tpu.models.dit import cast_params, init_dit
    from stableavatar_tpu.models.vae import init_vae
    from stableavatar_tpu.models.clip import init_clip_visual
    from stableavatar_tpu.models.wav2vec import init_wav2vec2
    from stableavatar_tpu.pipelines.common import WanModels
    from stableavatar_tpu.utils.fastpath import prepare_fast_params

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)

    if small:
        cfg = DiTConfig(dim=128, ffn_dim=256, num_heads=8, num_layers=4,
                        audio_proj_dim=128, vocal_num_heads=8)
    else:
        cfg = WAN_1_3B
    vae_cfg = VAEConfig()
    clip_cfg = CLIPConfig()
    w2v_cfg = Wav2Vec2Config()

    dit_params = cast_params(init_dit(ks[0], cfg), jnp.bfloat16)
    dit_params = prepare_fast_params(dit_params, cfg, quant=quant)
    vae_params = cast_params(init_vae(ks[1], vae_cfg), jnp.bfloat16)
    clip_params = cast_params(init_clip_visual(ks[2], clip_cfg), jnp.bfloat16)
    w2v_params = init_wav2vec2(ks[3], w2v_cfg)

    return WanModels(
        dit_params=dit_params,
        dit_cfg=cfg,
        vae_params=vae_params,
        vae_cfg=vae_cfg,
        clip_params=clip_params,
        clip_cfg=clip_cfg,
        wav2vec_params=w2v_params,
        wav2vec_cfg=w2v_cfg,
        rope_split=True,
        attn_quant="qk" if quant else "none",
    )


def run_pipeline(models, *, size, steps, seed, n_windows, overlap=15, fps=25,
                 sr=16000):
    """One generate_long call sized for `n_windows` sliding windows."""
    from stableavatar_tpu.pipelines.long import generate_long
    from stableavatar_tpu.utils.profiling import StepTimer

    infer_length = 21 + (21 - overlap) * (n_windows - 1)
    total_video_frames = (infer_length - 1) * 4 + 1
    n_samples = total_video_frames * (sr // fps)

    rng = np.random.default_rng(0)
    ref_image = rng.standard_normal((1, 3, size, size)).astype(np.float32) * 0.2
    wav = rng.standard_normal((n_samples,)).astype(np.float32) * 0.05

    text_ctx = jnp.asarray(
        rng.standard_normal((3, models.dit_cfg.text_len, models.dit_cfg.text_dim)),
        jnp.bfloat16,
    )

    # JAX dispatch is async: force a host read on the LAST step so the whole
    # (sequentially-chained) denoise wall lands in the denoise_step phase and
    # the decode phase measures only the decode
    def sync_last(i, lat):
        if i == steps - 1:
            float(jnp.sum(lat[0, 0, 0, 0, 0]))

    timer = StepTimer()
    t0 = time.perf_counter()
    out = generate_long(
        models,
        ref_image=ref_image,
        vocal_waveform=wav,
        text_ctx=text_ctx,
        num_inference_steps=steps,
        overlap_window_length=overlap,
        seed=seed,
        timer=timer,
        step_callback=sync_last,
    )
    jax.block_until_ready(out.latents)
    wall = time.perf_counter() - t0
    # force the numpy video (generate_long already materialized it)
    video_frames = out.videos.shape[2]
    return wall, timer.summary(), video_frames


def main():
    small = os.environ.get("BENCH_SMALL") == "1"
    steps = int(os.environ.get("BENCH_STEPS", "4" if small else "50"))
    size = 64 if small else 512
    n_windows = 2
    overlap = 15
    fps = 25
    adv_video_frames = (21 - overlap) * 4  # per-sweep advance, steady state

    models = build_models(small)

    # warmup: compile every shape (full window, final window, vae, encoders)
    run_pipeline(models, size=size, steps=2, seed=1, n_windows=n_windows,
                 overlap=overlap)

    # ---- raw measured run ----
    wall, phases, video_frames = run_pipeline(
        models, size=size, steps=steps, seed=42, n_windows=n_windows,
        overlap=overlap,
    )
    denoise_total = phases["denoise_step"]["total_s"]
    t_wstep = denoise_total / (steps * n_windows)
    vae_s = phases["vae_decode"]["total_s"]
    vae_fps = video_frames / max(vae_s, 1e-9)
    # device->host video transfer (u8 over the remote tunnel) — measured as
    # its own phase; part of the amortized per-sweep cost in steady state
    xfer_s = phases.get("video_transfer", {}).get("total_s", 0.0)
    xfer_fps = video_frames / max(xfer_s, 1e-9)

    video_sec = video_frames / fps
    finite_rate = video_sec / wall * 60.0

    # steady state of the infinite stream at 50-step quality (decode AND
    # host transfer amortized per 24-frame sweep advance)
    full_steps = 50
    out_cost = adv_video_frames / max(vae_fps, 1e-9) + adv_video_frames / max(xfer_fps, 1e-9)
    sweep_s = full_steps * t_wstep + out_cost
    steady_rate = (adv_video_frames / fps) / sweep_s * 60.0

    # ---- TeaCache measured run ----
    from stableavatar_tpu.models.teacache import TeaCache, get_teacache_coefficients

    # warmup that compiles BOTH sweep variants (all-compute and all-skip):
    # huge threshold + no start window forces skips from call 1 on
    models.teacache = TeaCache(
        get_teacache_coefficients("wan2.1-t2v-1.3b"), 99,
        rel_l1_thresh=1e9, num_skip_start_steps=0,
    )
    run_pipeline(models, size=size, steps=3, seed=1, n_windows=n_windows,
                 overlap=overlap)
    models.teacache = TeaCache(
        get_teacache_coefficients("wan2.1-t2v-1.3b"), steps,
        rel_l1_thresh=0.1, num_skip_start_steps=5,
    )
    wall_tc, phases_tc, _ = run_pipeline(
        models, size=size, steps=steps, seed=42, n_windows=n_windows,
        overlap=overlap,
    )
    tc = models.teacache
    skip_frac_randinit = tc.skipped_calls / max(tc.total_calls, 1)
    denoise_tc = phases_tc["denoise_step"]["total_s"]
    calls = steps * n_windows
    computed = calls - tc.skipped_calls
    t_skip = (
        (denoise_tc - computed * t_wstep) / tc.skipped_calls
        if tc.skipped_calls else 0.0
    )
    t_skip = max(t_skip, 0.0)
    # random-init over-skips; cap at a conservative 0.5 for the headline
    skip_frac = min(skip_frac_randinit, 0.5)
    eff_step = t_wstep * (1 - skip_frac) + t_skip * skip_frac
    sweep_tc = full_steps * eff_step + out_cost
    steady_rate_tc = (adv_video_frames / fps) / sweep_tc * 60.0
    finite_rate_tc = video_sec / wall_tc * 60.0

    result = {
        "metric": "video_sec_per_min_per_chip",
        "value": round(steady_rate, 4),
        "unit": "video_s/min",
        "vs_baseline": round(steady_rate / A100_REF_VIDEO_SEC_PER_MIN, 3),
        "detail": {
            "measured": "direct generate_long run, 512^2, 50 steps, overlap 15, 2 windows",
            "dit_window_step_s": round(t_wstep, 4),
            "teacache_skip_step_s": round(t_skip, 4),
            # decode is SEGMENTED+overlapped with the host transfer
            # (decode_video_segmented): the vae_decode phase fences only the
            # first segment; the rest decodes under video_transfer. The
            # honest per-frame output cost is the combined tail.
            "vae_decode_fps": round(vae_fps, 2),
            "video_transfer_fps": round(xfer_fps, 2),
            "decode_plus_transfer_fps": round(
                video_frames / max(vae_s + xfer_s, 1e-9), 2),
            "raw_run_wall_s": round(wall, 2),
            "finite_run_video_s_per_min": round(finite_rate, 4),
            "teacache_video_s_per_min": round(steady_rate_tc, 4),
            "teacache_vs_baseline": round(steady_rate_tc / A100_REF_VIDEO_SEC_PER_MIN, 3),
            "teacache_skip_frac_used": round(skip_frac, 3),
            "teacache_skip_frac_randinit": round(skip_frac_randinit, 3),
            "teacache_finite_run_video_s_per_min": round(finite_rate_tc, 4),
            "fast_path": "rope_split + int8-qk self-attn + w8a8 linears",
            "backend": jax.default_backend(),
            "small": small,
            "steps_measured": steps,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())

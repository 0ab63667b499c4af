"""Single-clip (81-frame) generation pipeline — validation-style.

Mirrors `WanI2VFantasyPipeline.__call__`
(`wan_inference_pipeline_fantasy.py:478-741`): one 81-frame clip, CFG text
triple [neg, pos, pos], audio handled by the DiT's internal [0, v, v] tiling,
and the swapped-scale dual-CFG combine (`:707-708`).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from stableavatar_tpu.models.dit import dit_forward, dit_forward_skip, dit_time_e0
from stableavatar_tpu.models.vae import decode_video_segmented
from stableavatar_tpu.pipelines.common import (
    WanModels,
    encode_prompt_ids,
    extract_vocal_features,
    guidance_combine_single,
    prepare_conditioning,
)
from stableavatar_tpu.schedulers.flow_match import flow_match_timesteps


@partial(
    jax.jit,
    static_argnames=(
        "dit_cfg", "clip_length", "text_scale", "audio_scale", "rope_split",
        "attn_quant", "attn_impl", "honor_vocal_k_lens",
    ),
    donate_argnums=(1,),
)
def _clip_step(
    params,
    latents,
    y,
    text_ctx,
    clip_ctx,
    vocal_emb,
    t,
    sigma,
    sigma_next,
    dit_cfg,
    clip_length: int,
    text_scale: float,
    audio_scale: float,
    rope_split: bool = False,
    attn_quant: str = "none",
    attn_impl: str = "ulysses",
    honor_vocal_k_lens: bool = True,
):
    lat3 = jnp.concatenate([latents] * 3, axis=0).astype(jnp.bfloat16)
    tb = jnp.full((3,), t, dtype=jnp.float32)
    noise_pred = dit_forward(
        params, dit_cfg, lat3, tb, text_ctx, clip_ctx, y, vocal_emb,
        video_sample_n_frames=clip_length, vocal_cfg_tile=True,
        rope_split=rope_split, attn_quant=attn_quant, attn_impl=attn_impl,
        honor_vocal_k_lens=honor_vocal_k_lens,
    )
    noise_pred = guidance_combine_single(noise_pred, text_scale, audio_scale)
    new_lat = latents.astype(jnp.float32) + (sigma_next - sigma) * noise_pred
    return new_lat.astype(jnp.bfloat16)


@partial(
    jax.jit,
    static_argnames=(
        "dit_cfg", "clip_length", "text_scale", "audio_scale", "rope_split",
        "attn_quant", "attn_impl", "honor_vocal_k_lens",
    ),
)
def _clip_velocity(
    params, latents, y, text_ctx, clip_ctx, vocal_emb, t, dit_cfg,
    clip_length: int, text_scale: float, audio_scale: float,
    rope_split: bool = False, attn_quant: str = "none",
    attn_impl: str = "ulysses",
    honor_vocal_k_lens: bool = True,
):
    """CFG-combined velocity only (for the multistep solvers)."""
    lat3 = jnp.concatenate([latents] * 3, axis=0).astype(jnp.bfloat16)
    tb = jnp.full((3,), t, dtype=jnp.float32)
    noise_pred = dit_forward(
        params, dit_cfg, lat3, tb, text_ctx, clip_ctx, y, vocal_emb,
        video_sample_n_frames=clip_length, vocal_cfg_tile=True,
        rope_split=rope_split, attn_quant=attn_quant, attn_impl=attn_impl,
        honor_vocal_k_lens=honor_vocal_k_lens,
    )
    return guidance_combine_single(noise_pred, text_scale, audio_scale)


@partial(
    jax.jit,
    static_argnames=(
        "dit_cfg", "clip_length", "text_scale", "audio_scale", "rope_split",
        "attn_quant", "attn_impl", "honor_vocal_k_lens", "compute",
    ),
)
def _clip_velocity_tc(
    params, latents, y, text_ctx, clip_ctx, vocal_emb, residual, t, dit_cfg,
    clip_length: int, text_scale: float, audio_scale: float,
    rope_split: bool = False, attn_quant: str = "none",
    attn_impl: str = "ulysses",
    honor_vocal_k_lens: bool = True,
    compute: bool = True,
):
    """TeaCache-aware CFG velocity: compute captures the block-stack
    residual; skip replays it (dit_forward_skip).  Returns (v, residual)."""
    lat3 = jnp.concatenate([latents] * 3, axis=0).astype(jnp.bfloat16)
    tb = jnp.full((3,), t, dtype=jnp.float32)
    if compute:
        noise_pred, residual = dit_forward(
            params, dit_cfg, lat3, tb, text_ctx, clip_ctx, y, vocal_emb,
            video_sample_n_frames=clip_length, vocal_cfg_tile=True,
            return_residual=True, rope_split=rope_split,
            attn_quant=attn_quant, attn_impl=attn_impl,
            honor_vocal_k_lens=honor_vocal_k_lens,
        )
    else:
        noise_pred = dit_forward_skip(params, dit_cfg, lat3, tb, y, residual)
    return guidance_combine_single(noise_pred, text_scale, audio_scale), residual


@dataclasses.dataclass
class SingleClipOutput:
    videos: Optional[np.ndarray]
    latents: Optional[jnp.ndarray] = None


def generate_single_clip(
    models: WanModels,
    *,
    ref_image,  # [1, 3, H, W] in [-1, 1]
    vocal_waveform,  # [S] raw 16 kHz samples
    prompt_ids=None,  # ([L], [L]) tokenized positive prompt
    negative_prompt_ids=None,
    text_ctx: Optional[jnp.ndarray] = None,  # [3, text_len, text_dim] override
    num_inference_steps: int = 50,
    prompt_cfg_scale: float = 3.0,
    audio_cfg_scale: float = 5.0,
    clip_length: int = 81,
    seed: int = 42,
    shift: float = 5.0,
    scheduler: str = "euler",  # "euler" | "dpm++" | "unipc"
    solver_order: int = 2,
    solver_type: Optional[str] = None,  # dpm++: midpoint|heun; unipc: bh1|bh2
    output_type: str = "numpy",
    initial_latents=None,  # [1, 16, Tl, h, w] noise override (parity harness)
    step_callback=None,  # called (step_index, post-step latents f32) per step
) -> SingleClipOutput:
    ref_image = jnp.asarray(ref_image, dtype=jnp.float32)
    h_img, w_img = ref_image.shape[-2:]
    tl = (clip_length - 1) // models.vae_cfg.temporal_compression_ratio + 1

    sched = flow_match_timesteps(num_inference_steps, shift=shift)

    lh = h_img // models.vae_cfg.spatial_compression_ratio
    lw = w_img // models.vae_cfg.spatial_compression_ratio
    if initial_latents is not None:
        latents = jnp.asarray(initial_latents, jnp.float32).astype(jnp.bfloat16)
    else:
        key = jax.random.PRNGKey(seed)
        latents = jax.random.normal(
            key, (1, models.vae_cfg.z_dim, tl, lh, lw), dtype=jnp.float32
        ).astype(jnp.bfloat16)

    if text_ctx is None:
        # CFG triple [neg, pos, pos] (wan_inference_pipeline_fantasy.py:565)
        ids_p, mask_p = prompt_ids
        ids_n, mask_n = negative_prompt_ids
        ids = jnp.asarray(np.stack([ids_n, ids_p, ids_p]))
        mask = jnp.asarray(np.stack([mask_n, mask_p, mask_p]))
        text_ctx = encode_prompt_ids(models, ids, mask)

    clip_ctx, y = prepare_conditioning(models, ref_image, clip_length, cfg_batch=3)
    vocal_emb = extract_vocal_features(models, np.asarray(vocal_waveform, np.float32))

    # TeaCache (transformer-level, scheduler-agnostic): precompute the
    # deterministic skip plan over the steps (pipelines/long.py's plan with
    # one "window" per step)
    teacache = getattr(models, "teacache", None)
    tc_plan = residual = None
    if teacache is not None:
        from stableavatar_tpu.pipelines.long import precompute_teacache_plan

        teacache.reset()
        e0_all = dit_time_e0(
            models.dit_params, models.dit_cfg,
            jnp.asarray(np.asarray(sched.timesteps), jnp.float32),
        )
        tc_plan = precompute_teacache_plan(
            teacache, [e0_all[i : i + 1] for i in range(sched.num_steps)], 1
        )
        l_tokens = tl * (lh // 2) * (lw // 2)
        residual = jnp.zeros((3, l_tokens, models.dit_cfg.dim), jnp.bfloat16)

    common_tc = dict(
        rope_split=models.rope_split, attn_quant=models.attn_quant,
        attn_impl=models.attn_impl,
        honor_vocal_k_lens=models.honor_vocal_k_lens,
    )

    if scheduler == "euler":
        for i in range(sched.num_steps):
            if tc_plan is not None:
                v, residual = _clip_velocity_tc(
                    models.dit_params, latents, y, text_ctx, clip_ctx,
                    vocal_emb, residual, sched.timesteps[i], models.dit_cfg,
                    clip_length, float(prompt_cfg_scale),
                    float(audio_cfg_scale), compute=tc_plan[i][0],
                    **common_tc,
                )
                latents = (
                    latents.astype(jnp.float32)
                    + (sched.sigmas[i + 1] - sched.sigmas[i]) * v
                ).astype(jnp.bfloat16)
            else:
                latents = _clip_step(
                    models.dit_params,
                    latents,
                    y,
                    text_ctx,
                    clip_ctx,
                    vocal_emb,
                    sched.timesteps[i],
                    sched.sigmas[i],
                    sched.sigmas[i + 1],
                    models.dit_cfg,
                    clip_length,
                    float(prompt_cfg_scale),
                    float(audio_cfg_scale),
                    rope_split=models.rope_split,
                    attn_quant=models.attn_quant,
                    attn_impl=models.attn_impl,
                    honor_vocal_k_lens=models.honor_vocal_k_lens,
                )
            if step_callback is not None:
                step_callback(i, np.asarray(latents, np.float32))
    else:
        # multistep solvers (FlowDPM++ / FlowUniPC — reference fm_solvers)
        from stableavatar_tpu.schedulers.fm_solvers import (
            FlowDPMSolverMultistep,
            FlowUniPCMultistep,
            MultistepState,
        )

        solver_cls = {"dpm++": FlowDPMSolverMultistep, "unipc": FlowUniPCMultistep}[scheduler]
        kw = {"solver_type": solver_type} if solver_type else {}
        solver = solver_cls(num_inference_steps, shift=shift,
                            order=solver_order, **kw)
        state = MultistepState()
        for i in range(solver.sched.num_steps):
            if tc_plan is not None:
                v, residual = _clip_velocity_tc(
                    models.dit_params, latents, y, text_ctx, clip_ctx,
                    vocal_emb, residual, solver.timesteps[i], models.dit_cfg,
                    clip_length, float(prompt_cfg_scale),
                    float(audio_cfg_scale), compute=tc_plan[i][0],
                    **common_tc,
                )
            else:
                v = _clip_velocity(
                    models.dit_params, latents, y, text_ctx, clip_ctx, vocal_emb,
                    solver.timesteps[i], models.dit_cfg, clip_length,
                    float(prompt_cfg_scale), float(audio_cfg_scale),
                    rope_split=models.rope_split, attn_quant=models.attn_quant,
                    attn_impl=models.attn_impl,
                    honor_vocal_k_lens=models.honor_vocal_k_lens,
                )
            lat_f, state = solver.step(v, i, latents, state)
            latents = lat_f.astype(jnp.bfloat16)
            if step_callback is not None:
                step_callback(i, np.asarray(latents, np.float32))

    lat_f32 = latents.astype(jnp.float32)
    if output_type == "latent":
        return SingleClipOutput(videos=None, latents=lat_f32)
    # segmented jitted decode with on-device uint8 + decode/transfer overlap
    # (models/vae.py:decode_video_segmented — same path as generate_long)
    segs_u8 = decode_video_segmented(
        models.vae_params, latents.astype(jnp.bfloat16), models.vae_cfg,
        out_uint8=True,
    )
    latents = lat_f32
    video = np.concatenate(
        [np.asarray(s) for s in segs_u8], axis=2
    ).astype(np.float32) / 255.0
    return SingleClipOutput(videos=video, latents=latents)

"""Infinite-length sliding-window generation pipeline — the flagship.

Re-designs `WanI2VTalkingInferenceLongPipeline.__call__`
(`wan_inference_long_pipeline.py:540-806`) TPU-first:

- the per-(timestep x window) wav2vec recompute of the reference
  (`:727-729`) is hoisted: audio features are extracted ONCE per window and
  reused across all sampling steps — identical math, ~50x fewer wav2vec
  evaluations at 50 steps;
- the window denoise (CFG triple -> DiT -> dual-CFG combine -> Euler step)
  is one jitted function; all windows but the last share one compilation;
- overlap cross-fade ramps (uniform / log, `:756-770`) are precomputed
  constants; window writes are `dynamic_update_slice`s on device;
- only latent-space buffers of the full duration live in HBM (16ch, /8
  spatial, /4 temporal — ~50 MB/min at 512²), the DiT only ever sees one
  window: constant activation memory for unbounded length.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from stableavatar_tpu.models.dit import dit_forward, dit_forward_skip, dit_time_e0
from stableavatar_tpu.models.vae import decode_video_segmented
from stableavatar_tpu.pipelines.common import (
    WanModels,
    encode_prompts,
    extract_vocal_features,
    guidance_combine_long,
    prepare_conditioning,
)
from stableavatar_tpu.schedulers.flow_match import flow_match_timesteps


def overlap_weights(n: int, scheme: str = "uniform") -> np.ndarray:
    """Cross-fade ramp over the overlap region (`:756-770`): 0 -> 1 weights
    for the NEW window (previous window gets 1-w)."""
    if scheme == "uniform":
        w = np.arange(n, dtype=np.float32) / max(n - 1, 1)
    elif scheme == "log":
        init = np.linspace(0.0, 1.0, n, dtype=np.float32)
        init = np.log1p(init * (np.e - 1.0))
        w = (init - init.min()) / (init.max() - init.min())
    else:
        raise ValueError(f"unknown overlapping_weight_scheme {scheme}")
    return w


def plan_windows(infer_length: int, frames_per_batch: int, overlap: int) -> List[Tuple[int, int]]:
    """Static window schedule [(start, end)).

    Matches the reference inner-loop bounds (`:710-789`) except for the final
    window: the reference lets it shrink to `infer_length - index_start`
    frames, which breaks the per-latent-frame vocal attention whenever the
    token count is not divisible by 21 (a latent crash in
    `wan_fantasy_transformer3d_1B.py:575-585` for most audio durations).  We
    instead shift the final window's start back so every window is full-size
    — one compiled shape, larger final overlap, no crash, identical coverage.
    """
    if frames_per_batch >= infer_length:
        return [(0, infer_length)]
    if overlap >= frames_per_batch:
        # the reference would also never terminate here (index_start advances
        # by frames_per_batch - overlap <= 0, `:784`); fail loudly instead
        raise ValueError(
            f"overlap_window_length ({overlap}) must be smaller than the "
            f"latent window ({frames_per_batch} frames)"
        )
    windows = []
    index_start = 0
    while True:
        if index_start + frames_per_batch >= infer_length:
            windows.append((infer_length - frames_per_batch, infer_length))
            break
        windows.append((index_start, index_start + frames_per_batch))
        index_start = index_start + (frames_per_batch - overlap)
    return windows


def plan_audio_slices(
    windows, infer_length: int, samples_per_frame: int, total_samples: int
) -> List[np.ndarray]:
    """Per-window raw-sample indices (`:716-723`).

    Non-final windows take `(e-s)*4` video frames' worth of samples with
    modular wrap; the FINAL window (`index_end == infer_length`) is truncated
    at the end of the audio track (`range(start, max_audio_index)`,
    `wan_inference_long_pipeline.py:718-719`) — a shorter slice, no wrap —
    which shifts its wav2vec feature length and hence the vocal projector's
    per-frame window split.  Verified step-for-step against the reference
    pipeline in tests/test_pipeline_parity.py."""
    out = []
    for s, e in windows:
        start = s * 4 * samples_per_frame
        if e == infer_length:
            idx = np.arange(start, max(total_samples, start + 1))
        else:
            n = (e - s) * 4 * samples_per_frame
            idx = np.arange(start, start + n)
        out.append(np.mod(idx, total_samples))
    return out


@partial(
    jax.jit,
    static_argnames=(
        "dit_cfg", "windows", "overlap", "text_scale", "audio_scale",
        "rope_split", "attn_quant", "attn_impl", "blend", "temporal_ratio",
        "vocal_lens", "honor_vocal_k_lens",
    ),
    donate_argnums=(1,),
)
def _sweep_step(
    params,
    latents_all,  # [1, 16, infer_length, lh, lw]
    y_full,  # [3, 20, fpb, lh, lw]
    text_ctx,
    clip_ctx,
    vocal_embs,  # [W, 1, La_max, 768] stacked (zero-padded) per-window features
    t,
    sigma,
    sigma_next,
    ramp,  # [1, 1, overlap, 1, 1] or None-shaped placeholder when blend=False
    dit_cfg,
    windows,  # static tuple of (start, end)
    overlap: int,
    text_scale: float,
    audio_scale: float,
    rope_split: bool,
    attn_quant: str,
    attn_impl: str,
    blend: bool,
    temporal_ratio: int,
    vocal_lens,  # static tuple: true (pre-pad) feature length per window
    honor_vocal_k_lens: bool = True,
):
    """One full flow-matching step across ALL sliding windows in a single
    jitted program — one device dispatch per step (a per-window Python
    loop pays a dispatch round-trip per window on remote/tunneled hosts and
    non-trivial host latency everywhere).  TeaCache runs use
    `_sweep_step_tc` with a precomputed static skip schedule."""
    pred = jnp.zeros_like(latents_all)
    tb = jnp.full((3,), t, dtype=jnp.float32)
    prev_end = None
    for wi, (s, e) in enumerate(windows):
        f = e - s
        clip_len_w = (f - 1) * temporal_ratio + 1
        lat_win = jax.lax.dynamic_slice_in_dim(latents_all, s, f, axis=2)
        lat3 = jnp.concatenate([lat_win] * 3, axis=0).astype(jnp.bfloat16)
        # static-prefix slice back to the true feature length: the final
        # window's audio is truncated at the track end (shorter features),
        # and the vocal projector's window plan is a function of that length
        noise_pred = dit_forward(
            params, dit_cfg, lat3, tb, text_ctx, clip_ctx, y_full[:, :, :f],
            vocal_embs[wi][:, : vocal_lens[wi]], video_sample_n_frames=clip_len_w,
            vocal_cfg_tile=True, rope_split=rope_split, attn_quant=attn_quant,
            attn_impl=attn_impl, honor_vocal_k_lens=honor_vocal_k_lens,
        )
        noise_pred = guidance_combine_long(noise_pred, text_scale, audio_scale)
        new_lat = (
            lat_win.astype(jnp.float32) + (sigma_next - sigma) * noise_pred
        ).astype(jnp.bfloat16)
        if s != 0 and blend:
            prev_tail = jax.lax.dynamic_slice_in_dim(
                pred, prev_end - overlap, overlap, axis=2
            )
            head = new_lat[:, :, :overlap]
            blended = head * ramp.astype(head.dtype) + prev_tail * (
                1 - ramp
            ).astype(head.dtype)
            new_lat = jnp.concatenate([blended, new_lat[:, :, overlap:]], axis=2)
        pred = jax.lax.dynamic_update_slice_in_dim(pred, new_lat, s, axis=2)
        prev_end = e
    return pred


@partial(
    jax.jit,
    static_argnames=(
        "dit_cfg", "windows", "overlap", "text_scale", "audio_scale",
        "rope_split", "attn_quant", "attn_impl", "blend", "temporal_ratio",
        "compute_flags", "vocal_lens", "honor_vocal_k_lens",
    ),
    donate_argnums=(1,),
)
def _sweep_step_tc(
    params,
    latents_all,
    y_full,
    text_ctx,
    clip_ctx,
    vocal_embs,
    residual,  # [3, L_tokens, dim] carried TeaCache residual (zeros if none)
    t,
    sigma,
    sigma_next,
    ramp,
    dit_cfg,
    windows,
    overlap: int,
    text_scale: float,
    audio_scale: float,
    rope_split: bool,
    attn_quant: str,
    attn_impl: str,
    blend: bool,
    temporal_ratio: int,
    compute_flags,  # static tuple[bool] per window: True=compute, False=skip
    vocal_lens,  # static tuple: true (pre-pad) feature length per window
    honor_vocal_k_lens: bool = True,
):
    """TeaCache-aware single-dispatch sweep: the skip schedule is
    deterministic in e0(t) (`models/teacache.py`), so the pipeline
    precomputes every (step, window) decision up front and compiles one
    program per distinct per-step flag pattern (2-4 patterns in practice).
    Returns (new latents, updated residual carry)."""
    pred = jnp.zeros_like(latents_all)
    tb = jnp.full((3,), t, dtype=jnp.float32)
    prev_end = None
    for wi, (s, e) in enumerate(windows):
        f = e - s
        clip_len_w = (f - 1) * temporal_ratio + 1
        lat_win = jax.lax.dynamic_slice_in_dim(latents_all, s, f, axis=2)
        lat3 = jnp.concatenate([lat_win] * 3, axis=0).astype(jnp.bfloat16)
        if compute_flags[wi]:
            noise_pred, residual = dit_forward(
                params, dit_cfg, lat3, tb, text_ctx, clip_ctx,
                y_full[:, :, :f], vocal_embs[wi][:, : vocal_lens[wi]],
                video_sample_n_frames=clip_len_w, vocal_cfg_tile=True,
                return_residual=True, rope_split=rope_split,
                attn_quant=attn_quant, attn_impl=attn_impl,
                honor_vocal_k_lens=honor_vocal_k_lens,
            )
        else:
            noise_pred = dit_forward_skip(
                params, dit_cfg, lat3, tb, y_full[:, :, :f], residual
            )
        noise_pred = guidance_combine_long(noise_pred, text_scale, audio_scale)
        new_lat = (
            lat_win.astype(jnp.float32) + (sigma_next - sigma) * noise_pred
        ).astype(jnp.bfloat16)
        if s != 0 and blend:
            prev_tail = jax.lax.dynamic_slice_in_dim(
                pred, prev_end - overlap, overlap, axis=2
            )
            head = new_lat[:, :, :overlap]
            blended = head * ramp.astype(head.dtype) + prev_tail * (
                1 - ramp
            ).astype(head.dtype)
            new_lat = jnp.concatenate([blended, new_lat[:, :, overlap:]], axis=2)
        pred = jax.lax.dynamic_update_slice_in_dim(pred, new_lat, s, axis=2)
        prev_end = e
    return pred, residual


@partial(
    jax.jit,
    static_argnames=(
        "dit_cfg", "windows", "overlap", "text_scale", "audio_scale",
        "rope_split", "attn_quant", "attn_impl", "blend", "temporal_ratio",
        "vocal_lens", "honor_vocal_k_lens", "solver", "compute_flags",
    ),
    donate_argnums=(1, 2),
)
def _sweep_step_ms(
    params,
    latents_all,
    ms_state,  # dict of [W, 1, C, f, lh, lw] stacked per-window histories
    coeffs,  # dict of per-step scalar coefficients (shared by every window)
    y_full,
    text_ctx,
    clip_ctx,
    vocal_embs,
    residual,  # [3, L_tokens, dim] TeaCache residual carry (zeros if unused)
    t,
    sigma,
    ramp,
    dit_cfg,
    windows,
    overlap: int,
    text_scale: float,
    audio_scale: float,
    rope_split: bool,
    attn_quant: str,
    attn_impl: str,
    blend: bool,
    temporal_ratio: int,
    vocal_lens,
    honor_vocal_k_lens: bool,
    solver: str,  # "dpm" | "unipc"
    compute_flags=None,  # static tuple[bool] per window (TeaCache), or None
):
    """Single-dispatch MULTISTEP sweep (DPM++(2M) / UniPC-2).

    The reference can inject any scheduler into the long pipeline and resets
    `scheduler._step_index = None` per window
    (`wan_inference_long_pipeline.py:715`) — but with a multistep scheduler
    that reset leaves the solver's x0 HISTORY shared across windows (window
    w's correction would use window w-1's data prediction).  We instead
    carry an explicit per-window history, the mathematically-intended
    generalization (every window is an independent trajectory on the shared
    sigma ladder), stacked into one array so the sweep stays one device
    dispatch per step.  Since `plan_windows` makes every window full-size,
    the stack is rectangular.  Per-step solver structure is folded into
    coefficient VALUES host-side (`fm_solvers.dpm_coeffs`/`unipc_coeffs`),
    so all steps share one compiled program."""
    from stableavatar_tpu.schedulers.fm_solvers import dpm_apply, unipc_apply

    pred = jnp.zeros_like(latents_all)
    tb = jnp.full((3,), t, dtype=jnp.float32)
    prev_end = None
    new_state = {k: [None] * len(windows) for k in ms_state}
    for wi, (s, e) in enumerate(windows):
        f = e - s
        clip_len_w = (f - 1) * temporal_ratio + 1
        lat_win = jax.lax.dynamic_slice_in_dim(latents_all, s, f, axis=2)
        lat3 = jnp.concatenate([lat_win] * 3, axis=0).astype(jnp.bfloat16)
        if compute_flags is not None and not compute_flags[wi]:
            # TeaCache skip: replay the cached block-stack residual
            noise_pred = dit_forward_skip(
                params, dit_cfg, lat3, tb, y_full[:, :, :f], residual
            )
        elif compute_flags is not None:
            noise_pred, residual = dit_forward(
                params, dit_cfg, lat3, tb, text_ctx, clip_ctx, y_full[:, :, :f],
                vocal_embs[wi][:, : vocal_lens[wi]],
                video_sample_n_frames=clip_len_w, vocal_cfg_tile=True,
                return_residual=True, rope_split=rope_split,
                attn_quant=attn_quant, attn_impl=attn_impl,
                honor_vocal_k_lens=honor_vocal_k_lens,
            )
        else:
            noise_pred = dit_forward(
                params, dit_cfg, lat3, tb, text_ctx, clip_ctx, y_full[:, :, :f],
                vocal_embs[wi][:, : vocal_lens[wi]], video_sample_n_frames=clip_len_w,
                vocal_cfg_tile=True, rope_split=rope_split, attn_quant=attn_quant,
                attn_impl=attn_impl, honor_vocal_k_lens=honor_vocal_k_lens,
            )
        v = guidance_combine_long(noise_pred, text_scale, audio_scale)
        if solver == "dpm":
            x_t, x0 = dpm_apply(
                lat_win, v, sigma, ms_state["x0_prev"][wi],
                ms_state["x0_prev2"][wi], **coeffs,
            )
            new_state["x0_prev"][wi] = x0
            new_state["x0_prev2"][wi] = ms_state["x0_prev"][wi]
        else:
            x_t, x0, corrected = unipc_apply(
                lat_win, v, sigma, ms_state["x0_prev"][wi],
                ms_state["x0_prev2"][wi], ms_state["last_sample"][wi],
                x0_prev3=ms_state["x0_prev3"][wi], **coeffs,
            )
            new_state["x0_prev"][wi] = x0
            new_state["x0_prev2"][wi] = ms_state["x0_prev"][wi]
            new_state["x0_prev3"][wi] = ms_state["x0_prev2"][wi]
            new_state["last_sample"][wi] = corrected
        new_lat = x_t.astype(jnp.bfloat16)
        if s != 0 and blend:
            prev_tail = jax.lax.dynamic_slice_in_dim(
                pred, prev_end - overlap, overlap, axis=2
            )
            head = new_lat[:, :, :overlap]
            blended = head * ramp.astype(head.dtype) + prev_tail * (
                1 - ramp
            ).astype(head.dtype)
            new_lat = jnp.concatenate([blended, new_lat[:, :, overlap:]], axis=2)
        pred = jax.lax.dynamic_update_slice_in_dim(pred, new_lat, s, axis=2)
        prev_end = e
    return pred, {k: jnp.stack(vs) for k, vs in new_state.items()}, residual


@partial(jax.jit, static_argnames=("f",))
def _slice_cfg3(latents_all, s, f):
    """[1,16,T,h,w] -> CFG-tripled window [3,16,f,h,w] (bf16)."""
    lat = jax.lax.dynamic_slice_in_dim(latents_all, s, f, axis=2)
    return jnp.concatenate([lat] * 3, axis=0).astype(jnp.bfloat16)


@partial(
    jax.jit,
    static_argnames=("f", "overlap", "blend", "text_scale", "audio_scale"),
    donate_argnums=(0,),
)
def _streamed_window_update(
    pred, latents_all, noise_pred, s, prev_end, sigma, sigma_next, ramp,
    f, overlap, blend, text_scale, audio_scale,
):
    """Per-window CFG combine + euler update + overlap blend + write, for
    the host-streamed (sequential-offload) path — same math as the matching
    slice of `_sweep_step`, jitted separately because the DiT call between
    slice and update is a host-driven loop (models/streaming.py)."""
    v = guidance_combine_long(noise_pred, text_scale, audio_scale)
    lat_win = jax.lax.dynamic_slice_in_dim(latents_all, s, f, axis=2)
    new_lat = (
        lat_win.astype(jnp.float32) + (sigma_next - sigma) * v
    ).astype(jnp.bfloat16)
    if blend:
        prev_tail = jax.lax.dynamic_slice_in_dim(
            pred, prev_end - overlap, overlap, axis=2
        )
        head = new_lat[:, :, :overlap]
        blended = head * ramp.astype(head.dtype) + prev_tail * (
            1 - ramp
        ).astype(head.dtype)
        new_lat = jnp.concatenate([blended, new_lat[:, :, overlap:]], axis=2)
    return jax.lax.dynamic_update_slice_in_dim(pred, new_lat, s, axis=2)


def precompute_teacache_plan(teacache, e0_steps, n_windows: int):
    """Simulate the controller over the (step x window) call sequence and
    return per-step tuples of compute flags.  Exactly the decisions the
    per-window loop would make: same counter/threshold semantics, same
    can_skip=False until a residual exists (models/teacache.py:plan).

    Mixed patterns within one step are canonicalized to all-compute so the
    jitted sweep compiles at most TWO programs (all-compute / all-skip);
    the forced computes are removed from the skip accounting (computing
    where the controller would have skipped only improves fidelity — it
    happens on the 1-3 threshold-crossing steps of a run)."""
    plan = []
    have_residual = False
    for e0 in e0_steps:
        flags = []
        for _ in range(n_windows):
            compute = teacache.plan(e0, can_skip=have_residual)
            if compute:
                have_residual = True
            flags.append(bool(compute))
        plan.append(tuple(flags))

    canon = []
    for flags in plan:
        if all(flags) or not any(flags):
            canon.append(flags)
        else:
            teacache.skipped_calls -= sum(1 for f in flags if not f)
            canon.append(tuple(True for _ in flags))
    return canon


@dataclasses.dataclass
class LongPipelineOutput:
    videos: np.ndarray  # [B, 3, T, H, W] in [0, 1]
    latents: Optional[jnp.ndarray] = None


def generate_long(
    models: WanModels,
    *,
    ref_image,  # [1, 3, H, W] in [-1, 1] (numpy or jnp)
    vocal_waveform,  # [S] raw 16 kHz samples (numpy)
    prompt: str = "",
    negative_prompt: str = "",
    text_ctx: Optional[jnp.ndarray] = None,  # pre-encoded [3, text_len, text_dim]
    num_inference_steps: int = 50,
    text_guide_scale: float = 3.0,
    audio_guide_scale: float = 5.0,
    clip_length: int = 81,
    overlap_window_length: int = 15,
    overlapping_weight_scheme: str = "uniform",
    scheduler: str = "euler",  # "euler" | "dpm++" | "unipc"
    solver_order: int = 2,
    solver_type: Optional[str] = None,  # dpm++: midpoint|heun; unipc: bh1|bh2
    fps: int = 25,
    sr: int = 16000,
    seed: int = 42,
    shift: float = 5.0,
    output_type: str = "numpy",
    timer=None,  # optional utils.profiling.StepTimer for per-phase tracing
    initial_latents=None,  # optional [1, 16, infer_length, lh, lw] noise
    step_callback=None,  # optional fn(step_index, latents_all) for parity probes
    color_correction_strength: float = 0.0,  # opt-in LAB match to ref image
    frame_sink=None,  # optional fn([1,3,T,H,W] u8 segment): stream frames out
) -> LongPipelineOutput:
    """Audio-driven unbounded-length generation (reference §3.2 call stack)."""
    import contextlib

    phase = timer.phase if timer is not None else (lambda name: contextlib.nullcontext())
    ref_image = jnp.asarray(ref_image, dtype=jnp.float32)
    h_img, w_img = ref_image.shape[-2:]

    frames_per_batch = (clip_length - 1) // models.vae_cfg.temporal_compression_ratio + 1
    samples_per_frame = int(sr / fps)
    total_samples = int(np.shape(vocal_waveform)[0])
    total_frames = int(total_samples / samples_per_frame)
    infer_length = (total_frames - 1) // models.vae_cfg.temporal_compression_ratio + 1

    sched = flow_match_timesteps(num_inference_steps, shift=shift)

    lh = h_img // models.vae_cfg.spatial_compression_ratio
    lw = w_img // models.vae_cfg.spatial_compression_ratio
    if initial_latents is not None:
        # parity harness path: identical noise injected into both stacks
        latents_all = jnp.asarray(initial_latents, dtype=jnp.float32).astype(jnp.bfloat16)
    else:
        key = jax.random.PRNGKey(seed)
        latents_all = jax.random.normal(
            key, (1, models.vae_cfg.z_dim, infer_length, lh, lw), dtype=jnp.float32
        ).astype(jnp.bfloat16)

    with phase("text_encode"):
        if text_ctx is None:
            text_ctx = encode_prompts(models, prompt, negative_prompt)
    with phase("conditioning"):
        clip_ctx, y_full = prepare_conditioning(models, ref_image, clip_length, cfg_batch=3)

    windows = plan_windows(infer_length, frames_per_batch, overlap_window_length)
    audio_slices = plan_audio_slices(windows, infer_length, samples_per_frame, total_samples)

    # hoisted: one wav2vec evaluation per window, reused across all steps
    with phase("wav2vec"):
        wav = np.asarray(vocal_waveform, dtype=np.float32)
        vocal_embs = [extract_vocal_features(models, wav[idx]) for idx in audio_slices]

    ramp = None
    if overlap_window_length > 0:
        w = overlap_weights(overlap_window_length, overlapping_weight_scheme)
        ramp = jnp.asarray(w)[None, None, :, None, None]

    teacache = models.teacache
    # the final window's truncated audio slice yields shorter wav2vec
    # features; zero-pad to a uniform stack for the single-dispatch sweep and
    # carry the true lengths statically (sliced back inside the jit)
    vocal_lens = tuple(int(v.shape[1]) for v in vocal_embs)
    la_max = max(vocal_lens)
    vocal_stacked = jnp.stack(
        [
            jnp.pad(v, ((0, 0), (0, la_max - v.shape[1]), (0, 0)))
            for v in vocal_embs
        ]
    )
    windows_t = tuple(windows)
    ramp_arg = ramp if ramp is not None else jnp.zeros((1, 1, 1, 1, 1), jnp.float32)

    if models.streamed_dit is not None and (
        scheduler not in ("euler", "flow") or teacache is not None
    ):
        # the streamed (sequential-offload) forward is a host-driven loop;
        # multistep histories and TeaCache plans are built around the jitted
        # sweeps.  The reference's sequential_cpu_offload similarly ships
        # with its hardwired euler scheduler (inference.py:491-496,513-524).
        raise ValueError(
            "sequential_cpu_offload (streamed DiT) currently supports the "
            "euler scheduler without TeaCache"
        )

    ms_state = None
    co_steps = None
    if scheduler not in ("euler", "flow"):
        # the reference injects any scheduler into this pipeline and resets
        # `_step_index` per window (`wan_inference_long_pipeline.py:715`);
        # we carry an explicit per-window solver history instead (see
        # `_sweep_step_ms`).  TeaCache composes: its skip plan depends only
        # on e0(t) and the residual replay works under any solver (both act
        # on the velocity prediction) — the reference combines them only
        # with Euler because inference.py hardwires that scheduler.
        from stableavatar_tpu.schedulers.fm_solvers import dpm_coeffs, unipc_coeffs

        fpb0 = windows[0][1] - windows[0][0]

        def zw():
            # distinct buffers per state entry: the sweep donates the whole
            # state dict, and XLA rejects the same donated buffer aliased
            # into two arguments
            return jnp.zeros(
                (len(windows), 1, models.vae_cfg.z_dim, fpb0, lh, lw),
                jnp.float32,
            )

        if scheduler in ("dpm++", "dpm-solver++", "dpm"):
            solver_kind = "dpm"
            co_steps = [
                dpm_coeffs(sched, i, solver_order, solver_type or "midpoint")
                for i in range(sched.num_steps)
            ]
            ms_state = {"x0_prev": zw(), "x0_prev2": zw()}
        elif scheduler == "unipc":
            solver_kind = "unipc"
            co_steps = []
            prev_order = 1
            for i in range(sched.num_steps):
                co, prev_order = unipc_coeffs(
                    sched, i, solver_order, prev_order, solver_type or "bh2"
                )
                co_steps.append(co)
            ms_state = {"x0_prev": zw(), "x0_prev2": zw(), "x0_prev3": zw(),
                        "last_sample": zw()}
        else:
            raise ValueError(f"unknown scheduler {scheduler!r}")

    tc_plan = None
    residual_carry = None
    if teacache is not None:
        teacache.reset()
        # the whole skip schedule is a deterministic function of e0(t):
        # precompute every decision (one batched e0 eval, host-side
        # controller simulation) so TeaCache runs are also one dispatch per
        # step (one compilation per distinct per-step flag pattern)
        e0_all = dit_time_e0(
            models.dit_params, models.dit_cfg,
            jnp.asarray(np.asarray(sched.timesteps), jnp.float32),
        )
        e0_steps = [e0_all[i : i + 1] for i in range(sched.num_steps)]
        tc_plan = precompute_teacache_plan(teacache, e0_steps, len(windows))
        fpb0 = windows[0][1] - windows[0][0]
        l_tokens = fpb0 * (lh // 2) * (lw // 2)
        residual_carry = jnp.zeros(
            (3, l_tokens, models.dit_cfg.dim), jnp.bfloat16
        )

    common = dict(
        dit_cfg=models.dit_cfg,
        windows=windows_t,
        overlap=int(overlap_window_length),
        text_scale=float(text_guide_scale),
        audio_scale=float(audio_guide_scale),
        rope_split=models.rope_split,
        attn_quant=models.attn_quant,
        attn_impl=models.attn_impl,
        temporal_ratio=int(models.vae_cfg.temporal_compression_ratio),
        vocal_lens=vocal_lens,
        honor_vocal_k_lens=models.honor_vocal_k_lens,
    )

    # hoisted invariants for the streamed (sequential-offload) path: all
    # windows are full-size (plan_windows), so the y slice and the per-window
    # unpadded vocal features are loop-invariant
    if models.streamed_dit is not None:
        fpb0 = windows[0][1] - windows[0][0]
        y_win = y_full[:, :, :fpb0]
        clip_len_w = (fpb0 - 1) * int(models.vae_cfg.temporal_compression_ratio) + 1
        vocal_list = [jnp.asarray(v) for v in vocal_embs]

    for i in range(sched.num_steps):
      with phase("denoise_step"):
        t = sched.timesteps[i]
        sigma, sigma_next = sched.sigmas[i], sched.sigmas[i + 1]
        blend = bool(i != 0 and ramp is not None)
        if models.streamed_dit is not None:
            pred = jnp.zeros_like(latents_all)
            tb = jnp.full((3,), t, dtype=jnp.float32)
            prev_end = 0
            for wi, (s, e) in enumerate(windows):
                lat3 = _slice_cfg3(latents_all, jnp.asarray(s, jnp.int32), f=fpb0)
                noise_pred = models.streamed_dit(
                    lat3, tb, text_ctx, clip_ctx, y_win, vocal_list[wi],
                    video_sample_n_frames=clip_len_w, vocal_cfg_tile=True,
                )
                pred = _streamed_window_update(
                    pred, latents_all, noise_pred,
                    jnp.asarray(s, jnp.int32), jnp.asarray(prev_end, jnp.int32),
                    sigma, sigma_next, ramp_arg,
                    f=fpb0, overlap=int(overlap_window_length),
                    blend=bool(s != 0 and blend),
                    text_scale=float(text_guide_scale),
                    audio_scale=float(audio_guide_scale),
                )
                prev_end = e
            latents_all = pred
        elif ms_state is not None:
            res_in = (
                residual_carry if residual_carry is not None
                else jnp.zeros((1,), jnp.bfloat16)  # unused placeholder
            )
            latents_all, ms_state, res_out = _sweep_step_ms(
                models.dit_params, latents_all, ms_state, co_steps[i], y_full,
                text_ctx, clip_ctx, vocal_stacked, res_in, t, sigma, ramp_arg,
                blend=blend, solver=solver_kind,
                compute_flags=tc_plan[i] if tc_plan is not None else None,
                **common,
            )
            if residual_carry is not None:
                residual_carry = res_out
        elif tc_plan is None:
            latents_all = _sweep_step(
                models.dit_params, latents_all, y_full, text_ctx, clip_ctx,
                vocal_stacked, t, sigma, sigma_next, ramp_arg,
                blend=blend, **common,
            )
        else:
            latents_all, residual_carry = _sweep_step_tc(
                models.dit_params, latents_all, y_full, text_ctx, clip_ctx,
                vocal_stacked, residual_carry, t, sigma, sigma_next, ramp_arg,
                blend=blend, compute_flags=tc_plan[i], **common,
            )
        if step_callback is not None:
            step_callback(i, latents_all)

    latents = latents_all.astype(jnp.float32)
    if output_type == "latent":
        return LongPipelineOutput(videos=None, latents=latents)

    # decode in the VAE dtype like the reference (`decode_latents` casts to
    # vae.dtype, wan_inference_long_pipeline.py:425) — halves decode HBM.
    # Segmented decode (models/vae.py:decode_video_segmented): every segment
    # is enqueued up front (async dispatch), uint8-quantized on device (4x
    # smaller transfer), and the host pulls segment k WHILE the device
    # decodes k+1 — device->host bandwidth hides behind decode compute.
    with phase("vae_decode"):
        segs_u8 = decode_video_segmented(
            models.vae_params, latents_all.astype(jnp.bfloat16),
            models.vae_cfg, out_uint8=True,
        )
        # force completion of the FIRST segment with a one-pixel host read
        # (block_until_ready is a no-op over remote-tunneled accelerators):
        # this phase measures first-segment decode compute; the remaining
        # segments decode under the transfer phase, overlapped
        np.asarray(segs_u8[0][0, 0, 0, 0, 0])
    def correct(video: np.ndarray) -> np.ndarray:
        # opt-in (default off = reference parity: the util is imported but
        # never called at `wan_inference_long_pipeline.py:32`): LAB-match
        # the decoded stream to the reference image for long-run color
        # drift; frame-local, so it applies per segment under streaming
        if color_correction_strength <= 0.0:
            return video
        from stableavatar_tpu.utils.color_correction import match_and_blend_colors

        ref_np = np.asarray(ref_image, np.float32)[:, :, None]  # [1,3,1,H,W]
        return np.clip(
            (match_and_blend_colors(
                video * 2.0 - 1.0, ref_np, color_correction_strength,
            ) + 1.0) / 2.0, 0.0, 1.0,
        )

    if frame_sink is not None:
        # unbounded-length output path: each u8 segment streams to the sink
        # (device->host transfer still overlaps the next segment's decode);
        # host memory stays O(segment) instead of O(duration)
        with phase("video_transfer"):
            for s in segs_u8:
                seg = np.asarray(s)
                if color_correction_strength > 0.0:
                    seg = (correct(seg.astype(np.float32) / 255.0)
                           * 255.0).round().astype(np.uint8)
                frame_sink(seg)
        return LongPipelineOutput(videos=None, latents=latents)

    with phase("video_transfer"):
        video = np.concatenate(
            [np.asarray(s) for s in segs_u8], axis=2
        ).astype(np.float32) / 255.0
    video = correct(video)
    return LongPipelineOutput(videos=video, latents=latents)

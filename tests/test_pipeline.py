"""End-to-end pipeline tests at tiny scale: window planning, stitching
coverage, and a full generate_long() run through every model."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stableavatar_tpu.config import (
    CLIPConfig,
    DiTConfig,
    T5Config,
    VAEConfig,
    Wav2Vec2Config,
)
from stableavatar_tpu.pipelines.long import (
    generate_long,
    overlap_weights,
    plan_audio_slices,
    plan_windows,
)


def test_plan_windows_covers_every_index_once_per_sweep():
    for infer_length, fpb, ov in [(21, 21, 15), (40, 21, 15), (75, 21, 10), (5, 3, 1)]:
        windows = plan_windows(infer_length, fpb, ov)
        covered = np.zeros(infer_length, dtype=int)
        for s, e in windows:
            assert e <= infer_length
            covered[s:e] += 1
        assert (covered >= 1).all(), (infer_length, fpb, ov, covered)
        # all windows are full-size except possibly the last
        for s, e in windows[:-1]:
            assert e - s == fpb
        # consecutive windows overlap by >= ov (the final window may overlap more)
        for (s1, e1), (s2, e2) in zip(windows, windows[1:]):
            assert e1 - s2 >= ov


def test_plan_windows_single_window():
    assert plan_windows(21, 21, 15) == [(0, 21)]


def test_overlap_weights_schemes():
    for scheme in ("uniform", "log"):
        w = overlap_weights(10, scheme)
        assert w[0] == 0.0 and w[-1] == 1.0
        assert (np.diff(w) >= 0).all()


def test_plan_audio_slices_final_window_truncates():
    windows = [(0, 3), (2, 5)]
    slices = plan_audio_slices(windows, 5, samples_per_frame=4, total_samples=70)
    # non-final window: 3 latent frames -> 12 video frames -> 48 samples
    assert len(slices[0]) == 48
    assert slices[0][0] == 0 and slices[0][-1] == 47
    # final window (index_end == infer_length): truncated at the end of the
    # audio track, NOT wrapped (`wan_inference_long_pipeline.py:718-719`)
    assert slices[1][0] == 32
    assert slices[1][-1] == 69
    assert len(slices[1]) == 70 - 32


# --- tiny end-to-end ---

VAE_E2E = VAEConfig(
    dim=4,
    z_dim=4,
    dim_mult=(1, 2, 2),
    num_res_blocks=1,
    temporal_downsample=(True, True),
    temporal_compression_ratio=4,
    spatial_compression_ratio=4,
    latent_mean=(0.0,) * 4,
    latent_std=(1.0,) * 4,
)

DIT_E2E = DiTConfig(
    dim=32,
    ffn_dim=64,
    freq_dim=16,
    text_dim=32,
    in_dim=12,  # z(4) + mask(4) + masked latents(4)
    out_dim=4,
    num_heads=4,
    num_layers=2,
    text_len=16,
    clip_tokens=5,
    clip_dim=32,
    audio_in_dim=16,
    audio_proj_dim=32,
    vocal_num_heads=4,
)

T5_E2E = T5Config(vocab=64, dim=32, dim_attn=32, dim_ffn=64, num_heads=4, num_layers=2, text_len=16)
CLIP_E2E = CLIPConfig(image_size=28, patch_size=14, vision_dim=32, vision_heads=2, vision_layers=2)
W2V_E2E = Wav2Vec2Config(hidden_size=16, num_layers=2, num_heads=2, ffn_dim=32,
                         conv_dims=(8,) * 7, num_conv_pos_embeddings=16,
                         num_conv_pos_embedding_groups=4)


def make_tiny_models():
    """Random-init tiny WanModels; shared with tests/test_app_ui.py."""
    from stableavatar_tpu.models.clip import init_clip_visual
    from stableavatar_tpu.models.dit import init_dit
    from stableavatar_tpu.models.t5 import init_t5
    from stableavatar_tpu.models.vae import init_vae
    from stableavatar_tpu.models.wav2vec import init_wav2vec2
    from stableavatar_tpu.pipelines.common import WanModels

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)

    def tok(prompt):
        ids = np.zeros(16, dtype=np.int32)
        mask = np.zeros(16, dtype=np.int32)
        toks = [ord(c) % 60 for c in prompt][:15]
        ids[: len(toks)] = toks
        ids[len(toks)] = 1
        mask[: len(toks) + 1] = 1
        return ids, mask

    return WanModels(
        dit_params=init_dit(ks[0], DIT_E2E),
        dit_cfg=DIT_E2E,
        vae_params=init_vae(ks[1], VAE_E2E),
        vae_cfg=VAE_E2E,
        t5_params=init_t5(ks[2], T5_E2E),
        t5_cfg=T5_E2E,
        clip_params=init_clip_visual(ks[3], CLIP_E2E),
        clip_cfg=CLIP_E2E,
        wav2vec_params=init_wav2vec2(ks[4], W2V_E2E),
        wav2vec_cfg=W2V_E2E,
        tokenizer=tok,
    )


@pytest.fixture(scope="module")
def tiny_models():
    return make_tiny_models()


def test_generate_long_end_to_end(tiny_models):
    rng = np.random.default_rng(0)
    ref = rng.uniform(-1, 1, (1, 3, 32, 32)).astype(np.float32)
    # 2 "clips" of audio: 18 video frames at 640 samples/frame
    wav = rng.standard_normal(18 * 640).astype(np.float32) * 0.1

    out = generate_long(
        tiny_models,
        ref_image=ref,
        vocal_waveform=wav,
        prompt="a person talking",
        negative_prompt="",
        num_inference_steps=2,
        clip_length=9,
        overlap_window_length=1,
        seed=0,
    )
    # 18 frames -> infer_length (18-1)//4+1 = 5 latents -> 1+4*4 = 17 frames
    assert out.videos.shape == (1, 3, 17, 32, 32)
    assert np.isfinite(out.videos).all()
    assert out.videos.min() >= 0.0 and out.videos.max() <= 1.0


def test_generate_single_clip_end_to_end(tiny_models):
    from stableavatar_tpu.pipelines.single_clip import generate_single_clip

    rng = np.random.default_rng(1)
    ref = rng.uniform(-1, 1, (1, 3, 32, 32)).astype(np.float32)
    wav = rng.standard_normal(9 * 640).astype(np.float32) * 0.1

    ids_p, mask_p = np.ones(16, np.int32), np.ones(16, np.int32)
    ids_n, mask_n = np.zeros(16, np.int32), np.ones(16, np.int32)

    out = generate_single_clip(
        tiny_models,
        ref_image=ref,
        vocal_waveform=wav,
        prompt_ids=(ids_p, mask_p),
        negative_prompt_ids=(ids_n, mask_n),
        num_inference_steps=2,
        clip_length=9,
        seed=0,
    )
    assert out.videos.shape == (1, 3, 9, 32, 32)
    assert np.isfinite(out.videos).all()


def test_single_clip_multistep_solvers(tiny_models):
    """DPM++/UniPC single-clip paths run and produce finite output."""
    from stableavatar_tpu.pipelines.single_clip import generate_single_clip

    rng = np.random.default_rng(2)
    ref = rng.uniform(-1, 1, (1, 3, 32, 32)).astype(np.float32)
    wav = rng.standard_normal(9 * 640).astype(np.float32) * 0.1
    ids = np.ones(16, np.int32)

    for sched in ("dpm++", "unipc"):
        out = generate_single_clip(
            tiny_models,
            ref_image=ref,
            vocal_waveform=wav,
            prompt_ids=(ids, ids),
            negative_prompt_ids=(np.zeros(16, np.int32), ids),
            num_inference_steps=3,
            clip_length=9,
            seed=0,
            scheduler=sched,
            output_type="latent",
        )
        assert np.isfinite(np.asarray(out.latents)).all(), sched


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_generate_long_sharded_matches_unsharded(tiny_models):
    """Multi-chip SP+FSDP inference == single-device inference (the reference
    multi-GPU path, ulysses x ring + FSDP, as one GSPMD mesh)."""
    from stableavatar_tpu.parallel.mesh import make_mesh, mesh_context
    from stableavatar_tpu.parallel.sharding import shard_params

    rng = np.random.default_rng(3)
    ref = rng.uniform(-1, 1, (1, 3, 32, 32)).astype(np.float32)
    wav = rng.standard_normal(18 * 640).astype(np.float32) * 0.1

    kwargs = dict(
        ref_image=ref, vocal_waveform=wav, prompt="a person talking",
        num_inference_steps=1, clip_length=9, overlap_window_length=1,
        seed=0, output_type="latent",
    )
    want = generate_long(tiny_models, **kwargs).latents

    mesh = make_mesh(dp=1, fsdp=2, sp=4)
    orig = tiny_models.dit_params
    try:
        with mesh_context(mesh):
            tiny_models.dit_params = shard_params(orig, mesh)
            got = generate_long(tiny_models, **kwargs).latents
    finally:
        tiny_models.dit_params = orig

    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=3e-2, atol=3e-2)


def test_generate_long_short_audio(tiny_models):
    """Audio shorter than one window (infer_length < frames_per_batch): the
    reference crashes on the vocal per-frame reshape; we adjust the
    per-window frame count."""
    rng = np.random.default_rng(4)
    ref = rng.uniform(-1, 1, (1, 3, 32, 32)).astype(np.float32)
    wav = rng.standard_normal(8 * 640).astype(np.float32) * 0.1  # 8 frames -> 2 latents < 3

    out = generate_long(
        tiny_models,
        ref_image=ref,
        vocal_waveform=wav,
        prompt="talking",
        num_inference_steps=1,
        clip_length=9,
        overlap_window_length=1,
        seed=0,
        output_type="latent",
    )
    assert out.latents.shape[2] == 2
    assert np.isfinite(np.asarray(out.latents)).all()


def test_sweep_step_matches_per_window_path(tiny_models):
    """The single-dispatch jitted sweep (TeaCache off) must produce exactly
    the same latents as the per-window host loop (TeaCache on but never
    skipping, rel_l1_thresh=inf forces compute every call)."""
    from stableavatar_tpu.models.teacache import TeaCache
    from stableavatar_tpu.pipelines.long import generate_long

    rng = np.random.default_rng(3)
    ref = rng.uniform(-1, 1, (1, 3, 32, 32)).astype(np.float32)
    wav = rng.standard_normal(640 * 21).astype(np.float32) * 0.1

    kwargs = dict(
        ref_image=ref, vocal_waveform=wav, prompt="speech",
        num_inference_steps=3, clip_length=9, overlap_window_length=1,
        seed=11, output_type="latent",
    )
    tiny_models.teacache = None
    sweep = generate_long(tiny_models, **kwargs)

    # per-window path: TeaCache active, threshold so high it never skips
    tiny_models.teacache = TeaCache([0.0, 0.0, 0.0, 0.0, 1e9], 3,
                                    rel_l1_thresh=0.0, num_skip_start_steps=99)
    per_window = generate_long(tiny_models, **kwargs)
    tiny_models.teacache = None

    np.testing.assert_array_equal(
        np.asarray(sweep.latents), np.asarray(per_window.latents)
    )


def test_final_window_seam_quality(tiny_models):
    """The shifted final window overwrites its overlap region unblended
    (plan_windows docstring; the reference crashes on ragged final windows
    instead).  Quantify the seam: the temporal latent delta at the final
    window's start junction must be comparable to interior deltas, not an
    outlier discontinuity."""
    from stableavatar_tpu.pipelines.long import generate_long, plan_windows

    rng = np.random.default_rng(9)
    ref = rng.uniform(-1, 1, (1, 3, 32, 32)).astype(np.float32)
    # 26 video frames -> infer_length 7; fpb=3, overlap=1 -> windows
    # (0,3),(2,5),(4,7): last window NOT shifted. Use 24 frames -> infer 6:
    # windows (0,3),(2,5),(3,6) -> final window shifted back by 1.
    wav = rng.standard_normal(23 * 640).astype(np.float32) * 0.1

    tiny_models.teacache = None
    out = generate_long(
        tiny_models, ref_image=ref, vocal_waveform=wav, prompt="speech",
        num_inference_steps=4, clip_length=9, overlap_window_length=1,
        seed=5, output_type="latent",
    )
    lat = np.asarray(out.latents, np.float32)[0]  # [16, F, h, w]
    infer_length = lat.shape[1]
    fpb = 3
    windows = plan_windows(infer_length, fpb, 1)
    assert windows[-1][0] != windows[-2][0] + (fpb - 1), "fixture should shift"

    deltas = np.linalg.norm(
        (lat[:, 1:] - lat[:, :-1]).reshape(16, infer_length - 1, -1), axis=(0, 2)
    )
    junction = windows[-1][0]  # first frame of the shifted final window
    seam = deltas[junction - 1]
    interior = np.delete(deltas, junction - 1)
    # the seam must not be a catastrophic outlier vs interior transitions
    assert seam < 2.5 * interior.max(), (seam, interior)


def test_precompute_teacache_plan_matches_controller_and_canonicalizes():
    """The precomputed schedule reproduces the controller's decisions, the
    first call always computes, mixed steps canonicalize to all-compute, and
    the skip accounting reflects the FINAL plan."""
    import jax.numpy as jnp

    from stableavatar_tpu.models.teacache import TeaCache
    from stableavatar_tpu.pipelines.long import precompute_teacache_plan

    steps, windows = 10, 2
    rng = np.random.default_rng(0)
    # e0 sequence with varying drift to trigger mixed decisions
    e0s = [jnp.asarray(rng.standard_normal((1, 6, 8)) * (1 + 0.3 * i))
           for i in range(steps)]

    tc = TeaCache([0.0, 0.0, 0.0, 1.0, 0.0], steps, rel_l1_thresh=0.35,
                  num_skip_start_steps=2)
    plan = precompute_teacache_plan(tc, e0s, windows)

    assert len(plan) == steps and all(len(f) == windows for f in plan)
    assert plan[0][0] is True  # first call must compute
    # every step is all-compute or all-skip after canonicalization
    for flags in plan:
        assert all(flags) or not any(flags)
    # accounting matches the final plan exactly
    actual_skips = sum(1 for f in plan for x in f if not x)
    assert tc.skipped_calls == actual_skips, (tc.skipped_calls, actual_skips)
    assert tc.total_calls == steps * windows


def test_generate_long_multistep_matches_per_window_oracle(tiny_models):
    """`generate_long(scheduler=...)`'s fused single-dispatch multistep sweep
    (`_sweep_step_ms`) == an independent per-window python loop driving the
    solver CLASSES (themselves step-parity-proven vs the reference's
    vendored schedulers in test_solver_parity.py) with the reference's
    blend/write orchestration (`wan_inference_long_pipeline.py:703-792`)."""
    from stableavatar_tpu.models.dit import dit_forward
    from stableavatar_tpu.pipelines.common import (
        encode_prompts,
        extract_vocal_features,
        guidance_combine_long,
        prepare_conditioning,
    )
    from stableavatar_tpu.schedulers.flow_match import flow_match_timesteps
    from stableavatar_tpu.schedulers.fm_solvers import (
        FlowDPMSolverMultistep,
        FlowUniPCMultistep,
        MultistepState,
    )

    tiny_models.teacache = None
    rng = np.random.default_rng(11)
    ref = rng.uniform(-1, 1, (1, 3, 32, 32)).astype(np.float32)
    wav = rng.standard_normal(26 * 640).astype(np.float32) * 0.1
    steps, clip_length, overlap = 4, 9, 1
    infer_length, fpb = 7, 3  # 26 frames -> 7 latents; windows (0,3),(2,5),(4,7)
    noise = np.asarray(
        jax.random.normal(jax.random.PRNGKey(5), (1, 4, infer_length, 8, 8)),
        np.float32,
    )

    for sched_name, order, cls in (
        ("dpm++", 2, FlowDPMSolverMultistep),
        ("dpm++", 3, FlowDPMSolverMultistep),
        ("unipc", 2, FlowUniPCMultistep),
    ):
        out = generate_long(
            tiny_models, ref_image=ref, vocal_waveform=wav, prompt="talk",
            negative_prompt="", num_inference_steps=steps,
            text_guide_scale=3.0, audio_guide_scale=5.0,
            clip_length=clip_length, overlap_window_length=overlap,
            scheduler=sched_name, solver_order=order, output_type="latent",
            initial_latents=noise,
        )
        got = np.asarray(out.latents, np.float32)

        sched = flow_match_timesteps(steps, shift=5.0)
        solver = cls(steps, shift=5.0, order=order)
        text_ctx = encode_prompts(tiny_models, "talk", "")
        clip_ctx, y_full = prepare_conditioning(
            tiny_models, jnp.asarray(ref), clip_length, cfg_batch=3
        )
        windows = plan_windows(infer_length, fpb, overlap)
        assert windows == [(0, 3), (2, 5), (4, 7)]
        audio_slices = plan_audio_slices(windows, infer_length, 640, len(wav))
        vocal_embs = [
            extract_vocal_features(tiny_models, wav[idx]) for idx in audio_slices
        ]
        ramp = jnp.asarray(overlap_weights(overlap))[None, None, :, None, None]
        states = [MultistepState() for _ in windows]
        lat_all = jnp.asarray(noise).astype(jnp.bfloat16)
        for i in range(steps):
            t = sched.timesteps[i]
            pred = jnp.zeros_like(lat_all)
            prev_end = None
            for wi, (s, e) in enumerate(windows):
                f = e - s
                lat_win = lat_all[:, :, s:e]
                lat3 = jnp.concatenate([lat_win] * 3, 0).astype(jnp.bfloat16)
                tb = jnp.full((3,), t, jnp.float32)
                raw = dit_forward(
                    tiny_models.dit_params, tiny_models.dit_cfg, lat3, tb,
                    text_ctx, clip_ctx, y_full[:, :, :f], vocal_embs[wi],
                    video_sample_n_frames=(f - 1) * 4 + 1, vocal_cfg_tile=True,
                )
                v = guidance_combine_long(raw, 3.0, 5.0)
                x_t, states[wi] = solver.step(
                    v, i, lat_win.astype(jnp.float32), states[wi]
                )
                new_lat = x_t.astype(jnp.bfloat16)
                if s != 0 and i != 0:
                    head = new_lat[:, :, :overlap]
                    prev_tail = pred[:, :, prev_end - overlap : prev_end]
                    blended = head * ramp.astype(head.dtype) + prev_tail * (
                        1 - ramp
                    ).astype(head.dtype)
                    new_lat = jnp.concatenate(
                        [blended, new_lat[:, :, overlap:]], axis=2
                    )
                pred = pred.at[:, :, s:e].set(new_lat)
                prev_end = e
            lat_all = pred
        want = np.asarray(lat_all.astype(jnp.float32), np.float32)
        np.testing.assert_allclose(
            got, want, atol=2e-2, rtol=0,
            err_msg=f"{sched_name} order={order} sweep != per-window oracle",
        )
        assert np.isfinite(got).all()


def test_generate_long_color_correction(tiny_models):
    """Opt-in LAB color match pulls the decoded stream toward the reference
    image's color statistics (the reference imports the util but never wires
    it — this path is an exceed-parity opt-in, default off)."""
    rng = np.random.default_rng(7)
    # strongly tinted reference so the match direction is unambiguous
    ref = np.full((1, 3, 32, 32), -0.8, np.float32)
    ref[:, 0] = 0.8
    wav = rng.standard_normal(18 * 640).astype(np.float32) * 0.1

    kw = dict(
        ref_image=ref, vocal_waveform=wav, prompt="x", negative_prompt="",
        num_inference_steps=1, clip_length=9, overlap_window_length=1, seed=0,
    )
    base = generate_long(tiny_models, **kw)
    cc = generate_long(tiny_models, color_correction_strength=1.0, **kw)

    assert cc.videos.shape == base.videos.shape
    assert np.isfinite(cc.videos).all()
    ref01 = (ref + 1.0) / 2.0
    d_base = np.abs(base.videos.mean(axis=(0, 2, 3, 4)) - ref01.mean(axis=(0, 2, 3)))
    d_cc = np.abs(cc.videos.mean(axis=(0, 2, 3, 4)) - ref01.mean(axis=(0, 2, 3)))
    assert d_cc.sum() < d_base.sum()


def test_generate_long_multistep_with_teacache(tiny_models):
    """TeaCache composes with the multistep solvers in generate_long
    (exceed-parity: the reference only combines TeaCache with its hardwired
    Euler scheduler).  A never-skipping TeaCache must be bit-identical to
    the plain unipc path; an always-skipping one must run finite and
    actually skip."""
    from stableavatar_tpu.models.teacache import TeaCache

    rng = np.random.default_rng(13)
    ref = rng.uniform(-1, 1, (1, 3, 32, 32)).astype(np.float32)
    wav = rng.standard_normal(18 * 640).astype(np.float32) * 0.1
    kwargs = dict(
        ref_image=ref, vocal_waveform=wav, prompt="speech",
        num_inference_steps=4, clip_length=9, overlap_window_length=1,
        seed=3, output_type="latent", scheduler="unipc",
    )

    tiny_models.teacache = None
    plain = generate_long(tiny_models, **kwargs)

    tiny_models.teacache = TeaCache([0.0, 0.0, 0.0, 0.0, 1e9], 4,
                                    rel_l1_thresh=0.0, num_skip_start_steps=99)
    never_skip = generate_long(tiny_models, **kwargs)
    assert tiny_models.teacache.skipped_calls == 0
    np.testing.assert_array_equal(
        np.asarray(plain.latents), np.asarray(never_skip.latents)
    )

    # zero polynomial -> accumulated distance stays 0 < thresh -> skips on
    # every non-forced call; num_steps uses the as-built per-CALL counter
    # (steps x windows) so whole steps become all-skip rows
    tiny_models.teacache = TeaCache([0.0, 0.0, 0.0, 0.0, 0.0], 4 * 2,
                                    rel_l1_thresh=1.0, num_skip_start_steps=0)
    skipping = generate_long(tiny_models, **kwargs)
    assert tiny_models.teacache.skipped_calls > 0
    assert np.isfinite(np.asarray(skipping.latents)).all()
    tiny_models.teacache = None


def test_riflex_config_changes_temporal_rope_only():
    """RIFLEx on the DiT config reduces the k-th intrinsic temporal
    frequency (reference enable_riflex,
    wan_fantasy_transformer3d_1B.py:890-906) and changes the forward output;
    spatial axes are untouched."""
    import dataclasses

    from tests.test_pipeline import DIT_E2E  # self-import for clarity
    from stableavatar_tpu.models.dit import dit_forward, init_dit

    cfg0 = DIT_E2E
    cfg1 = dataclasses.replace(cfg0, riflex_k=2, riflex_L_test=12,
                               riflex_scale=4.886)
    params = init_dit(jax.random.PRNGKey(0), cfg0)

    rng = np.random.default_rng(0)
    # DIT_E2E geometry: in_dim 12 = z(4) + y(8 = mask 4 + masked latents 4)
    x = jnp.asarray(rng.standard_normal((3, 4, 5, 8, 8)), jnp.float32)
    t = jnp.full((3,), 500.0)
    text = jnp.asarray(rng.standard_normal((3, cfg0.text_len, cfg0.text_dim)), jnp.float32)
    clip = jnp.asarray(rng.standard_normal((3, cfg0.clip_tokens, cfg0.clip_dim)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((3, 8, 5, 8, 8)), jnp.float32)
    vocal = jnp.asarray(rng.standard_normal((3, 24, cfg0.audio_in_dim)), jnp.float32)

    # the head is zero-init, so compare the post-blocks residual stream
    out0, res0 = dit_forward(params, cfg0, x, t, text, clip, y, vocal,
                             video_sample_n_frames=17, return_residual=True)
    out1, res1 = dit_forward(params, cfg1, x, t, text, clip, y, vocal,
                             video_sample_n_frames=17, return_residual=True)
    assert out0.shape == out1.shape
    assert np.isfinite(np.asarray(res1)).all()
    assert float(jnp.abs(res0 - res1).max()) > 0.0


def test_single_clip_teacache(tiny_models):
    """TeaCache in the single-clip (fantasy validation) pipeline: a
    never-skipping cache is bit-identical to the plain path; an
    always-skipping one runs finite and skips."""
    from stableavatar_tpu.models.teacache import TeaCache
    from stableavatar_tpu.pipelines.single_clip import generate_single_clip

    rng = np.random.default_rng(17)
    ref = rng.uniform(-1, 1, (1, 3, 32, 32)).astype(np.float32)
    wav = rng.standard_normal(9 * 640).astype(np.float32) * 0.1
    ids = np.ones(16, np.int32)
    kwargs = dict(
        ref_image=ref, vocal_waveform=wav,
        prompt_ids=(ids, ids), negative_prompt_ids=(np.zeros(16, np.int32), ids),
        num_inference_steps=4, clip_length=9, seed=2, output_type="latent",
    )

    tiny_models.teacache = None
    plain = generate_single_clip(tiny_models, **kwargs)

    tiny_models.teacache = TeaCache([0.0] * 5, 4, rel_l1_thresh=0.0,
                                    num_skip_start_steps=99)
    never = generate_single_clip(tiny_models, **kwargs)
    assert tiny_models.teacache.skipped_calls == 0
    np.testing.assert_array_equal(np.asarray(plain.latents), np.asarray(never.latents))

    tiny_models.teacache = TeaCache([0.0] * 5, 4, rel_l1_thresh=1.0,
                                    num_skip_start_steps=0)
    skipping = generate_single_clip(tiny_models, **kwargs)
    assert tiny_models.teacache.skipped_calls > 0
    assert np.isfinite(np.asarray(skipping.latents)).all()
    tiny_models.teacache = None


def test_frame_sink_streams_identical_frames(tiny_models, tmp_path):
    """Unbounded-length output path: frame_sink receives u8 segments whose
    concatenation equals the in-memory video (same decode, same order), and
    StreamingVideoWriter persists exactly that many frames with host memory
    O(segment)."""
    from stableavatar_tpu.utils.video_io import StreamingVideoWriter

    rng = np.random.default_rng(11)
    ref = rng.uniform(-1, 1, (1, 3, 32, 32)).astype(np.float32)
    wav = rng.standard_normal(18 * 640).astype(np.float32) * 0.1
    kwargs = dict(
        ref_image=ref, vocal_waveform=wav, prompt="a person talking",
        num_inference_steps=2, clip_length=9, overlap_window_length=1,
        seed=3,
    )

    base = generate_long(tiny_models, **kwargs)

    segs = []
    out = generate_long(tiny_models, frame_sink=segs.append, **kwargs)
    assert out.videos is None  # nothing accumulated in host RAM
    assert len(segs) >= 1
    streamed = np.concatenate(segs, axis=2).astype(np.float32) / 255.0
    np.testing.assert_allclose(streamed, base.videos, atol=1e-6)

    w = StreamingVideoWriter(str(tmp_path / "out.mp4"), fps=25)
    for s in segs:
        w.append(s)
    path = w.close()
    assert w.frames_written == base.videos.shape[2]
    import os as _os

    assert _os.path.exists(path)


def test_streaming_writer_direct_ffmpeg_pipe(tmp_path, monkeypatch):
    """Backend (1): with an `ffmpeg` binary on PATH the writer streams raw
    RGB frames through a single ffmpeg process and muxes the audio in the
    same pass (reference save_video_ffmpeg crop+mux, inference.py:53-89).
    Exercised with a fake ffmpeg that records its argv and counts the piped
    bytes."""
    import os
    import wave

    from stableavatar_tpu.utils.video_io import StreamingVideoWriter

    fake_bin = tmp_path / "bin"
    fake_bin.mkdir()
    argv_log = tmp_path / "argv.txt"
    bytes_log = tmp_path / "nbytes.txt"
    (fake_bin / "ffmpeg").write_text(
        "#!/bin/bash\n"
        f'printf "%s\\n" "$@" > "{argv_log}"\n'
        'for last; do :; done\n'
        f'wc -c > "{bytes_log}"\n'  # consume stdin, count bytes
        'echo fake-mp4 > "$last"\n'
    )
    os.chmod(fake_bin / "ffmpeg", 0o755)
    monkeypatch.setenv("PATH", f"{fake_bin}:{os.environ['PATH']}")

    audio = str(tmp_path / "voice.wav")
    with wave.open(audio, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(16000)
        f.writeframes(b"\x00\x00" * 1600)

    out = str(tmp_path / "out.mp4")
    w = StreamingVideoWriter(out, fps=25, audio_path=audio)
    seg = np.random.default_rng(0).integers(
        0, 255, (1, 3, 4, 8, 8), dtype=np.uint8
    )  # [B, C, T, H, W]
    w.append(seg)
    w.append(seg)
    path = w.close()

    assert path == out and os.path.exists(out)
    assert w.audio_muxed and w.frames_written == 8
    argv = argv_log.read_text().splitlines()
    assert "rawvideo" in argv and "8x8" in argv and audio in argv
    assert "-shortest" in argv and argv[-1] == out
    # every frame byte reached ffmpeg's stdin: 8 frames * 8*8 px * 3 ch
    assert int(bytes_log.read_text().split()[0]) == 8 * 8 * 8 * 3

    # fixed-geometry contract: a later segment with different dims raises
    # instead of silently piping garbled bytes under the first -s WxH
    w2 = StreamingVideoWriter(str(tmp_path / "out2.mp4"), fps=25)
    w2.append(seg)
    with pytest.raises(ValueError, match="fixed-geometry"):
        w2.append(np.zeros((1, 3, 2, 16, 16), np.uint8))
    w2.abort()


def test_streaming_writer_ffmpeg_failure_diagnosed(tmp_path, monkeypatch):
    """A dying encoder (bad build, corrupt audio) surfaces a RuntimeError
    carrying ffmpeg's stderr tail — not a bare BrokenPipeError with
    DEVNULL'd diagnostics."""
    import os

    from stableavatar_tpu.utils.video_io import StreamingVideoWriter

    fake_bin = tmp_path / "bin"
    fake_bin.mkdir()
    (fake_bin / "ffmpeg").write_text(
        "#!/bin/bash\n"
        'echo "Unknown encoder libx264" >&2\n'
        "exit 1\n"
    )
    os.chmod(fake_bin / "ffmpeg", 0o755)
    monkeypatch.setenv("PATH", f"{fake_bin}:{os.environ['PATH']}")

    w = StreamingVideoWriter(str(tmp_path / "out.mp4"), fps=25)
    seg = np.zeros((1, 3, 64, 32, 32), np.uint8)  # big enough to fill the pipe
    with pytest.raises(RuntimeError, match="Unknown encoder libx264"):
        # the write may not hit the broken pipe until the buffer fills or
        # close(); either path must carry the stderr tail
        for _ in range(64):
            w.append(seg)
        w.close()

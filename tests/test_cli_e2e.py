"""Full inference-CLI drive at tiny scale (STABLEAVATAR_TINY=1).

Exercises the ACTUAL `cli.inference.main` path end to end on CPU —
arg parsing, model assembly (random-init fallback + byte tokenizer),
prompt encode, generate_long, streaming mp4 writer — the same surface the
TPU e2e smoke drives (scripts/onchip_round4.sh step 1), minus scale.
"""

import os

import numpy as np
import pytest


@pytest.fixture
def synth_inputs(tmp_path):
    import cv2

    from stableavatar_tpu.utils.media import save_wav

    ref = str(tmp_path / "ref.png")
    img = np.random.default_rng(0).uniform(0, 255, (64, 64, 3)).astype(np.uint8)
    cv2.imwrite(ref, img)

    wav_path = str(tmp_path / "voice.wav")
    t = np.arange(16000) / 16000.0  # 1 s -> 25 frames -> 7 latents (1 window)
    save_wav(wav_path, (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32),
             16000)
    return ref, wav_path


def test_inference_cli_end_to_end_tiny(synth_inputs, tmp_path, monkeypatch):
    from stableavatar_tpu.cli.inference import main

    ref, wav = synth_inputs
    outdir = str(tmp_path / "out")
    monkeypatch.setenv("STABLEAVATAR_TINY", "1")

    rc = main([
        "--validation_reference_path", ref,
        "--validation_driven_audio_path", wav,
        "--validation_prompts", "A person is talking",
        "--width", "32", "--height", "32",
        "--sample_steps", "2",
        "--clip_sample_n_frames", "9",
        "--overlap_window_length", "1",
        "--stream_output",
        "--output_dir", outdir,
    ])
    assert rc == 0
    entries = os.listdir(outdir)
    assert entries, "CLI produced no output"
    # mp4 when an ffmpeg backend exists, PNG frame dir otherwise — either
    # way frames were persisted
    produced = [os.path.join(outdir, e) for e in entries]
    assert any(
        p.endswith(".mp4") or (os.path.isdir(p) and os.listdir(p))
        for p in produced
    ), produced


def test_inference_cli_multistep_teacache_qfloat8_tiny(synth_inputs, tmp_path,
                                                       monkeypatch):
    """The three round-4 CLI surfaces drive together end to end:
    TeaCache x unipc composition, qfloat8 int8 weight storage, and
    reference attention numerics."""
    from stableavatar_tpu.cli.inference import main

    ref, wav = synth_inputs
    outdir = str(tmp_path / "out2")
    monkeypatch.setenv("STABLEAVATAR_TINY", "1")

    rc = main([
        "--validation_reference_path", ref,
        "--validation_driven_audio_path", wav,
        "--width", "32", "--height", "32",
        "--sample_steps", "3",
        "--clip_sample_n_frames", "9",
        "--overlap_window_length", "1",
        "--sample_solver", "unipc",
        "--enable_teacache", "--num_skip_start_steps", "1",
        "--GPU_memory_mode", "model_cpu_offload_and_qfloat8",
        "--reference_attn_numerics",
        "--output_dir", outdir,
    ])
    assert rc == 0
    assert os.listdir(outdir)


def _mock_no_cpu_backend(monkeypatch):
    import jax

    real_local_devices = jax.local_devices

    def no_cpu_local_devices(*a, **kw):
        if kw.get("backend") == "cpu" or (a and a[-1] == "cpu"):
            raise RuntimeError(
                "Unknown backend cpu. Available backends are ['axon']")
        return real_local_devices(*a, **kw)

    monkeypatch.setattr(jax, "local_devices", no_cpu_local_devices)


def test_inference_cli_no_cpu_backend_fallback(synth_inputs, tmp_path,
                                               monkeypatch):
    """Accelerator plugins like the axon TPU tunnel register ONLY their own
    backend — `jax.local_devices(backend="cpu")` raises RuntimeError. A T5
    host-offload request must degrade to eager-encode-then-free, not crash
    at startup (observed live: onchip_round4.sh step 1, 2026-08-18)."""
    from stableavatar_tpu.cli.inference import main

    _mock_no_cpu_backend(monkeypatch)

    ref, wav = synth_inputs
    outdir = str(tmp_path / "out3")
    monkeypatch.setenv("STABLEAVATAR_TINY", "1")

    rc = main([
        "--validation_reference_path", ref,
        "--validation_driven_audio_path", wav,
        "--width", "32", "--height", "32",
        "--sample_steps", "2",
        "--clip_sample_n_frames", "9",
        "--overlap_window_length", "1",
        "--GPU_memory_mode", "model_cpu_offload",  # requests host T5
        "--output_dir", outdir,
    ])
    assert rc == 0
    assert os.listdir(outdir)


def test_load_models_no_cpu_backend_frees_t5(monkeypatch):
    """Under the no-cpu-backend fallback the loader must pre-encode the
    prompts and release the T5 params (umT5-xxl bf16 is ~11.4 GB — it cannot
    coexist with the DiT on a 16 GB v5e)."""
    from stableavatar_tpu.cli.inference import build_parser, load_models

    _mock_no_cpu_backend(monkeypatch)
    monkeypatch.setenv("STABLEAVATAR_TINY", "1")

    args = build_parser().parse_args([
        "--validation_reference_path", "x.png",
        "--validation_driven_audio_path", "x.wav",
        "--validation_prompts", "hello",
        "--GPU_memory_mode", "model_cpu_offload",
    ])
    models = load_models(args)
    assert models.t5_params is None
    assert models.text_ctx is not None
    assert models.text_ctx.shape[0] == 3  # [neg, neg, pos] CFG stack
    assert models.text_ctx.shape[1] == models.t5_cfg.text_len


def test_inference_cli_sequential_offload_tiny(synth_inputs, tmp_path,
                                               monkeypatch):
    """--GPU_memory_mode sequential_cpu_offload drives the host-streamed DiT
    (models/streaming.py) end to end — the 14B-on-16GB mode, at tiny scale."""
    from stableavatar_tpu.cli.inference import main

    ref, wav = synth_inputs
    outdir = str(tmp_path / "out_seq")
    monkeypatch.setenv("STABLEAVATAR_TINY", "1")

    rc = main([
        "--validation_reference_path", ref,
        "--validation_driven_audio_path", wav,
        "--validation_prompts", "A person is talking",
        "--width", "32", "--height", "32",
        "--sample_steps", "2",
        "--clip_sample_n_frames", "9",
        "--overlap_window_length", "1",
        "--GPU_memory_mode", "sequential_cpu_offload",
        "--output_dir", outdir,
    ])
    assert rc == 0
    assert os.listdir(outdir)

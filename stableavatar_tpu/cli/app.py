"""Serving app: the reference Gradio UI contract (`app.py:110-236`) on the
TPU stack.

`generate()` keeps the reference signature semantics (all generation knobs,
TeaCache toggle, seed handling, audio mux).  The Gradio UI itself is gated on
the `gradio` package (not present in this image); `build_ui()` raises a clear
error without it, while `generate()` works headless — which also serves as
the programmatic serving API.  The reference's optional MCP flag
(`app.py:36,489-496`) maps to `launch(mcp_server=True)` when gradio is
available.
"""

from __future__ import annotations

import os
import random
import time
from typing import Optional

import numpy as np


class AvatarService:
    """Preloaded-model serving wrapper (reference preloads at module import,
    `app.py:59-107`)."""

    def __init__(self, models, output_dir: str = "outputs"):
        self.models = models
        self.output_dir = output_dir
        os.makedirs(output_dir, exist_ok=True)

    def generate(
        self,
        image_path: str,
        audio_path: str,
        prompt: str = "",
        negative_prompt: str = "",
        width: int = 512,
        height: int = 512,
        guidance_scale: float = 3.0,  # text CFG (app "Text Guidance Scale")
        audio_guidance_scale: float = 5.0,
        num_inference_steps: int = 50,
        clip_length: int = 81,
        overlap_window_length: int = 15,
        seed_param: int = -1,
        enable_teacache: bool = False,
        teacache_threshold: float = 0.1,
        num_skip_start_steps: int = 5,
        fps: int = 25,
    ):
        from stableavatar_tpu.models.teacache import TeaCache, get_teacache_coefficients
        from stableavatar_tpu.pipelines.long import generate_long
        from stableavatar_tpu.utils.media import ffmpeg_available, load_image, load_wav, mux_audio
        from stableavatar_tpu.utils.video_io import save_videos_grid

        seed = seed_param if seed_param >= 0 else random.randint(0, 2**31 - 1)

        if enable_teacache:
            coef = get_teacache_coefficients("wan2.1-t2v-1.3b")
            self.models.teacache = TeaCache(
                coef, num_inference_steps, rel_l1_thresh=teacache_threshold,
                num_skip_start_steps=num_skip_start_steps,
            )
        else:
            self.models.teacache = None

        ref = load_image(image_path, (width, height))
        wav, sr = load_wav(audio_path, 16000)

        t0 = time.time()
        out = generate_long(
            self.models,
            ref_image=ref,
            vocal_waveform=wav,
            prompt=prompt,
            negative_prompt=negative_prompt,
            num_inference_steps=num_inference_steps,
            text_guide_scale=guidance_scale,
            audio_guide_scale=audio_guidance_scale,
            clip_length=clip_length,
            overlap_window_length=overlap_window_length,
            fps=fps,
            sr=sr,
            seed=seed,
        )
        elapsed = time.time() - t0

        base = os.path.join(self.output_dir, f"avatar_{seed}")
        video_path = base + ".mp4"
        save_videos_grid(out.videos, video_path, fps=fps)
        if ffmpeg_available():
            muxed = base + "_audio.mp4"
            try:
                mux_audio(video_path, audio_path, muxed)
                video_path = muxed
            except Exception:
                pass
        return video_path, seed, elapsed


def build_ui(service: AvatarService):
    """Gradio UI mirroring the reference tabs: generation / audio extraction /
    vocal separation (`app.py:280-496`).  Gated on gradio."""
    try:
        import gradio as gr
    except ImportError as e:
        raise RuntimeError(
            "gradio is not installed in this image; use AvatarService.generate() "
            "for headless serving"
        ) from e

    with gr.Blocks(title="StableAvatar-TPU") as demo:
        with gr.Tab("Avatar Generation"):
            image = gr.Image(type="filepath", label="Reference Image")
            audio = gr.Audio(type="filepath", label="Vocal Audio")
            prompt = gr.Textbox(label="Prompt")
            negative = gr.Textbox(label="Negative Prompt")
            with gr.Row():
                width = gr.Slider(256, 1024, 512, step=64, label="Width")
                height = gr.Slider(256, 1024, 512, step=64, label="Height")
            with gr.Row():
                steps = gr.Slider(10, 100, 50, step=1, label="Steps")
                cfg_t = gr.Slider(1.0, 10.0, 3.0, label="Text CFG")
                cfg_a = gr.Slider(1.0, 10.0, 5.0, label="Audio CFG")
            with gr.Row():
                overlap = gr.Slider(0, 20, 15, step=1, label="Overlap Window")
                seed = gr.Number(-1, label="Seed (-1 random)")
                teacache = gr.Checkbox(False, label="TeaCache (thr 0.1, skip 5)")
            out_video = gr.Video(label="Result")
            out_seed = gr.Number(label="Used Seed")
            gr.Button("Generate").click(
                lambda *a: service.generate(
                    a[0], a[1], a[2], a[3], int(a[4]), int(a[5]),
                    a[6], a[7], int(a[8]), seed_param=int(a[10]),
                    overlap_window_length=int(a[9]), enable_teacache=a[11],
                )[:2],
                [image, audio, prompt, negative, width, height, cfg_t, cfg_a,
                 steps, overlap, seed, teacache],
                [out_video, out_seed],
            )
        with gr.Tab("Audio Extraction"):
            vid_in = gr.Video(label="Video")
            wav_out = gr.Audio(label="Extracted WAV", type="filepath")

            def _extract(v):
                from stableavatar_tpu.preprocess.audio_extractor import extract

                out = os.path.join(service.output_dir, "extracted.wav")
                extract(v, out)
                return out

            gr.Button("Extract").click(_extract, [vid_in], [wav_out])
        with gr.Tab("Vocal Separation"):
            wav_in = gr.Audio(label="Audio", type="filepath")
            vocal_out = gr.Audio(label="Vocals", type="filepath")

            def _separate(a):
                from stableavatar_tpu.preprocess.vocal_separator import separate

                out = os.path.join(service.output_dir, "vocal.wav")
                separate(a, out)
                return out

            gr.Button("Separate").click(_separate, [wav_in], [vocal_out])
    return demo


def main():
    import argparse

    from stableavatar_tpu.cli.inference import build_parser, load_models

    p = build_parser()
    p.add_argument("--server_name", type=str, default="0.0.0.0")
    p.add_argument("--server_port", type=int, default=7860)
    p.add_argument("--mcp_server", action="store_true")
    args = p.parse_args()

    service = AvatarService(load_models(args), args.output_dir)
    demo = build_ui(service)
    demo.launch(
        server_name=args.server_name,
        server_port=args.server_port,
        mcp_server=args.mcp_server,
    )


if __name__ == "__main__":
    main()

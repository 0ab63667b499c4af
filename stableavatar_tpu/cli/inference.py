"""CLI inference entry point.

Preserves the reference `inference.py` flag surface (`:238-409`) mapped onto
the TPU stack:

- `--ulysses_degree/--ring_degree` -> the 'sp' mesh axis size (both forms of
  sequence parallelism are one GSPMD sharding here);
- `--fsdp_dit` -> parameter sharding over the 'fsdp' axis;
- `--GPU_memory_mode` -> kept for compatibility: TPU bf16 params replace
  fp8/offload modes (`model_full_load` is the only mode that changes
  behavior);
- TeaCache flags map to the host-side controller.

Run: python -m stableavatar_tpu.cli.inference --config_path ... (see --help)
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("stableavatar-tpu inference")
    # I/O (reference inference.py:238-409 flag names preserved)
    p.add_argument("--config_path", type=str, default=None)
    p.add_argument("--pretrained_model_name_or_path", type=str, required=False)
    p.add_argument("--transformer_path", type=str, default=None)
    p.add_argument("--pretrained_wav2vec_path", type=str, default=None)
    p.add_argument("--validation_reference_path", type=str, required=False)
    p.add_argument("--validation_driven_audio_path", type=str, required=False)
    p.add_argument("--validation_prompts", type=str, default="")
    p.add_argument("--negative_prompts", type=str, default="")
    p.add_argument("--output_dir", type=str, default="outputs")
    # generation
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--sample_steps", type=int, default=50)
    p.add_argument("--text_guide_scale", type=float, default=3.0)
    p.add_argument("--audio_guide_scale", type=float, default=5.0)
    p.add_argument("--clip_sample_n_frames", type=int, default=81)
    p.add_argument("--overlap_window_length", type=int, default=15)
    p.add_argument("--overlapping_weight_scheme", type=str, default="uniform",
                   choices=["uniform", "log"])
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--fps", type=int, default=25)
    p.add_argument("--sample_rate", type=int, default=16000)
    p.add_argument("--motion_frame", type=int, default=25)  # accepted-unused (parity)
    # model family
    p.add_argument("--model_family", type=str, default="1.3B", choices=["1.3B", "14B"])
    # memory / speed
    p.add_argument("--GPU_memory_mode", type=str, default="model_full_load",
                   choices=["model_full_load", "model_cpu_offload",
                            "model_cpu_offload_and_qfloat8", "sequential_cpu_offload"])
    p.add_argument("--enable_teacache", action="store_true")
    p.add_argument("--teacache_threshold", type=float, default=0.1)
    p.add_argument("--num_skip_start_steps", type=int, default=5)
    p.add_argument("--teacache_offload", action="store_true")
    # parallelism (reference: xfuser ulysses/ring + FSDP)
    p.add_argument("--ulysses_degree", type=int, default=1)
    p.add_argument("--ring_degree", type=int, default=1)
    p.add_argument("--fsdp_dit", action="store_true")
    p.add_argument("--t5_fsdp", action="store_true")  # parsed-only in reference too
    p.add_argument("--t5_cpu", action="store_true")
    return p


def load_models(args):
    """Assemble the WanModels bundle from checkpoints (or random init when no
    checkpoint paths are given — useful for smoke runs)."""
    import jax
    import jax.numpy as jnp

    from stableavatar_tpu.config import WAN_1_3B, WAN_14B, VAEConfig
    from stableavatar_tpu.models.clip import init_clip_visual
    from stableavatar_tpu.models.dit import cast_params, init_dit
    from stableavatar_tpu.models.t5 import init_t5
    from stableavatar_tpu.models.vae import init_vae
    from stableavatar_tpu.models.wav2vec import init_wav2vec2
    from stableavatar_tpu.pipelines.common import WanModels
    from stableavatar_tpu.utils import checkpoint as ckpt

    cfg = WAN_14B if args.model_family == "14B" else WAN_1_3B
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)

    root = args.pretrained_model_name_or_path

    def maybe(path):
        return root and os.path.exists(os.path.join(root, path))

    if maybe("diffusion_pytorch_model.safetensors"):
        sd = ckpt.load_torch_state_dict(os.path.join(root, "diffusion_pytorch_model.safetensors"))
        dit_params = ckpt.convert_dit(sd, cfg)
    else:
        dit_params = init_dit(ks[0], cfg)
    if args.transformer_path and os.path.exists(args.transformer_path):
        # fine-tuned .pt override: non-strict, size-filtered merge
        # (reference inference.py:485-490)
        sd = ckpt.load_torch_state_dict(args.transformer_path)
        dit_params = ckpt.merge_pt_override(dit_params, sd, cfg)
    dit_params = cast_params(dit_params, jnp.bfloat16)

    vae_cfg = VAEConfig()
    if maybe("Wan2.1_VAE.pth"):
        sd = ckpt.load_torch_state_dict(os.path.join(root, "Wan2.1_VAE.pth"))
        vae_params = ckpt.convert_vae(sd, vae_cfg)
    else:
        vae_params = init_vae(ks[1], vae_cfg)

    from stableavatar_tpu.config import T5Config, CLIPConfig, Wav2Vec2Config

    t5_cfg = T5Config()
    if maybe("models_t5_umt5-xxl-enc-bf16.pth"):
        sd = ckpt.load_torch_state_dict(os.path.join(root, "models_t5_umt5-xxl-enc-bf16.pth"))
        t5_params = ckpt.convert_t5(sd, t5_cfg)
    else:
        t5_params = init_t5(ks[2], t5_cfg)

    clip_cfg = CLIPConfig()
    if maybe("models_clip_open-clip-xlm-roberta-large-vit-huge-14.pth"):
        sd = ckpt.load_torch_state_dict(
            os.path.join(root, "models_clip_open-clip-xlm-roberta-large-vit-huge-14.pth")
        )
        clip_params = ckpt.convert_clip_visual(sd, clip_cfg)
    else:
        clip_params = init_clip_visual(ks[3], clip_cfg)

    w2v_cfg = Wav2Vec2Config()
    if args.pretrained_wav2vec_path and os.path.isdir(args.pretrained_wav2vec_path):
        # honor the checkpoint's processor normalization setting
        pc = os.path.join(args.pretrained_wav2vec_path, "preprocessor_config.json")
        if os.path.exists(pc):
            import json

            with open(pc) as f:
                import dataclasses

                w2v_cfg = dataclasses.replace(
                    w2v_cfg, do_normalize=bool(json.load(f).get("do_normalize", True))
                )
        import glob

        files = glob.glob(os.path.join(args.pretrained_wav2vec_path, "*.bin")) + glob.glob(
            os.path.join(args.pretrained_wav2vec_path, "*.safetensors")
        )
        if files:
            sd = ckpt.load_torch_state_dict(files[0])
            sd = {k.removeprefix("wav2vec2."): v for k, v in sd.items()}
            w2v_params = ckpt.convert_wav2vec2(sd, w2v_cfg)
        else:
            w2v_params = init_wav2vec2(ks[4], w2v_cfg)
    else:
        w2v_params = init_wav2vec2(ks[4], w2v_cfg)

    tokenizer = None
    tok_dir = root and os.path.join(root, "google/umt5-xxl")
    if tok_dir and os.path.isdir(tok_dir):
        from transformers import AutoTokenizer

        hf_tok = AutoTokenizer.from_pretrained(tok_dir)

        def tokenizer(text):
            out = hf_tok(
                text, padding="max_length", max_length=t5_cfg.text_len,
                truncation=True, add_special_tokens=True, return_tensors="np",
            )
            return out["input_ids"][0], out["attention_mask"][0]

    teacache = None
    if args.enable_teacache:
        from stableavatar_tpu.models.teacache import TeaCache, get_teacache_coefficients

        coef = get_teacache_coefficients(f"wan2.1-t2v-{args.model_family.lower()}")
        teacache = TeaCache(
            coef, args.sample_steps, rel_l1_thresh=args.teacache_threshold,
            num_skip_start_steps=args.num_skip_start_steps,
        )

    return WanModels(
        dit_params=dit_params,
        dit_cfg=cfg,
        vae_params=vae_params,
        vae_cfg=vae_cfg,
        t5_params=t5_params,
        t5_cfg=t5_cfg,
        clip_params=clip_params,
        clip_cfg=clip_cfg,
        wav2vec_params=w2v_params,
        wav2vec_cfg=w2v_cfg,
        tokenizer=tokenizer,
        teacache=teacache,
    )


def main(argv=None):
    args = build_parser().parse_args(argv)

    from stableavatar_tpu.parallel.mesh import make_mesh, mesh_context
    from stableavatar_tpu.parallel.sharding import shard_params
    from stableavatar_tpu.pipelines.long import generate_long
    from stableavatar_tpu.utils.media import load_image, load_wav
    from stableavatar_tpu.utils.video_io import save_videos_grid

    import jax

    sp = args.ulysses_degree * args.ring_degree
    fsdp = 1
    if args.fsdp_dit and len(jax.devices()) >= sp * 2:
        fsdp = len(jax.devices()) // sp
    mesh = None
    if sp > 1 or fsdp > 1:
        mesh = make_mesh(dp=1, fsdp=fsdp, sp=sp)

    models = load_models(args)

    ref = load_image(args.validation_reference_path, (args.width, args.height))
    wav, _ = load_wav(args.validation_driven_audio_path, args.sample_rate)

    with mesh_context(mesh):
        if mesh is not None:
            models.dit_params = shard_params(models.dit_params, mesh)
        out = generate_long(
            models,
            ref_image=ref,
            vocal_waveform=wav,
            prompt=args.validation_prompts,
            negative_prompt=args.negative_prompts,
            num_inference_steps=args.sample_steps,
            text_guide_scale=args.text_guide_scale,
            audio_guide_scale=args.audio_guide_scale,
            clip_length=args.clip_sample_n_frames,
            overlap_window_length=args.overlap_window_length,
            overlapping_weight_scheme=args.overlapping_weight_scheme,
            fps=args.fps,
            sr=args.sample_rate,
            seed=args.seed,
        )

    os.makedirs(args.output_dir, exist_ok=True)
    out_path = os.path.join(args.output_dir, f"video_seed{args.seed}.mp4")
    save_videos_grid(out.videos, out_path, fps=args.fps)
    # mux the driving audio when ffmpeg is available (reference
    # save_video_ffmpeg crops + muxes, inference.py:53-89)
    from stableavatar_tpu.utils.media import ffmpeg_available, mux_audio

    if ffmpeg_available():
        try:
            muxed = out_path.replace(".mp4", "_audio.mp4")
            mux_audio(out_path, args.validation_driven_audio_path, muxed)
            out_path = muxed
        except Exception as e:
            print(f"audio mux skipped: {e}")
    print(f"saved {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

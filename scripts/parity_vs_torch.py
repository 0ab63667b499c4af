"""Real-weights parity harness: reference PyTorch stack vs the TPU stack.

The north-star fidelity check (BASELINE.md): with real Wan2.1/StableAvatar
checkpoints mounted, load BOTH stacks from the same files, drive them with
identical inputs and identical injected noise, and report numerical diffs
at three integration levels:

  forward   one DiT forward (CFG triple) on identical random inputs —
            the most diagnostic model-level probe
  pipeline  full long-pipeline runs with the same initial noise; per-step
            latent max-abs diffs captured by wrapping the reference
            scheduler's `step` (grouped by timestep across windows) and our
            `generate_long(step_callback=...)`, plus final-latent and
            decoded-frame diffs

No checkpoints exist in this environment (zero egress), so execution waits
on a mount; the harness itself is import-tested and exercised end-to-end on
random tiny weights in tests/test_parity_harness.py (reference modules
instantiated from /root/reference, weights converted with
utils/checkpoint.py converters — the exact code path real checkpoints take).

Reference load path mirrored: `inference.py:463-506`.

Usage:
  python scripts/parity_vs_torch.py forward  --ckpt_root /path/to/models
  python scripts/parity_vs_torch.py pipeline --ckpt_root ... --audio a.wav \
      --image ref.png --steps 10 --size 512
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
REFERENCE_ROOT = os.environ.get("REFERENCE_ROOT", "/root/reference")


def _import_reference():
    from stableavatar_tpu.utils.diffusers_shim import ensure_diffusers

    ensure_diffusers()  # real diffusers used when installed; shim otherwise
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import wan  # noqa: F401  (reference package)

    return sys.modules["wan"]


# ---------------------------------------------------------------------------
# loading
# ---------------------------------------------------------------------------


def load_reference_dit(ckpt_root: str, dtype=None, device="cpu"):
    """Reference WanTransformer3DFantasyModel from the checkpoint layout
    (`inference.py:479-490`)."""
    import torch

    _import_reference()
    from omegaconf import OmegaConf
    from wan.models.wan_fantasy_transformer3d_1B import WanTransformer3DFantasyModel

    cfg_path = os.path.join(
        REFERENCE_ROOT, "deepspeed_config", "wan2.1", "wan_civitai.yaml"
    )
    config = OmegaConf.load(cfg_path)
    model = WanTransformer3DFantasyModel.from_pretrained(
        os.path.join(ckpt_root, "transformer"),
        transformer_additional_kwargs=OmegaConf.to_container(
            config["transformer_additional_kwargs"]
        ),
    )
    pt = [f for f in os.listdir(ckpt_root) if f.endswith(".pt")]
    if pt:  # fine-tuned override, non-strict size-filtered (`inference.py:485-490`)
        sd = torch.load(os.path.join(ckpt_root, pt[0]), map_location="cpu")
        sd = sd.get("state_dict", sd)
        model.load_state_dict(sd, strict=False)
    if dtype is not None:
        model = model.to(dtype)
    return model.to(device).eval()


def load_reference_pipeline(ckpt_root: str, device="cpu"):
    """Full reference pipeline assembly (`inference.py:463-506`)."""
    import torch

    _import_reference()
    from omegaconf import OmegaConf
    from transformers import AutoTokenizer, Wav2Vec2Model, Wav2Vec2Processor
    from diffusers import FlowMatchEulerDiscreteScheduler
    from wan.models.cache_utils import get_teacache_coefficients  # noqa: F401
    from wan.models.wan_image_encoder import CLIPModel
    from wan.models.wan_text_encoder import WanT5EncoderModel
    from wan.models.wan_vae import AutoencoderKLWan
    from wan.pipeline.wan_inference_long_pipeline import (
        WanI2VTalkingInferenceLongPipeline,
    )

    cfg_path = os.path.join(
        REFERENCE_ROOT, "deepspeed_config", "wan2.1", "wan_civitai.yaml"
    )
    config = OmegaConf.load(cfg_path)

    tokenizer = AutoTokenizer.from_pretrained(os.path.join(ckpt_root, "google/umt5-xxl"))
    text_encoder = WanT5EncoderModel.from_pretrained(
        os.path.join(ckpt_root, "google/umt5-xxl"),
        additional_kwargs=OmegaConf.to_container(config["text_encoder_kwargs"]),
    ).eval()
    vae = AutoencoderKLWan.from_pretrained(
        os.path.join(ckpt_root, "Wan2.1_VAE.pth"),
        additional_kwargs=OmegaConf.to_container(config["vae_kwargs"]),
    ).eval()
    wav2vec_processor = Wav2Vec2Processor.from_pretrained(
        os.path.join(ckpt_root, "wav2vec2-base-960h")
    )
    wav2vec = Wav2Vec2Model.from_pretrained(
        os.path.join(ckpt_root, "wav2vec2-base-960h")
    ).eval()
    clip_image_encoder = CLIPModel.from_pretrained(
        os.path.join(ckpt_root, "models_clip_open-clip-xlm-roberta-large-vit-huge-14.pth")
    ).eval()
    transformer = load_reference_dit(ckpt_root, device=device)
    scheduler = FlowMatchEulerDiscreteScheduler(
        **OmegaConf.to_container(config["scheduler_kwargs"])
    )
    return WanI2VTalkingInferenceLongPipeline(
        tokenizer=tokenizer,
        text_encoder=text_encoder,
        vae=vae,
        transformer=transformer,
        clip_image_encoder=clip_image_encoder,
        scheduler=scheduler,
        wav2vec_processor=wav2vec_processor,
        wav2vec=wav2vec,
    )


def load_tpu_stack(ckpt_root: str, fast_path: str = "off"):
    """Our stack from the same checkpoint layout (cli/inference.py loader)."""
    from stableavatar_tpu.cli.inference import build_parser, load_models

    args = build_parser().parse_args(
        ["--pretrained_model_name_or_path", ckpt_root, "--fast_path", fast_path]
    )
    return load_models(args)


def convert_torch_dit_to_jax(ref_model, dit_cfg):
    """Torch module -> our param pytree via the production converters."""
    from stableavatar_tpu.utils.checkpoint import convert_dit

    sd = {k: v.detach().cpu().numpy() for k, v in ref_model.state_dict().items()}
    return convert_dit(sd, dit_cfg)


# ---------------------------------------------------------------------------
# probes
# ---------------------------------------------------------------------------


def compare_dit_forward(
    ref_model,
    jax_params,
    dit_cfg,
    *,
    f=5,
    lh=8,
    lw=8,
    la=40,
    seed=0,
    video_sample_n_frames=None,
    honor_vocal_k_lens=False,
    vocal_cfg_tile=True,
):
    """One CFG-triple DiT forward on identical random inputs.

    `honor_vocal_k_lens=False` by default: a reference run WITHOUT
    flash-attn (any CPU box, and the shipped 1B GPU path) drops the vocal
    padding masks in torch SDPA — our compat switch replicates that so the
    comparison is apples-to-apples (models/dit.py docstring).

    Returns dict of max-abs / relative diffs."""
    import torch
    import jax.numpy as jnp
    from stableavatar_tpu.models.dit import dit_forward

    if video_sample_n_frames is None:
        video_sample_n_frames = (f - 1) * 4 + 1
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((3, 16, f, lh, lw)).astype(np.float32)
    t = np.full((3,), 500.0, np.float32)
    text = rng.standard_normal((3, dit_cfg.text_len, dit_cfg.text_dim)).astype(np.float32)
    clip_fea = rng.standard_normal((3, 257, dit_cfg.clip_dim)).astype(np.float32)
    y = rng.standard_normal((3, 20, f, lh, lw)).astype(np.float32)
    # CFG triple [zeros, v, v] as the pipeline builds it
    # (`wan_inference_long_pipeline.py:736-737`) — the reference DiT branches
    # on batch>1 and uses only the last row (`:1004-1007`)
    v1 = rng.standard_normal((1, la, dit_cfg.audio_in_dim)).astype(np.float32)
    vocal = np.concatenate([np.zeros_like(v1), v1, v1], axis=0)

    with torch.no_grad():
        seq_len = f * (lh // 2) * (lw // 2)
        ref_kw = {}
        # the 14B module has NO video_sample_n_frames parameter — it
        # hardcodes 81 frames / 21 latent frames in its forward
        # (`wan_fantasy_transformer3d_14B.py:569,1008`)
        import inspect

        if "video_sample_n_frames" in inspect.signature(ref_model.forward).parameters:
            ref_kw["video_sample_n_frames"] = video_sample_n_frames
        ref_out = ref_model(
            torch.from_numpy(x),
            torch.from_numpy(t),
            context=torch.from_numpy(text),
            seq_len=seq_len,
            clip_fea=torch.from_numpy(clip_fea),
            y=torch.from_numpy(y),
            vocal_embeddings=torch.from_numpy(vocal),
            **ref_kw,
        )
        ref_np = ref_out[0].float().numpy() if isinstance(ref_out, tuple) else ref_out.float().numpy()

    ours = np.asarray(
        dit_forward(
            jax_params, dit_cfg, jnp.asarray(x), jnp.asarray(t), jnp.asarray(text),
            jnp.asarray(clip_fea), jnp.asarray(y), jnp.asarray(vocal),
            video_sample_n_frames=video_sample_n_frames,
            vocal_cfg_tile=vocal_cfg_tile,
            honor_vocal_k_lens=honor_vocal_k_lens,
        ),
        np.float32,
    )
    diff = np.abs(ours - ref_np)
    denom = max(float(np.abs(ref_np).max()), 1e-9)
    return {
        "max_abs": float(diff.max()),
        "max_rel": float(diff.max() / denom),
        "mean_abs": float(diff.mean()),
        "ref_scale": denom,
    }


def compare_pipelines(
    ref_pipe,
    tpu_models,
    *,
    image,  # [H, W, 3] uint8
    waveform,  # [S] float32 16 kHz
    prompt: str,
    negative_prompt: str = "",
    steps: int = 10,
    size: int = 512,
    seed: int = 42,
    text_scale: float = 3.0,
    audio_scale: float = 5.0,
    overlap: int = 15,
):
    """Run both long pipelines with identical injected noise; report per-step
    latent max-abs diffs and final/decoded diffs."""
    import torch
    from PIL import Image

    from stableavatar_tpu.pipelines.long import generate_long

    h = w = size
    spatial = tpu_models.vae_cfg.spatial_compression_ratio
    temporal = tpu_models.vae_cfg.temporal_compression_ratio
    total_frames = int(len(waveform) / (16000 / 25))
    infer_length = (total_frames - 1) // temporal + 1
    shape = (1, tpu_models.vae_cfg.z_dim, infer_length, h // spatial, w // spatial)
    noise = np.random.default_rng(seed).standard_normal(shape).astype(np.float32)

    # --- reference run with per-step capture (wrap scheduler.step) ---
    ref_steps = {}
    orig_step = ref_pipe.scheduler.step

    def record_step(model_output, timestep, sample, **kw):
        out = orig_step(model_output, timestep, sample, **kw)
        t = float(timestep)
        ref_steps.setdefault(t, []).append(out[0].detach().float().cpu().numpy())
        return out

    ref_pipe.scheduler.step = record_step
    try:
        from wan.utils.utils import get_image_to_video_latent

        pil = Image.fromarray(image)
        video, mask_video, _ = get_image_to_video_latent(
            [pil], None, video_length=(infer_length - 1) * temporal + 1,
            sample_size=[h, w],
        )
        ref_out = ref_pipe(
            prompt,
            num_frames=81,
            negative_prompt=negative_prompt,
            height=h,
            width=w,
            video=video,
            mask_video=mask_video,
            generator=torch.Generator().manual_seed(seed),
            latents=torch.from_numpy(noise),
            num_inference_steps=steps,
            text_guide_scale=text_scale,
            audio_guide_scale=audio_scale,
            vocal_input_values=torch.from_numpy(waveform),
            fps=25,
            sr=16000,
            seed=seed,
            overlap_window_length=overlap,
            clip_length=81,
        )
    finally:
        ref_pipe.scheduler.step = orig_step

    # --- our run with identical noise ---
    ours_steps = {}

    def cb(i, latents_all):
        ours_steps[i] = np.asarray(latents_all, np.float32)

    img = (image.astype(np.float32) / 255.0 - 0.5) * 2.0
    out = generate_long(
        tpu_models,
        ref_image=img.transpose(2, 0, 1)[None],
        vocal_waveform=waveform,
        prompt=prompt,
        negative_prompt=negative_prompt,
        num_inference_steps=steps,
        text_guide_scale=text_scale,
        audio_guide_scale=audio_scale,
        overlap_window_length=overlap,
        seed=seed,
        initial_latents=noise,
        step_callback=cb,
    )

    report = {"per_step_max_abs": {}}
    ts = sorted(ref_steps.keys(), reverse=True)
    for i, t in enumerate(ts):
        if i in ours_steps:
            # reference records per-window slices; compare against the
            # corresponding region of our full-latent snapshot
            ref_last = ref_steps[t][-1]
            ours_lat = ours_steps[i][:, :, -ref_last.shape[2]:]
            report["per_step_max_abs"][f"step{i}_t{t:.1f}"] = float(
                np.abs(ours_lat - ref_last).max()
            )
    ref_video = np.asarray(ref_out.videos if hasattr(ref_out, "videos") else ref_out[0])
    report["final_video_max_abs"] = float(
        np.abs(out.videos - ref_video).max()
    ) if ref_video.shape == out.videos.shape else None
    report["ref_video_shape"] = list(np.shape(ref_video))
    report["tpu_video_shape"] = list(np.shape(out.videos))
    return report


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("mode", choices=["forward", "pipeline"])
    p.add_argument("--ckpt_root", required=True)
    p.add_argument("--image")
    p.add_argument("--audio")
    p.add_argument("--prompt", default="The protagonist is talking")
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args(argv)

    if args.mode == "forward":
        ref_model = load_reference_dit(args.ckpt_root)
        models = load_tpu_stack(args.ckpt_root)
        report = compare_dit_forward(ref_model, models.dit_params, models.dit_cfg)
    else:
        import cv2

        from stableavatar_tpu.utils.media import load_wav

        ref_pipe = load_reference_pipeline(args.ckpt_root)
        models = load_tpu_stack(args.ckpt_root)
        img = cv2.cvtColor(cv2.imread(args.image), cv2.COLOR_BGR2RGB)
        img = cv2.resize(img, (args.size, args.size))
        wav, _ = load_wav(args.audio, 16000)
        report = compare_pipelines(
            ref_pipe, models, image=img, waveform=wav, prompt=args.prompt,
            steps=args.steps, size=args.size, seed=args.seed,
        )
    import json

    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()

"""Typed configuration tree for every model family in the framework.

Replaces the reference's four-layer config system (argparse + OmegaConf YAML +
Accelerate/DeepSpeed files + EasyDict model zoo — see reference
`deepspeed_config/wan2.1/wan_civitai.yaml`, `wan/configs/wan_t2v_1_3B.py:20-29`)
with one set of frozen dataclasses.  A YAML loader that honors the reference
key names lives in `stableavatar_tpu/utils/yaml_config.py`.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class DiTConfig:
    """Wan2.1 DiT backbone config.

    Reference: `wan/models/wan_fantasy_transformer3d_1B.py:752-872` and
    `wan/configs/wan_t2v_1_3B.py:20-29` / `wan_t2v_14B.py:20-29`.
    """

    model_type: str = "i2v"
    patch_size: Tuple[int, int, int] = (1, 2, 2)
    text_len: int = 512
    in_dim: int = 36          # 16 latent + 20 cond (4 mask + 16 masked-video latents)
    dim: int = 1536
    ffn_dim: int = 8960
    freq_dim: int = 256
    text_dim: int = 4096
    out_dim: int = 16
    num_heads: int = 12
    num_layers: int = 30
    qk_norm: bool = True
    cross_attn_norm: bool = True
    eps: float = 1e-6
    clip_tokens: int = 257    # CLIP image tokens prepended to text context
    clip_dim: int = 1280      # CLIP ViT-H feature dim
    rope_max_seq: int = 1024
    # RIFLEx length-extrapolation RoPE (reference enable_riflex,
    # `wan_fantasy_transformer3d_1B.py:890-906`; wired-not-enabled by any
    # reference entry point — opt-in here via --enable_riflex)
    riflex_k: Optional[int] = None
    riflex_L_test: Optional[int] = None
    riflex_scale: Optional[float] = None
    # vocal projector (audio adapter)
    audio_in_dim: int = 768         # wav2vec2-base hidden size
    audio_proj_dim: int = 1536      # vocal token dim fed into k_vocal/v_vocal
    audio_proj_hidden: Optional[int] = None  # 14B uses a 2-stage 768->2048->5120 proj
    vocal_num_layers: int = 2
    vocal_num_heads: int = 8

    @property
    def head_dim(self) -> int:
        return self.dim // self.num_heads


# 1.3B: dim 1536 / ffn 8960 / 12 heads / 30 layers (wan_t2v_1_3B.py:20-28)
WAN_1_3B = DiTConfig()

# 14B: dim 5120 / ffn 13824 / 40 heads / 40 layers (wan_t2v_14B.py:20-28);
# vocal projector is a 2-stage 768 -> 2048 -> 5120 projection
# (vocal_projector_fantasy_14B.py:388-397).
WAN_14B = DiTConfig(
    dim=5120,
    ffn_dim=13824,
    num_heads=40,
    num_layers=40,
    audio_proj_dim=5120,
    audio_proj_hidden=2048,
)


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    """Causal 3D VAE ("Wan2.1_VAE") config.

    Reference: `wan/models/wan_vae.py:598-644`.
    """

    dim: int = 96
    z_dim: int = 16
    dim_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attn_scales: Tuple[float, ...] = ()
    temporal_downsample: Tuple[bool, ...] = (False, True, True)
    temporal_compression_ratio: int = 4
    spatial_compression_ratio: int = 8
    # Per-channel latent normalization constants (wan_vae.py:630-639).
    latent_mean: Tuple[float, ...] = (
        -0.7571, -0.7089, -0.9113, 0.1075, -0.1745, 0.9653, -0.1517, 1.5508,
        0.4134, -0.0715, 0.5517, -0.3632, -0.1922, -0.9497, 0.2503, -0.2921,
    )
    latent_std: Tuple[float, ...] = (
        2.8184, 1.4541, 2.3275, 2.6558, 1.2196, 1.7708, 2.6052, 2.0743,
        3.2687, 2.1526, 2.8652, 1.5579, 1.6382, 1.1253, 2.8251, 1.9160,
    )


@dataclasses.dataclass(frozen=True)
class T5Config:
    """umT5-xxl encoder config (reference `wan_civitai.yaml:18-27`)."""

    vocab: int = 256384
    dim: int = 4096
    dim_attn: int = 4096
    dim_ffn: int = 10240
    num_heads: int = 64
    num_layers: int = 24
    num_buckets: int = 32
    shared_pos: bool = False
    text_len: int = 512
    eps: float = 1e-6
    max_dist: int = 128


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    """CLIP XLM-Roberta ViT-H/14 visual tower (reference
    `wan/models/wan_image_encoder.py:503-549`).  Only the visual tower is used
    at runtime; features are taken after all but the final transformer block
    (`use_31_block`, `:297-299`)."""

    embed_dim: int = 1024
    image_size: int = 224
    patch_size: int = 14
    vision_dim: int = 1280
    vision_heads: int = 16
    vision_layers: int = 32
    mlp_ratio: int = 4
    eps: float = 1e-5
    # normalization constants applied to input images
    image_mean: Tuple[float, ...] = (0.48145466, 0.4578275, 0.40821073)
    image_std: Tuple[float, ...] = (0.26862954, 0.26130258, 0.27577711)

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2  # 256

    @property
    def num_tokens(self) -> int:
        return self.num_patches + 1  # 257 (cls + patches)


@dataclasses.dataclass(frozen=True)
class Wav2Vec2Config:
    """wav2vec2-base-960h (HF `Wav2Vec2Model`) — used as the audio feature
    extractor (16 kHz waveform -> 768-d hidden states at ~50 tok/s)."""

    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    ffn_dim: int = 3072
    conv_dims: Tuple[int, ...] = (512, 512, 512, 512, 512, 512, 512)
    conv_strides: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    conv_kernels: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    do_normalize: bool = True
    eps: float = 1e-5

    def output_length(self, num_samples: int) -> int:
        n = num_samples
        for k, s in zip(self.conv_kernels, self.conv_strides):
            n = (n - k) // s + 1
        return n


@dataclasses.dataclass(frozen=True)
class SchedulerConfig:
    """FlowMatch Euler scheduler config (reference `wan_civitai.yaml:28-35`)."""

    num_train_timesteps: int = 1000
    shift: float = 5.0
    use_dynamic_shifting: bool = False
    base_shift: float = 0.5
    max_shift: float = 1.15
    base_image_seq_len: int = 256
    max_image_seq_len: int = 4096


def tiny_debug_configs():
    """Self-consistent miniature config set for checkpoint-free smoke runs.

    Enabled in the inference CLI with STABLEAVATAR_TINY=1: every model is a
    few layers of width ~32, so the full CLI path (flags -> models ->
    generate_long -> mp4) drives end to end on a CPU in seconds.  Outputs
    are random-weight noise — this exists to exercise the plumbing, not to
    generate video.  Mirrors the tiny e2e fixtures in tests/test_pipeline.py.
    """
    dit = DiTConfig(
        dim=32, ffn_dim=64, freq_dim=16, text_dim=32,
        in_dim=12,  # z(4) + mask(4) + masked latents(4)
        out_dim=4, num_heads=4, num_layers=2, text_len=16,
        clip_tokens=5, clip_dim=32, audio_in_dim=16, audio_proj_dim=32,
        vocal_num_heads=4,
    )
    vae = VAEConfig(
        dim=4, z_dim=4, dim_mult=(1, 2, 2), num_res_blocks=1,
        temporal_downsample=(True, True), temporal_compression_ratio=4,
        spatial_compression_ratio=4,
        latent_mean=(0.0,) * 4, latent_std=(1.0,) * 4,
    )
    t5 = T5Config(vocab=64, dim=32, dim_attn=32, dim_ffn=64, num_heads=4,
                  num_layers=2, text_len=16)
    clip = CLIPConfig(image_size=28, patch_size=14, vision_dim=32,
                      vision_heads=2, vision_layers=2)
    w2v = Wav2Vec2Config(hidden_size=16, num_layers=2, num_heads=2,
                         ffn_dim=32, conv_dims=(8,) * 7,
                         num_conv_pos_embeddings=16,
                         num_conv_pos_embedding_groups=4)
    return dit, vae, t5, clip, w2v

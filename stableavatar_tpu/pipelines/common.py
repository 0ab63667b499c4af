"""Shared pipeline machinery: model bundle, conditioning preparation, CFG.

Mirrors the conditioning construction of the reference pipelines
(`wan_inference_long_pipeline.py:665-700`): CLIP features of the reference
image, VAE latents of the first-frame-tiled video, and the 4-channel
first-frame mask packed with the masked-video latents into `y`.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from stableavatar_tpu.config import (
    CLIPConfig,
    DiTConfig,
    T5Config,
    VAEConfig,
    Wav2Vec2Config,
)
from stableavatar_tpu.models.clip import clip_visual_forward_jit as clip_visual_forward, preprocess_reference_image
from stableavatar_tpu.models.t5 import t5_encode_jit as t5_encode
from stableavatar_tpu.models.vae import encode_video
from stableavatar_tpu.models.wav2vec import normalize_waveform, wav2vec2_forward_jit as wav2vec2_forward


@dataclasses.dataclass
class WanModels:
    """All model params + configs for the generation stack."""

    dit_params: Any
    dit_cfg: DiTConfig
    vae_params: Any
    vae_cfg: VAEConfig = VAEConfig()
    t5_params: Any = None
    t5_cfg: T5Config = T5Config()
    clip_params: Any = None
    clip_cfg: CLIPConfig = CLIPConfig()
    wav2vec_params: Any = None
    wav2vec_cfg: Wav2Vec2Config = Wav2Vec2Config()
    tokenizer: Optional[Callable] = None  # callable(str) -> (ids, mask) np arrays
    teacache: Any = None  # optional TeaCache instance (models/teacache.py)
    # inference fast path (utils/fastpath.py): dit_params must then be
    # prepared by prepare_fast_params (split-pair q/k layout, W8A8 linears)
    rope_split: bool = False
    attn_quant: str = "none"
    attn_impl: str = "ulysses"  # "ring" for K/V-rotating long-context SP
    # False replicates the shipped reference numerics: the 1B reference
    # force-disables flash-attn (`wan_fantasy_transformer3d_1B.py:45-46`) and
    # torch SDPA drops the vocal padding masks; True (default) honors them
    # (flash-attn semantics, a quality improvement)
    honor_vocal_k_lens: bool = True
    # Pre-encoded CFG text context [3, text_len, text_dim].  Set when the
    # loader had to encode eagerly and free the T5 params (no CPU backend to
    # offload onto — the axon tunnel registers only 'axon'); t5_params is
    # then None and callers must use this instead of encode_prompts.
    text_ctx: Any = None
    # Sequential (host-streamed) offload: a models.streaming.StreamedDiT
    # whose block weights live in host RAM and stream through a
    # double-buffered HBM slot — the TPU analog of the reference's
    # `sequential_cpu_offload` (`inference.py:513-524`), for models bigger
    # than HBM (14B on a 16 GB v5e).  When set, generate_long uses a
    # host-driven per-window loop instead of the jitted sweep.
    streamed_dit: Any = None


def encode_prompt_ids(models: WanModels, ids: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """T5-encode tokenized prompts and zero out padding, returning fixed
    [B, text_len, text_dim].

    The reference trims each row to its true length then re-pads with zeros
    before the DiT text MLP (`wan_inference_long_pipeline.py:269-278`,
    `wan_fantasy_transformer3d_1B.py:994-999`) — equivalent to masking the
    padded positions to zero at fixed length (static shapes for jit).
    """
    # run on whatever device holds the T5 params: with --t5_cpu (or the
    # model_cpu_offload analog) umT5-xxl lives in host RAM and encodes on
    # the CPU backend — 11+ GB of HBM stays free for the DiT/VAE
    import jax

    leaves = jax.tree.leaves(models.t5_params)
    t5_dev = getattr(leaves[0], "devices", lambda: set())()
    t5_dev = next(iter(t5_dev), None)
    if t5_dev is not None and t5_dev.platform != jax.default_backend():
        ids_d = jax.device_put(ids, t5_dev)
        mask_d = jax.device_put(mask, t5_dev)
        emb = t5_encode(models.t5_params, models.t5_cfg, ids_d, mask_d)
        emb = emb * mask_d[..., None].astype(emb.dtype)
        # local_devices: under multi-host, jax.devices() is the global list and
        # process k may not address jax.devices()[0]
        return jax.device_put(np.asarray(emb), jax.local_devices()[0])
    emb = t5_encode(models.t5_params, models.t5_cfg, ids, mask)
    return emb * mask[..., None].astype(emb.dtype)


def stack_cfg_ids(tokenizer, prompt: str, negative_prompt: str = ""):
    """Tokenize into the long-pipeline CFG stack [neg, neg, pos]
    (`wan_inference_long_pipeline.py:636`); returns (ids, mask) [3, L]."""
    ids_p, mask_p = tokenizer(prompt)
    ids_n, mask_n = tokenizer(negative_prompt)
    ids = jnp.asarray(np.stack([ids_n, ids_n, ids_p]))
    mask = jnp.asarray(np.stack([mask_n, mask_n, mask_p]))
    return ids, mask


def encode_prompts(models: WanModels, prompt: str, negative_prompt: str = ""):
    """Returns the CFG text context [3, text_len, text_dim]: [neg, neg, pos]
    for the long pipeline (`wan_inference_long_pipeline.py:636`)."""
    assert models.tokenizer is not None, "pass pre-encoded text when no tokenizer"
    ids, mask = stack_cfg_ids(models.tokenizer, prompt, negative_prompt)
    return encode_prompt_ids(models, ids, mask)


def prepare_conditioning(
    models: WanModels,
    ref_image: jnp.ndarray,  # [1, 3, H, W] in [-1, 1]
    clip_length: int,
    cfg_batch: int = 3,
):
    """Returns (clip_context [cfg, 257, 1280], y [cfg, 20, Tl, h, w]).

    y = concat([first-frame mask 4ch, masked-video latents 16ch]) exactly as
    `wan_inference_long_pipeline.py:679-700`.
    """
    h_img, w_img = ref_image.shape[-2:]
    clip_in = preprocess_reference_image(ref_image, models.clip_cfg)
    clip_ctx = clip_visual_forward(models.clip_params, models.clip_cfg, clip_in)
    clip_ctx = jnp.concatenate([clip_ctx] * cfg_batch, axis=0)

    # first frame + zero padding frames -> streaming VAE encode
    video = jnp.concatenate(
        [
            ref_image[:, :, None],  # [1, 3, 1, H, W]
            jnp.zeros((1, 3, clip_length - 1, h_img, w_img), ref_image.dtype),
        ],
        axis=2,
    )
    masked_latents = encode_video(models.vae_params, video, models.vae_cfg)
    tl, lh, lw = masked_latents.shape[2:]

    msk = jnp.zeros((1, clip_length, lh, lw))
    msk = msk.at[:, 0].set(1.0)
    msk = jnp.concatenate([jnp.repeat(msk[:, 0:1], 4, axis=1), msk[:, 1:]], axis=1)
    msk = msk.reshape(1, msk.shape[1] // 4, 4, lh, lw).transpose(0, 2, 1, 3, 4)

    y = jnp.concatenate([msk.astype(masked_latents.dtype), masked_latents], axis=1)
    y = jnp.concatenate([y] * cfg_batch, axis=0)
    return clip_ctx, y


def extract_vocal_features(
    models: WanModels, waveform: np.ndarray, do_normalize: Optional[bool] = None
) -> jnp.ndarray:
    """Raw 16 kHz samples -> wav2vec hidden states [1, L, 768] (the reference
    runs Wav2Vec2Processor + Wav2Vec2Model per window,
    `wan_inference_long_pipeline.py:727-729`)."""
    wav = jnp.asarray(np.asarray(waveform, dtype=np.float32))[None]
    if do_normalize is None:
        do_normalize = models.wav2vec_cfg.do_normalize
    if do_normalize:
        wav = normalize_waveform(wav)
    return wav2vec2_forward(models.wav2vec_params, models.wav2vec_cfg, wav)


def guidance_combine_long(noise_pred: jnp.ndarray, text_scale: float, audio_scale: float):
    """Long-pipeline dual CFG (`wan_inference_long_pipeline.py:751-753`)."""
    uncond, drop_audio, cond = jnp.split(noise_pred, 3, axis=0)
    return uncond + audio_scale * (drop_audio - uncond) + text_scale * (cond - drop_audio)


def guidance_combine_single(noise_pred: jnp.ndarray, text_scale: float, audio_scale: float):
    """Validation-pipeline dual CFG (`wan_inference_pipeline_fantasy.py:707-708`):
    same arithmetic with the roles of the scales swapped."""
    uncond, drop_audio, cond = jnp.split(noise_pred, 3, axis=0)
    return uncond + text_scale * (drop_audio - uncond) + audio_scale * (cond - drop_audio)

"""End-to-end TPU smoke: full 1.3B pipeline, random weights, short audio.

Exercises the real generation path on the chip — Pallas attention, sliding
windows, overlap blending, streaming VAE decode — and reports wall time per
phase.  Quality is meaningless (random weights); correctness = finite output
of the right shape.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from stableavatar_tpu.config import WAN_1_3B, VAEConfig, T5Config, CLIPConfig, Wav2Vec2Config
from stableavatar_tpu.models.clip import init_clip_visual
from stableavatar_tpu.models.dit import cast_params, init_dit
from stableavatar_tpu.models.t5 import init_t5
from stableavatar_tpu.models.vae import init_vae
from stableavatar_tpu.models.wav2vec import init_wav2vec2
from stableavatar_tpu.pipelines.common import WanModels
from stableavatar_tpu.pipelines.long import generate_long


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    secs = float(sys.argv[3]) if len(sys.argv) > 3 else 5.0
    use_teacache = "--teacache" in sys.argv

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    print("init params...", flush=True)
    # tiny-depth T5 with the real 4096 text_dim (DiT expects text_dim=4096)
    t5_cfg = T5Config(num_layers=2, dim=4096, dim_attn=512, dim_ffn=1024, num_heads=8, vocab=1024)

    teacache = None
    if use_teacache:
        from stableavatar_tpu.models.teacache import TeaCache, get_teacache_coefficients

        teacache = TeaCache(get_teacache_coefficients("wan2.1-t2v-1.3b"), steps, 0.1, 1)

    models = WanModels(
        dit_params=cast_params(init_dit(ks[0], WAN_1_3B), jnp.bfloat16),
        dit_cfg=WAN_1_3B,
        vae_params=cast_params(init_vae(ks[1], VAEConfig()), jnp.bfloat16),
        vae_cfg=VAEConfig(),
        t5_params=cast_params(init_t5(ks[2], t5_cfg), jnp.bfloat16),
        t5_cfg=t5_cfg,
        clip_params=cast_params(init_clip_visual(ks[3], CLIPConfig()), jnp.bfloat16),
        clip_cfg=CLIPConfig(),
        wav2vec_params=cast_params(init_wav2vec2(ks[4], Wav2Vec2Config()), jnp.bfloat16),
        wav2vec_cfg=Wav2Vec2Config(),
        tokenizer=lambda s: (np.ones(512, np.int32), np.ones(512, np.int32)),
        teacache=teacache,
    )

    rng = np.random.default_rng(0)
    ref = rng.uniform(-1, 1, (1, 3, size, size)).astype(np.float32)
    wav = (rng.standard_normal(int(16000 * secs)) * 0.1).astype(np.float32)

    print(f"generate: {steps} steps, {size}x{size}, {secs}s audio, teacache={use_teacache}", flush=True)
    t0 = time.time()
    out = generate_long(
        models,
        ref_image=ref,
        vocal_waveform=wav,
        prompt="test",
        num_inference_steps=steps,
        overlap_window_length=15,
        seed=0,
        output_type=("latent" if "--latent-only" in sys.argv else "numpy"),
    )
    dt = time.time() - t0
    if out.videos is None:
        lat = np.asarray(out.latents)
        print(f"latents done in {dt:.1f}s: {lat.shape} finite={np.isfinite(lat).all()}", flush=True)
        return
    v = out.videos
    print(f"done in {dt:.1f}s: shape={v.shape} finite={np.isfinite(v).all()} "
          f"range=[{v.min():.3f},{v.max():.3f}]", flush=True)
    if teacache is not None:
        print(f"teacache: skipped {teacache.skipped_calls}/{teacache.total_calls} calls")


if __name__ == "__main__":
    main()

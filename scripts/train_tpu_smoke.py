"""Training-step smoke on the real chip: 1.3B DiT, realistic token count.

One jitted flow-matching train step (remat through the block scan, Pallas
flash fwd+bwd, anomaly-aware clipping, 8-bit Adam) at 49 frames x 256x256
(13 latent frames x 1024 tokens) — the largest per-chip configuration that
fits 16 GB HBM with optimizer state; full 81x512 runs under fsdp sharding.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from stableavatar_tpu.config import WAN_1_3B
from stableavatar_tpu.models.dit import init_dit
from stableavatar_tpu.train.trainer import (
    TrainConfig,
    make_optimizer,
    make_train_step,
    train_sigmas,
)


def main():
    frames = int(sys.argv[1]) if len(sys.argv) > 1 else 49
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 256

    cfg = WAN_1_3B
    tc = TrainConfig(remat=True, video_sample_n_frames=frames, use_8bit_adam=True)

    f = (frames - 1) // 4 + 1
    h = w = size // 8
    la = 101

    print(f"init 1.3B params; latents [{f},{h},{w}] = {f*h*w//4} tokens", flush=True)
    params = init_dit(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 and x.ndim >= 2
        else x,
        params,
    )
    tx = make_optimizer(tc)
    opt_state = tx.init(params)

    rng = np.random.default_rng(0)
    batch = {
        "latents": jnp.asarray(rng.standard_normal((1, 16, f, h, w)), jnp.float32),
        "inpaint_latents": jnp.asarray(rng.standard_normal((1, 20, f, h, w)), jnp.float32),
        "prompt_embeds": jnp.asarray(rng.standard_normal((1, cfg.text_len, cfg.text_dim)), jnp.bfloat16),
        "clip_fea": jnp.asarray(rng.standard_normal((1, cfg.clip_tokens, cfg.clip_dim)), jnp.bfloat16),
        "vocal_embeddings": jnp.asarray(rng.standard_normal((1, la, cfg.audio_in_dim)), jnp.bfloat16),
        "face_masks": jnp.asarray(rng.uniform(0, 1, (1, 1, f, h, w)), jnp.float32),
        "lip_masks": jnp.asarray(rng.uniform(0, 1, (1, 1, f, h, w)), jnp.float32),
    }

    step_fn = make_train_step(cfg, tc, tx, train_sigmas())
    t0 = time.time()
    params, opt_state, metrics = step_fn(
        params, opt_state, batch, jax.random.PRNGKey(1), jnp.asarray(0)
    )
    loss = float(metrics["loss"])
    print(f"step1 (compile) {time.time()-t0:.1f}s loss={loss:.4f}", flush=True)

    t0 = time.time()
    params, opt_state, metrics = step_fn(
        params, opt_state, batch, jax.random.PRNGKey(2), jnp.asarray(1)
    )
    loss = float(metrics["loss"])
    dt = time.time() - t0
    print(f"step2 {dt:.2f}s loss={loss:.4f} gnorm={float(metrics['grad_norm']):.4f}", flush=True)


if __name__ == "__main__":
    main()

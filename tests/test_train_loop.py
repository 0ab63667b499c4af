"""Training loop driver: batch encoding, checkpoint rotation/resume, full
tiny train() run with validation hook."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stableavatar_tpu.train.trainer import TrainConfig


@pytest.fixture(scope="module")
def tiny_models():
    from tests.test_pipeline import (
        CLIP_E2E,
        DIT_E2E,
        T5_E2E,
        VAE_E2E,
        W2V_E2E,
    )
    from stableavatar_tpu.models.clip import init_clip_visual
    from stableavatar_tpu.models.dit import init_dit
    from stableavatar_tpu.models.t5 import init_t5
    from stableavatar_tpu.models.vae import init_vae
    from stableavatar_tpu.models.wav2vec import init_wav2vec2
    from stableavatar_tpu.pipelines.common import WanModels

    key = jax.random.PRNGKey(7)
    ks = jax.random.split(key, 5)

    def tok(prompt):
        ids = np.ones(16, dtype=np.int32)
        mask = np.ones(16, dtype=np.int32)
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


def _raw_batches(n, b=1, frames=9, size=32):
    rng = np.random.default_rng(0)
    for _ in range(n):
        pixels = rng.uniform(-1, 1, (b, 3, frames, size, size)).astype(np.float32)
        masks = np.zeros((b, frames, 1, size, size), np.float32)
        masks[:, 1:] = 1.0
        yield {
            "pixel_values": pixels,
            "masked_pixel_values": pixels * (1 - masks.transpose(0, 2, 1, 3, 4)),
            "pixel_value_masks": masks,
            "reference_image": pixels[:, :, 0:1],
            "tgt_face_masks": np.ones((b, 1, frames, size, size), np.float32),
            "tgt_lip_masks": np.ones((b, 1, frames, size, size), np.float32),
            "vocal_input_values": rng.standard_normal((b, frames * 640)).astype(np.float32) * 0.1,
            "text_prompt": ["The protagonist is talking"] * b,
        }


def test_train_loop_end_to_end(tiny_models, tmp_path):
    from stableavatar_tpu.train.loop import train

    tc = TrainConfig(remat=False, video_sample_n_frames=9, learning_rate=1e-4)
    out_dir = str(tmp_path / "run")
    params, opt_state, history = train(
        tiny_models,
        _raw_batches(4),
        tc,
        output_dir=out_dir,
        max_train_steps=3,
        checkpointing_steps=2,
        checkpoints_total_limit=1,
        resume_from_checkpoint=None,
        log_every=1,
    )
    assert len(history) == 3
    assert all(np.isfinite(h["loss"]) for h in history)
    # rotation: only the latest checkpoint survives
    ckpts = [d for d in os.listdir(out_dir) if d.startswith("checkpoint-")]
    assert ckpts == ["checkpoint-2"]
    # metrics JSONL written
    assert any(f.endswith(".metrics.jsonl") for f in os.listdir(out_dir))


def test_checkpoint_manager_rotation_and_resume(tmp_path):
    from stableavatar_tpu.train.loop import CheckpointManager

    cm = CheckpointManager(str(tmp_path), total_limit=2)
    params = {"w": jnp.arange(4.0)}
    opt = {"mu": jnp.zeros(4)}
    for step in (10, 20, 30):
        cm.save(step, jax.tree.map(lambda x: x + step, params), opt)

    kept = sorted(os.listdir(str(tmp_path)))
    assert kept == ["checkpoint-20", "checkpoint-30"]
    assert cm.latest().endswith("checkpoint-30")

    restored = cm.restore({"params": params, "opt_state": opt, "step": jnp.asarray(0)})
    assert int(restored["step"]) == 30
    np.testing.assert_allclose(np.asarray(restored["params"]["w"]), np.arange(4.0) + 30)

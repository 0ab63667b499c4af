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


def test_conditioning_dropouts_fire_with_reference_probabilities():
    """encode_batch applies the three reference conditioning dropouts at the
    right rates (train_1B_square.py:1093-1100 t2v_flag, :1193-1194 audio,
    :1195-1197 clip-level flag).  Heavy encoders are stubbed; this tests the
    dropout logic only."""
    from unittest import mock

    from stableavatar_tpu.pipelines.common import WanModels
    from stableavatar_tpu.config import DiTConfig
    from stableavatar_tpu.train.loop import encode_batch

    b, f, hw = 2, 5, 8
    batch = {
        "pixel_values": np.zeros((b, 3, f, hw, hw), np.float32),
        "masked_pixel_values": np.zeros((b, 3, f, hw, hw), np.float32),
        # row 0: all-ones mask (t2v candidate); row 1: partial mask
        # layout [B, F, C, H, W] (dataset get_random_mask convention)
        "pixel_value_masks": np.stack(
            [np.ones((f, 1, hw, hw), np.float32),
             np.zeros((f, 1, hw, hw), np.float32)]
        ),
        "reference_image": np.zeros((b, 3, 1, hw, hw), np.float32),
        "vocal_input_values": np.ones((b, 320), np.float32),
        "prompt_embeds": np.zeros((b, 16, 32), np.float32),
        "tgt_face_masks": np.ones((b, 1, f, hw, hw), np.float32),
        "tgt_lip_masks": np.ones((b, 1, f, hw, hw), np.float32),
    }

    class _W2VCfg:
        do_normalize = False

    models = WanModels(
        dit_params=None, dit_cfg=DiTConfig(dim=32, ffn_dim=64, num_heads=2,
                                           num_layers=1),
        vae_params=None, wav2vec_cfg=_W2VCfg(),
    )

    fake_lat = jnp.ones((b, 16, (f - 1) // 4 + 1, hw // 8, hw // 8))

    def fake_encode_video(p, x, k, cfg):
        return fake_lat

    def fake_clip(p, cfg, x):
        return jnp.zeros((b, 257, 16))

    def fake_w2v(p, cfg, w):
        return jnp.ones((b, 10, 8))

    rng = np.random.default_rng(0)
    n = 400
    t2v_zeroed = audio_dropped = clip_level = 0
    with mock.patch("stableavatar_tpu.models.vae.encode_video_sample", fake_encode_video), \
         mock.patch("stableavatar_tpu.models.clip.clip_visual_forward_jit", fake_clip), \
         mock.patch("stableavatar_tpu.models.clip.preprocess_reference_image",
                    lambda x, cfg: x), \
         mock.patch("stableavatar_tpu.models.wav2vec.wav2vec2_forward_jit", fake_w2v):
        for _ in range(n):
            enc = encode_batch(models, batch, rng)
            inp = np.asarray(enc["inpaint_latents"])
            # mask channels are INVERTED (1 - mask, train_1B_square.py:1138):
            # row 1's all-zeros raw mask -> channel all ones (unless t2v
            # zeroed — but row 1 is never a t2v candidate)
            assert inp[1, :4].min() > 0.999  # ~1-ulp linear-resize fuzz
            # row 0 (all-ones raw mask -> channel zeros) is the t2v
            # candidate: detect zeroing on its LATENT channels (fake
            # encoder returns ones)
            if inp[0, 4:].max() == 0.0:
                t2v_zeroed += 1
            if np.asarray(enc["vocal_embeddings"]).max() == 0.0:
                audio_dropped += 1
            if enc["is_clip_level_modeling"]:
                clip_level += 1

    # binomial 3-sigma bounds
    assert 0.9 * n - 3 * np.sqrt(n * 0.09) < t2v_zeroed < 0.9 * n + 3 * np.sqrt(n * 0.09)
    assert 0.1 * n - 3 * np.sqrt(n * 0.09) < audio_dropped < 0.1 * n + 3 * np.sqrt(n * 0.09)
    assert 0.3 * n - 3 * np.sqrt(n * 0.21) < clip_level < 0.3 * n + 3 * np.sqrt(n * 0.21)

    # train_mode="normal" disables t2v zeroing entirely
    with mock.patch("stableavatar_tpu.models.vae.encode_video_sample", fake_encode_video), \
         mock.patch("stableavatar_tpu.models.clip.clip_visual_forward_jit", fake_clip), \
         mock.patch("stableavatar_tpu.models.clip.preprocess_reference_image",
                    lambda x, cfg: x), \
         mock.patch("stableavatar_tpu.models.wav2vec.wav2vec2_forward_jit", fake_w2v):
        for _ in range(50):
            enc = encode_batch(models, batch, rng, train_mode="normal")
            # latent channels stay intact (mask channel of row 0 is zeros
            # by the 1-mask inversion, so check the encoder channels)
            assert np.asarray(enc["inpaint_latents"])[0, 4:].max() == 1.0


def test_async_checkpointing_and_rotation(tmp_path):
    """Async saves finalize atomically, rotation skips in-flight tmp dirs,
    and the restored tree is exact."""
    from stableavatar_tpu.train.loop import CheckpointManager

    out = str(tmp_path / "async_ckpt")
    os.makedirs(out)
    cm = CheckpointManager(out, total_limit=1)
    p1 = {"w": jnp.arange(8, dtype=jnp.float32)}
    o1 = {"m": jnp.zeros(8)}
    cm.save(1, p1, o1, wait=False)
    p2 = {"w": jnp.arange(8, dtype=jnp.float32) * 2}
    cm.save(2, p2, o1, wait=False)  # joins save 1 first
    cm.wait()
    assert os.path.basename(cm.latest()) == "checkpoint-2"
    # rotation kept only the newest finished checkpoint
    names = [d for d in os.listdir(out) if d.startswith("checkpoint-")]
    assert names == ["checkpoint-2"], names
    restored = cm.restore({"params": p2, "opt_state": o1, "step": jnp.asarray(0)})
    np.testing.assert_array_equal(restored["params"]["w"], np.asarray(p2["w"]))
    assert int(restored["step"]) == 2


def test_preemption_kill_and_resume(tiny_models, tmp_path):
    """SIGTERM mid-run -> synchronous checkpoint at the current step + clean
    exit; a second train() with resume_from_checkpoint='latest' continues
    from that exact step (fault tolerance the reference does not have)."""
    import signal

    from stableavatar_tpu.train.loop import train

    tc = TrainConfig(remat=False, video_sample_n_frames=9, learning_rate=1e-4)
    out_dir = str(tmp_path / "preempt_run")

    def batches_with_preemption(n, kill_at):
        for i, b in enumerate(_raw_batches(n)):
            if i == kill_at:
                os.kill(os.getpid(), signal.SIGTERM)  # delivered before yield returns
            yield b

    params1, _, _ = train(
        tiny_models,
        batches_with_preemption(6, kill_at=2),
        tc,
        output_dir=out_dir,
        max_train_steps=6,
        checkpointing_steps=100,  # never reached on schedule
        log_every=1,
        resume_from_checkpoint=None,
    )
    # the preemption save landed at step 3 (signal during batch index 2)
    ckpts = [d for d in os.listdir(out_dir) if d.startswith("checkpoint-")]
    assert ckpts == ["checkpoint-3"], ckpts

    params2, _, history = train(
        tiny_models,
        _raw_batches(6),
        tc,
        output_dir=out_dir,
        max_train_steps=5,
        checkpointing_steps=100,
        log_every=1,
        resume_from_checkpoint="latest",
    )
    # resumed AT step 3: only steps 4 and 5 ran
    assert [h["step"] for h in history] == [4, 5]


def test_train_mask_channel_matches_inference_convention():
    """The training inpaint mask channel (1 - mask, train_1B_square.py:1138)
    must equal the inference y mask for the image_start_only pattern:
    1 on the (visible) first latent frame's 4 sub-channels, 0 after —
    exactly `prepare_conditioning`'s msk (pipelines/common.py)."""
    from unittest import mock

    from stableavatar_tpu.pipelines.common import WanModels
    from stableavatar_tpu.config import DiTConfig
    from stableavatar_tpu.train.loop import encode_batch

    b, f, hw = 1, 9, 16
    raw = np.ones((b, f, 1, hw, hw), np.float32)
    raw[:, 0] = 0.0  # image_start_only: first frame visible
    batch = {
        "pixel_values": np.zeros((b, 3, f, hw, hw), np.float32),
        "masked_pixel_values": np.zeros((b, 3, f, hw, hw), np.float32),
        "pixel_value_masks": raw,
        "reference_image": np.zeros((b, 3, 1, hw, hw), np.float32),
        "vocal_input_values": np.ones((b, 320), np.float32),
        "prompt_embeds": np.zeros((b, 16, 32), np.float32),
        "tgt_face_masks": np.ones((b, 1, f, hw, hw), np.float32),
        "tgt_lip_masks": np.ones((b, 1, f, hw, hw), np.float32),
    }

    class _W2VCfg:
        do_normalize = False

    models = WanModels(
        dit_params=None,
        dit_cfg=DiTConfig(dim=32, ffn_dim=64, num_heads=2, num_layers=1),
        vae_params=None, wav2vec_cfg=_W2VCfg(),
    )
    tl = (f - 1) // 4 + 1
    fake_lat = jnp.ones((b, 16, tl, hw // 8, hw // 8))

    with mock.patch("stableavatar_tpu.models.vae.encode_video_sample",
                    lambda p, x, k, cfg: fake_lat), \
         mock.patch("stableavatar_tpu.models.clip.clip_visual_forward_jit",
                    lambda p, cfg, x: jnp.zeros((b, 257, 16))), \
         mock.patch("stableavatar_tpu.models.clip.preprocess_reference_image",
                    lambda x, cfg: x), \
         mock.patch("stableavatar_tpu.models.wav2vec.wav2vec2_forward_jit",
                    lambda p, cfg, w: jnp.ones((b, 10, 8))):
        enc = encode_batch(models, batch, np.random.default_rng(0),
                           t2v_zero_prob=0.0)

    ch = np.asarray(enc["inpaint_latents"])[:, :4]  # [B, 4, Tl, lh, lw]
    # linear resize leaves ~1-ulp fuzz on the constant regions
    np.testing.assert_allclose(ch[:, :, 0], np.ones_like(ch[:, :, 0]), atol=1e-6)
    np.testing.assert_allclose(ch[:, :, 1:], np.zeros_like(ch[:, :, 1:]), atol=1e-6)

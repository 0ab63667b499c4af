"""Training loop driver: dataset -> encoders -> jitted train step ->
checkpoint rotation / resume / metrics.

Covers the reference trainer orchestration (`train_1B_square.py:780-1407`,
§3.4 call stack): streaming VAE encode of pixels and masked pixels, mask ->
latent packing (first-frame repeat + 4-group reshape, `:1129-1138`), CLIP/T5/
wav2vec conditioning with dropout, checkpoint save/rotate/resume
(`:1331-1362`, `:1029-1052`), TensorBoard-style metric logging.
"""

from __future__ import annotations

import dataclasses
import os
import shutil
import time
from typing import Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from stableavatar_tpu.pipelines.common import WanModels
from stableavatar_tpu.train.trainer import TrainConfig, make_optimizer, make_train_step, train_sigmas


def encode_batch(models: WanModels, batch: dict, rng: np.random.Generator,
                 audio_dropout_prob: float = 0.1,
                 clip_level_prob: float = 0.3,
                 t2v_zero_prob: float = 0.90,
                 train_mode: str = "inpaint") -> dict:
    """Raw pixel/audio batch -> DiT training inputs (device arrays).

    Conditioning dropouts at the reference call sites:
    - `t2v_flag` (`train_1B_square.py:1093-1100,1145`): samples whose pixel
      mask is ALL ones (nothing to inpaint) get their inpaint latents zeroed
      with probability `t2v_zero_prob` (text/audio-to-video mode), unless
      train_mode == "normal";
    - audio dropout (`:1193-1194`): the whole wav2vec embedding zeroed with
      probability `audio_dropout_prob`;
    - clip-level flag (`:1195-1197`): with probability `clip_level_prob` the
      vocal context attends globally (`is_clip_level_modeling`, returned for
      the train step to pass to `dit_forward`).
    """
    from stableavatar_tpu.models.clip import clip_visual_forward_jit as clip_visual_forward, preprocess_reference_image
    from stableavatar_tpu.models.vae import encode_video_sample
    from stableavatar_tpu.models.wav2vec import normalize_waveform, wav2vec2_forward_jit as wav2vec2_forward
    from stableavatar_tpu.pipelines.common import encode_prompt_ids

    pixels = jnp.asarray(batch["pixel_values"])  # [B, 3, F, H, W]
    b = pixels.shape[0]

    # the reference trainer SAMPLES the posterior (train_1B_square.py:1118),
    # unlike inference which conditions on mu
    k_lat, k_msk = jax.random.split(
        jax.random.PRNGKey(int(rng.integers(2**31))), 2
    )
    latents = encode_video_sample(models.vae_params, pixels, k_lat, models.vae_cfg)

    masked = jnp.asarray(batch["masked_pixel_values"])
    masked_latents = encode_video_sample(
        models.vae_params, masked, k_msk, models.vae_cfg
    )

    # mask -> latent packing (train_1B_square.py:1129-1138): first frame
    # repeated 4x, grouped into 4-channel latent-frame masks, then INVERTED
    # and resized (`resize_mask(1 - pixel_value_masks, latents)`, :1138):
    # the channel is 1 where conditioning pixels are VISIBLE — matching the
    # inference y mask (first-frame=1, `wan_inference_long_pipeline.py:
    # 693-700` / pipelines/common.py:prepare_conditioning)
    raw_masks = np.asarray(batch["pixel_value_masks"])
    m = jnp.asarray(raw_masks)[:, :, 0]  # [B, F, H, W]
    lh, lw = latents.shape[-2:]
    hp, wp = m.shape[-2:]
    m = jnp.concatenate([jnp.repeat(m[:, 0:1], 4, axis=1), m[:, 1:]], axis=1)
    m = m.reshape(b, m.shape[1] // 4, 4, hp, wp).transpose(0, 2, 1, 3, 4)
    m = 1.0 - m
    # reference resize_mask: trilinear, temporal size already matches ->
    # effectively bilinear spatial (half-pixel centers = align_corners=False)
    m = jax.image.resize(m, (*m.shape[:3], lh, lw), method="linear")
    inpaint_latents = jnp.concatenate([m.astype(latents.dtype), masked_latents], axis=1)

    if train_mode != "normal":
        # t2v_flag: all-ones masks drop the inpaint conditioning 90% of the
        # time (train_1B_square.py:1093-1100); applied at :1145
        all_ones = raw_masks.reshape(b, -1).min(axis=1) >= 1.0
        t2v_flag = np.where(
            all_ones & (rng.random(b) < t2v_zero_prob), 0.0, 1.0
        ).astype(np.float32)
        inpaint_latents = inpaint_latents * jnp.asarray(t2v_flag)[
            :, None, None, None, None
        ].astype(inpaint_latents.dtype)

    ref = jnp.asarray(batch["reference_image"])[:, :, 0]  # [B, 3, H, W]
    clip_fea = clip_visual_forward(
        models.clip_params, models.clip_cfg,
        preprocess_reference_image(ref, models.clip_cfg),
    )

    wav = jnp.asarray(batch["vocal_input_values"])  # [B, S]
    if models.wav2vec_cfg.do_normalize:
        wav = normalize_waveform(wav)
    vocal = wav2vec2_forward(models.wav2vec_params, models.wav2vec_cfg, wav)
    if rng.random() < audio_dropout_prob:  # train_1B_square.py:1193-1194
        vocal = jnp.zeros_like(vocal)
    is_clip_level = bool(rng.random() < clip_level_prob)  # :1195-1197

    if models.tokenizer is not None:
        ids, mask = zip(*(models.tokenizer(p) for p in batch["text_prompt"]))
        prompt_embeds = encode_prompt_ids(
            models, jnp.asarray(np.stack(ids)), jnp.asarray(np.stack(mask))
        )
    else:
        prompt_embeds = jnp.asarray(batch["prompt_embeds"])

    def latent_masks(key):
        mm = jnp.asarray(batch[key])[:, 0]  # [B, F, H, W]
        mm = jax.image.resize(
            mm.astype(jnp.float32), (b, latents.shape[2], lh, lw), method="trilinear"
        )
        return mm[:, None]

    return {
        "latents": latents,
        "inpaint_latents": inpaint_latents,
        "prompt_embeds": prompt_embeds,
        "clip_fea": clip_fea,
        "vocal_embeddings": vocal,
        "face_masks": latent_masks("tgt_face_masks"),
        "lip_masks": latent_masks("tgt_lip_masks"),
        # host-side flag (static under jit; two cached compilations)
        "is_clip_level_modeling": is_clip_level,
    }


def _finished_ckpts(output_dir: str):
    """checkpoint-<step> dirs, excluding orbax in-progress tmp dirs
    (`<name>.orbax-checkpoint-tmp-<ts>`) so a preemption mid-write can never
    be resumed from a partial checkpoint."""
    return sorted(
        (
            d
            for d in os.listdir(output_dir)
            if d.startswith("checkpoint-") and "tmp" not in d
        ),
        key=lambda d: int(d.split("-")[1]),
    )


@dataclasses.dataclass
class CheckpointManager:
    """save_state + rotation + latest-resume (reference `:1331-1362`,
    `:1029-1052`), via orbax.

    `save(wait=False)` is ASYNC (exceeds reference parity — it has none):
    orbax's StandardCheckpointer copies device->host synchronously (safe
    with the train step's donated buffers) and streams to disk in the
    background while training continues; the next save/`wait()` joins it.
    Finalization is atomic (orbax tmp-dir + rename), and `latest()` skips
    unfinished tmp dirs, so kill-at-any-point resumes from the last
    COMPLETE checkpoint (tests/test_train_loop.py kill-and-resume)."""

    output_dir: str
    total_limit: Optional[int] = None
    _ckpt: object = None

    def _checkpointer(self):
        if self._ckpt is None:
            import orbax.checkpoint as ocp

            self._ckpt = ocp.StandardCheckpointer()
        return self._ckpt

    def save(self, step: int, params, opt_state, wait: bool = True):
        ckpt = self._checkpointer()
        ckpt.wait_until_finished()  # join any previous async save first
        self._rotate(keep_latest=True)
        path = os.path.join(self.output_dir, f"checkpoint-{step}")
        ckpt.save(
            os.path.abspath(path),
            {"params": params, "opt_state": opt_state, "step": jnp.asarray(step)},
        )
        if wait:
            ckpt.wait_until_finished()
            self._rotate()
        return path

    def wait(self):
        if self._ckpt is not None:
            self._ckpt.wait_until_finished()
            self._rotate()

    def _rotate(self, keep_latest: bool = False):
        if self.total_limit is None or not os.path.isdir(self.output_dir):
            return
        ckpts = _finished_ckpts(self.output_dir)
        # when called before an async save, the newest finished checkpoint
        # must survive until the new one is finalized
        limit = self.total_limit if not keep_latest else max(self.total_limit, 1)
        while len(ckpts) > limit:
            shutil.rmtree(os.path.join(self.output_dir, ckpts.pop(0)))

    def latest(self) -> Optional[str]:
        if not os.path.isdir(self.output_dir):
            return None
        ckpts = _finished_ckpts(self.output_dir)
        return os.path.join(self.output_dir, ckpts[-1]) if ckpts else None

    def restore(self, template):
        from stableavatar_tpu.utils.checkpoint import restore_checkpoint

        path = self.latest()
        if path is None:
            return None
        return restore_checkpoint(path, template)


def log_validation(models: WanModels, validation_cfg: dict, output_dir: str, step: int):
    """In-training validation: run the single-clip pipeline and save an mp4
    (reference `log_validation`, `train_1B_square.py:192-275,1364-1382`)."""
    from stableavatar_tpu.pipelines.single_clip import generate_single_clip
    from stableavatar_tpu.utils.video_io import save_videos_grid

    out = generate_single_clip(
        models,
        ref_image=validation_cfg["ref_image"],
        vocal_waveform=validation_cfg["vocal_waveform"],
        prompt_ids=validation_cfg.get("prompt_ids"),
        negative_prompt_ids=validation_cfg.get("negative_prompt_ids"),
        text_ctx=validation_cfg.get("text_ctx"),
        num_inference_steps=validation_cfg.get("num_inference_steps", 20),
        clip_length=validation_cfg.get("clip_length", 81),
        seed=validation_cfg.get("seed", 42),
    )
    path = os.path.join(output_dir, f"validation_step{step}.mp4")
    save_videos_grid(out.videos, path, fps=validation_cfg.get("fps", 25))
    return path


def train(
    models: WanModels,
    batches: Iterable[dict],
    train_cfg: TrainConfig,
    *,
    output_dir: str = "train_output",
    max_train_steps: int = 1000,
    checkpointing_steps: int = 500,
    checkpoints_total_limit: Optional[int] = 3,
    resume_from_checkpoint: Optional[str] = "latest",
    log_every: int = 10,
    seed: int = 42,
    validation_steps: Optional[int] = None,
    validation_cfg: Optional[dict] = None,
    async_checkpointing: bool = True,
    preemption_signals: tuple = None,
    train_mode: str = "inpaint",  # reference --train_mode ("normal" disables
    # the t2v conditioning dropout, train_1B_square.py:1092)
):
    """Main loop (reference `main()` §3.4).

    Beyond reference parity (it has no fault tolerance, SURVEY §5):
    checkpoints are written asynchronously while training continues, and a
    preemption signal (SIGTERM by default — what TPU preemption notices
    deliver) triggers a synchronous save-and-exit so the run resumes from
    the exact step with `resume_from_checkpoint="latest"`."""
    import signal as _signal
    import threading

    os.makedirs(output_dir, exist_ok=True)
    tx = make_optimizer(train_cfg)
    params = models.dit_params
    opt_state = tx.init(params)
    step = 0

    cm = CheckpointManager(output_dir, checkpoints_total_limit)
    if resume_from_checkpoint == "latest":
        restored = cm.restore({"params": params, "opt_state": opt_state, "step": jnp.asarray(0)})
        if restored is not None:
            params, opt_state = restored["params"], restored["opt_state"]
            step = int(restored["step"])

    step_fn = make_train_step(models.dit_cfg, train_cfg, tx, train_sigmas(
        train_cfg.num_train_timesteps, train_cfg.shift
    ))
    key = jax.random.PRNGKey(seed)
    rng = np.random.default_rng(seed)
    history = []

    from stableavatar_tpu.utils.metrics import MetricsLogger

    logger = MetricsLogger(output_dir)

    # preemption-safe exit: a handled signal sets the flag; the loop saves a
    # synchronous checkpoint and returns (handlers only attach on the main
    # thread — signal module requirement)
    preempted = {"flag": False, "signum": None}
    if preemption_signals is None:
        preemption_signals = (_signal.SIGTERM,)
    old_handlers = {}
    if threading.current_thread() is threading.main_thread():
        def _on_preempt(signum, frame):
            preempted["flag"] = True
            preempted["signum"] = signum

        for sig in preemption_signals:
            old_handlers[sig] = _signal.signal(sig, _on_preempt)

    t0 = time.time()
    try:
        for batch in batches:
            if step >= max_train_steps:
                break
            enc = encode_batch(models, batch, rng, train_mode=train_mode)
            is_clip_level = enc.pop("is_clip_level_modeling", False)
            key, sub = jax.random.split(key)
            params, opt_state, metrics = step_fn(
                params, opt_state, enc, sub, jnp.asarray(step), is_clip_level
            )
            step += 1
            if step % log_every == 0:
                loss = float(metrics["loss"])
                # current LR from the schedule (reference logs it per step,
                # train_1B_square.py:1384)
                if train_cfg.lr_scheduler != "constant":
                    from stableavatar_tpu.train.trainer import lr_multiplier_schedule

                    lr_now = train_cfg.learning_rate * float(
                        lr_multiplier_schedule(train_cfg)(
                            step // max(train_cfg.gradient_accumulation_steps, 1)
                        )
                    )
                else:
                    lr_now = train_cfg.learning_rate
                history.append({"step": step, "loss": loss, "time": time.time() - t0})
                logger.log(step, {"train_loss": loss,
                                  "grad_norm": float(metrics["grad_norm"]),
                                  "lr": lr_now})
                print(f"step {step} loss {loss:.5f} "
                      f"gnorm {float(metrics['grad_norm']):.4f} lr {lr_now:.2e}")
            if preempted["flag"]:
                cm.save(step, params, opt_state, wait=True)
                print(
                    f"[train] preemption signal {preempted['signum']} - saved "
                    f"checkpoint-{step} and exiting for clean resume"
                )
                break
            if step % checkpointing_steps == 0:
                cm.save(step, params, opt_state, wait=not async_checkpointing)
            if validation_steps and validation_cfg and step % validation_steps == 0:
                models.dit_params = params
                log_validation(models, validation_cfg, output_dir, step)
    finally:
        cm.wait()  # join any in-flight async save
        for sig, h in old_handlers.items():
            _signal.signal(sig, h)
        logger.close()

    models.dit_params = params
    return params, opt_state, history

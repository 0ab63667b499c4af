"""Training losses and timestep sampling for flow-matching avatar training.

Mirrors the reference training math (`train_1B_square.py:1203-1295`):
- flow-matching noising `z_t = (1-σ)x + σz`, velocity target `z - x`;
- mask-weighted MSE with stochastic face/lip/both weighting
  (`custom_mse_loss`, `:1267-1288`);
- motion-sub temporal-difference loss (`:1291-1295`);
- DiscreteSampling timestep stratification across data-parallel groups
  (`wan/utils/discrete_sampler.py:6-47`) recast per-mesh-axis;
- SD3 loss weightings (sigma_sqrt / cosmap) from diffusers training_utils.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def sample_timestep_indices(
    key: jax.Array,
    batch_size: int,
    num_train_timesteps: int = 1000,
    dp_rank: Optional[int] = None,
    dp_size: Optional[int] = None,
) -> jnp.ndarray:
    """Uniform discrete timestep indices; when (dp_rank, dp_size) are given
    the index range is stratified so each data-parallel group covers a
    distinct sigma interval (reference `DiscreteSampling` uniform_sampling
    mode)."""
    if dp_rank is not None and dp_size:
        interval = num_train_timesteps // dp_size
        lo = dp_rank * interval
        return jax.random.randint(key, (batch_size,), lo, lo + interval)
    return jax.random.randint(key, (batch_size,), 0, num_train_timesteps)


def logit_normal_timestep_indices(
    key: jax.Array,
    batch_size: int,
    num_train_timesteps: int = 1000,
    logit_mean: float = 0.0,
    logit_std: float = 1.0,
) -> jnp.ndarray:
    """`compute_density_for_timestep_sampling(weighting_scheme='logit_normal')`."""
    u = jax.random.normal(key, (batch_size,)) * logit_std + logit_mean
    u = jax.nn.sigmoid(u)
    return (u * num_train_timesteps).astype(jnp.int32)


def density_timestep_indices(
    key: jax.Array,
    batch_size: int,
    scheme: Optional[str],
    num_train_timesteps: int = 1000,
    logit_mean: float = 0.0,
    logit_std: float = 1.0,
    mode_scale: float = 1.29,
) -> jnp.ndarray:
    """diffusers `compute_density_for_timestep_sampling` — the reference's
    `uniform_sampling=False` branch (`train_1B_square.py:1206-1214`)."""
    if scheme == "logit_normal":
        return logit_normal_timestep_indices(
            key, batch_size, num_train_timesteps, logit_mean, logit_std
        )
    u = jax.random.uniform(key, (batch_size,))
    if scheme == "mode":
        u = 1 - u - mode_scale * (jnp.cos(jnp.pi * u / 2) ** 2 - 1 + u)
    return (u * num_train_timesteps).astype(jnp.int32)


def loss_weighting(scheme: Optional[str], sigmas: jnp.ndarray) -> jnp.ndarray:
    """diffusers `compute_loss_weighting_for_sd3`."""
    if scheme == "sigma_sqrt":
        return (sigmas**-2.0).astype(jnp.float32)
    if scheme == "cosmap":
        bot = 1 - 2 * sigmas + 2 * sigmas**2
        return 2 / (jnp.pi * bot)
    return jnp.ones_like(sigmas)


def masked_flow_loss(
    noise_pred: jnp.ndarray,  # [B, C, F, H, W]
    target: jnp.ndarray,
    face_masks: jnp.ndarray,  # [B, 1, F, H, W] resized to latent res
    lip_masks: jnp.ndarray,
    mask_flag: jnp.ndarray,  # scalar uniform [0,1) — selects weighting mode
    weighting: Optional[jnp.ndarray] = None,  # [B,1,1,1,1]
    motion_sub_ratio: float = 0.0,
) -> jnp.ndarray:
    """`custom_mse_loss` + optional motion-sub loss
    (`train_1B_square.py:1267-1295`)."""
    noise_pred = noise_pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    mse = jnp.square(noise_pred - target)

    w_face = face_masks
    w_lip = lip_masks
    w_both = 1.0 + face_masks + lip_masks
    mask_w = jnp.where(
        (mask_flag >= 0.4) & (mask_flag < 0.5),
        w_face,
        jnp.where(mask_flag >= 0.5, w_lip, w_both),
    )
    mse = mse * mask_w
    if weighting is not None:
        mse = mse * weighting
    loss = jnp.mean(mse)

    if motion_sub_ratio > 0.0 and noise_pred.shape[1] > 2:
        # NOTE(reference parity): the reference diffs axis 1 — the CHANNEL
        # axis of [B, C, F, H, W] (`:1291-1293`), despite the "motion" name.
        gt_sub = noise_pred[:, 1:] - noise_pred[:, :-1]
        pre_sub = target[:, 1:] - target[:, :-1]
        sub_loss = jnp.mean(jnp.square(gt_sub - pre_sub))
        loss = loss * (1 - motion_sub_ratio) + sub_loss * motion_sub_ratio
    return loss


def linear_decay(initial: float, final: float, total_steps: int, step) -> jnp.ndarray:
    """Grad-norm bound decay (`train_1B_square.py:278-283`)."""
    frac = jnp.clip(step / max(total_steps, 1), 0.0, 1.0)
    return initial + (final - initial) * frac


def anomaly_aware_max_norm(
    grad_norm: jnp.ndarray,
    max_grad_norm: float,
    initial_ratio: float,
    decay_steps: int,
    step,
) -> jnp.ndarray:
    """Anomaly-aware grad clipping bound (`train_1B_square.py:1304-1315`):
    the bound decays from `max*ratio` to `max`; if the observed norm exceeds
    5x the bound after the decay window, the bound shrinks by up to 10x."""
    bound = linear_decay(max_grad_norm * initial_ratio, max_grad_norm, decay_steps, step)
    ratio = grad_norm / bound
    shrunk = bound / jnp.minimum(ratio, 10.0)
    anomalous = (ratio > 5.0) & (step > decay_steps)
    return jnp.where(anomalous, shrunk, bound)

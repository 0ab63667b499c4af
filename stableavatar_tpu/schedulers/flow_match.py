"""FlowMatch Euler discrete scheduler — functional, jit-friendly.

Replaces the diffusers `FlowMatchEulerDiscreteScheduler` the reference uses
(config `wan_civitai.yaml:28-35`: shift=5.0, num_train_timesteps=1000,
use_dynamic_shifting=false) with a stateless schedule object:

- `flow_match_timesteps(...)` reproduces the diffusers sigma construction
  exactly, including the detail that the training-schedule `sigma_min` is
  already shift-transformed once at init and gets shifted again in
  `set_timesteps` (verified in tests/test_scheduler.py).
- `step(...)` is the plain Euler update `x + (s_next - s) * v`; the step index
  is explicit, which makes the reference's per-window
  `scheduler._step_index = None` reset (`wan_inference_long_pipeline.py:715`)
  a no-op by construction.
- `add_noise` / training helpers implement `z_t = (1-σ) x + σ z` with target
  `z - x` (`train_1B_square.py:1234-1240`).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np


def _shift_sigmas(sigmas: np.ndarray, shift: float) -> np.ndarray:
    return shift * sigmas / (1 + (shift - 1) * sigmas)


def _time_shift_exponential(mu: float, sigma: float, t: np.ndarray) -> np.ndarray:
    return math.exp(mu) / (math.exp(mu) + (1 / t - 1) ** sigma)


@dataclasses.dataclass(frozen=True)
class FlowMatchEulerSchedule:
    """Precomputed inference schedule: `sigmas` has num_steps+1 entries
    (terminal 0 appended), `timesteps` = sigmas[:-1] * num_train_timesteps."""

    sigmas: jnp.ndarray  # [S+1] fp32
    timesteps: jnp.ndarray  # [S] fp32
    num_train_timesteps: int = 1000

    @property
    def num_steps(self) -> int:
        return int(self.timesteps.shape[0])

    def step(self, model_output: jnp.ndarray, i, sample: jnp.ndarray) -> jnp.ndarray:
        """Euler step i -> i+1 (fp32 accumulate like diffusers, which upcasts
        sample to float32 in `step`)."""
        s = self.sigmas[i]
        s_next = self.sigmas[i + 1]
        out = sample.astype(jnp.float32) + (s_next - s) * model_output.astype(jnp.float32)
        return out.astype(sample.dtype)


def flow_match_timesteps(
    num_inference_steps: int,
    shift: float = 5.0,
    num_train_timesteps: int = 1000,
    use_dynamic_shifting: bool = False,
    mu: Optional[float] = None,
    sigmas: Optional[Sequence[float]] = None,
) -> FlowMatchEulerSchedule:
    """Build the inference schedule; mirrors diffusers
    `FlowMatchEulerDiscreteScheduler.set_timesteps` as invoked by the
    reference (`retrieve_timesteps(..., mu=1)`,
    `wan_inference_long_pipeline.py:644-646` — with use_dynamic_shifting=False
    the `mu` argument is ignored by diffusers, which we reproduce)."""
    # training schedule (constructor): sigmas over [1/N, 1], shifted once
    train_sigmas = np.linspace(1, num_train_timesteps, num_train_timesteps, dtype=np.float32)[::-1] / num_train_timesteps
    if not use_dynamic_shifting:
        train_sigmas = _shift_sigmas(train_sigmas, shift)
    sigma_min = float(train_sigmas[-1])
    sigma_max = float(train_sigmas[0])

    if sigmas is None:
        # linspace in t-space between (already shifted) extremes
        ts = np.linspace(
            sigma_max * num_train_timesteps,
            sigma_min * num_train_timesteps,
            num_inference_steps,
            dtype=np.float32,
        )
        sig = ts / num_train_timesteps
    else:
        sig = np.asarray(sigmas, dtype=np.float32)

    if use_dynamic_shifting:
        if mu is None:
            raise ValueError("mu is required when use_dynamic_shifting=True")
        sig = _time_shift_exponential(mu, 1.0, sig)
    else:
        sig = _shift_sigmas(sig, shift)

    timesteps = sig * num_train_timesteps
    sig = np.concatenate([sig, [0.0]]).astype(np.float32)
    return FlowMatchEulerSchedule(
        sigmas=jnp.asarray(sig),
        timesteps=jnp.asarray(timesteps.astype(np.float32)),
        num_train_timesteps=num_train_timesteps,
    )


def add_noise(latents: jnp.ndarray, noise: jnp.ndarray, sigma) -> jnp.ndarray:
    """Flow-matching forward process `z_t = (1-σ) x + σ z`
    (`train_1B_square.py:1234-1237`)."""
    return (1.0 - sigma) * latents + sigma * noise


def flow_target(latents: jnp.ndarray, noise: jnp.ndarray) -> jnp.ndarray:
    """Velocity target `z - x` (`train_1B_square.py:1240`)."""
    return noise - latents

"""FlowMatch Euler schedule: exact values of the (double-shifted) sigma
construction and Euler stepping."""

import numpy as np

import jax.numpy as jnp

from stableavatar_tpu.schedulers import (
    FlowMatchEulerSchedule,
    add_noise,
    flow_match_timesteps,
)
from stableavatar_tpu.schedulers.flow_match import flow_target


def test_schedule_endpoints():
    sched = flow_match_timesteps(50, shift=5.0)
    assert sched.num_steps == 50
    # sigma_max = 1.0 shifts to 1.0 -> t0 = 1000
    np.testing.assert_allclose(float(sched.timesteps[0]), 1000.0, rtol=1e-5)
    # training sigma_min = shift(1/1000) = 0.00498008; set_timesteps shifts it
    # again: 5*0.00498008/(1+4*0.00498008) = 0.02441406 -> t_last ~ 24.414
    np.testing.assert_allclose(float(sched.timesteps[-1]), 24.4140625, rtol=1e-4)
    # terminal sigma appended
    assert sched.sigmas.shape[0] == 51
    assert float(sched.sigmas[-1]) == 0.0
    # strictly decreasing
    s = np.asarray(sched.sigmas)
    assert (np.diff(s) < 0).all()


def test_euler_step_closed_form():
    sched = flow_match_timesteps(10, shift=5.0)
    x = jnp.ones((2, 3)) * 0.5
    v = jnp.ones((2, 3)) * 2.0
    out = sched.step(v, 0, x)
    expected = 0.5 + (float(sched.sigmas[1]) - float(sched.sigmas[0])) * 2.0
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-6)


def test_full_denoise_recovers_data_for_linear_field():
    """With the exact velocity field v = z - x0, Euler integration from pure
    noise must land exactly on x0 (the flow-matching ODE is linear)."""
    sched = flow_match_timesteps(25, shift=5.0)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((4, 4)).astype(np.float32))
    z = jnp.asarray(rng.standard_normal((4, 4)).astype(np.float32))

    x = z  # sigma_0 = 1 -> pure noise
    for i in range(sched.num_steps):
        v = flow_target(x0, z)  # z - x0, constant along the path
        x = sched.step(v, i, x)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), rtol=1e-4, atol=1e-5)


def test_add_noise_matches_training_formula():
    x = jnp.ones((2, 2))
    z = jnp.zeros((2, 2))
    np.testing.assert_allclose(np.asarray(add_noise(x, z, 0.25)), 0.75)

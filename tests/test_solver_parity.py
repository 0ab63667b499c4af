"""Step-by-step numerical parity of our multistep solvers against the
reference's vendored FlowDPMSolverMultistepScheduler / FlowUniPC
(`/root/reference/wan/utils/fm_solvers.py`, `fm_solvers_unipc.py`),
imported directly (via the diffusers shim when diffusers is absent).

The trajectories share the reference's exact sigma ladder and a
deterministic synthetic velocity field, so any divergence is solver math.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REFERENCE_ROOT = os.environ.get("REFERENCE_ROOT", "/root/reference")


@pytest.fixture(scope="module")
def ref_modules():
    from stableavatar_tpu.utils.diffusers_shim import ensure_diffusers

    ensure_diffusers()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import importlib

    fm = importlib.import_module("wan.utils.fm_solvers")
    fmu = importlib.import_module("wan.utils.fm_solvers_unipc")
    return fm, fmu


def _velocity(sample, t):
    """Deterministic pseudo-model: contractive linear field + timestep bias."""
    return 0.3 * sample + 0.05 * np.cos(t / 100.0)


def _run_reference(scheduler, sample0, steps):
    sample = torch.from_numpy(sample0.copy())
    traj = []
    for i, t in enumerate(scheduler.timesteps):
        v = torch.from_numpy(
            _velocity(sample.numpy(), float(t)).astype(np.float32)
        )
        sample = scheduler.step(v, t, sample, return_dict=False)[0]
        traj.append(sample.numpy().copy())
    return traj


def _run_ours(solver, sample0, steps):
    import jax.numpy as jnp

    from stableavatar_tpu.schedulers.fm_solvers import MultistepState

    sample = jnp.asarray(sample0)
    state = MultistepState()
    traj = []
    for i in range(steps):
        t = float(solver.timesteps[i])
        v = jnp.asarray(_velocity(np.asarray(sample), t).astype(np.float32))
        sample, state = solver.step(v, i, sample, state)
        traj.append(np.asarray(sample).copy())
    return traj


@pytest.mark.parametrize(
    "steps,order",
    [(10, 2), (20, 2), (10, 3), (20, 3)],  # 10 (<15) exercises the
    # lower_order_second drop at the second-to-last step; 20 does not
)
def test_dpm_solver_matches_reference(ref_modules, steps, order):
    fm, _ = ref_modules
    from stableavatar_tpu.schedulers.fm_solvers import FlowDPMSolverMultistep

    ref = fm.FlowDPMSolverMultistepScheduler(shift=5.0, solver_order=order)
    ref.set_timesteps(steps)
    sigmas = ref.sigmas.numpy()

    ours = FlowDPMSolverMultistep(steps, sigmas=sigmas, order=order)
    np.testing.assert_allclose(
        np.asarray(ours.sigmas), sigmas, rtol=1e-6, atol=1e-7
    )

    rng = np.random.default_rng(0)
    sample0 = rng.standard_normal((1, 4, 2, 8, 8)).astype(np.float32)
    ref_traj = _run_reference(ref, sample0, steps)
    our_traj = _run_ours(ours, sample0, steps)

    for i, (a, b) in enumerate(zip(our_traj, ref_traj)):
        np.testing.assert_allclose(
            a, b, rtol=2e-4, atol=1e-4,
            err_msg=f"DPM++ diverged at step {i}/{steps}",
        )


@pytest.mark.parametrize("steps", [10, 20])
def test_unipc_matches_reference(ref_modules, steps):
    _, fmu = ref_modules
    from stableavatar_tpu.schedulers.fm_solvers import FlowUniPCMultistep

    ref = fmu.FlowUniPCMultistepScheduler(shift=5.0)
    ref.set_timesteps(steps)
    sigmas = ref.sigmas.numpy()

    ours = FlowUniPCMultistep(steps, sigmas=sigmas)

    rng = np.random.default_rng(1)
    sample0 = rng.standard_normal((1, 4, 2, 8, 8)).astype(np.float32)
    ref_traj = _run_reference(ref, sample0, steps)
    our_traj = _run_ours(ours, sample0, steps)

    for i, (a, b) in enumerate(zip(our_traj, ref_traj)):
        np.testing.assert_allclose(
            a, b, rtol=2e-4, atol=1e-4,
            err_msg=f"UniPC diverged at step {i}/{steps}",
        )

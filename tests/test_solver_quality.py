"""Matched-quality reduced-step evidence + golden-output regression.

Two jobs:

1. Quality evidence for the reduced-step bench headline (VERDICT r3 item 2):
   the reference ships DPM++/UniPC live (`wan/utils/__init__.py:1-3`)
   because ~25-30 multistep steps match 50 Euler steps.  On the tiny
   random-weight model we quantify it: PSNR(unipc-25, euler-50) and
   PSNR(dpm++-25, euler-50) must clear the seed-to-seed noise floor by a
   wide margin and beat the SAME solver at the same step count run from a
   different seed.  Real-weights PSNR runs via scripts/parity_vs_torch.py
   when checkpoints mount.

2. Golden-output regression (VERDICT r3 item 9): the default euler path's
   decoded video is frozen against a committed golden (PSNR floor), so perf
   work (int8, exp2 softmax, segmented decode) can never silently drift the
   default numerics between rounds.
"""

import os

import numpy as np
import pytest

from tests.test_pipeline import make_tiny_models

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "generate_long_tiny.npz")


def make_active_models():
    """Tiny models with a NON-zero output head.

    init_dit zero-inits the head projection (reference init parity), which
    makes a random-init DiT output exactly 0 — the pipeline would be an
    identity on latents and any solver/golden comparison vacuous.  Randomize
    the head so the denoise trajectory actually moves."""
    import jax

    models = make_tiny_models()
    head = dict(models.dit_params["head"])
    proj = dict(head["head"])
    proj["w"] = 0.05 * jax.random.normal(
        jax.random.PRNGKey(99), proj["w"].shape, proj["w"].dtype
    )
    head["head"] = proj
    models.dit_params = dict(models.dit_params)
    models.dit_params["head"] = head
    return models


@pytest.fixture(scope="module")
def models():
    return make_active_models()


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.default_rng(7)
    ref = rng.uniform(-1, 1, (1, 3, 32, 32)).astype(np.float32)
    wav = rng.standard_normal(9 * 640).astype(np.float32) * 0.1
    return ref, wav


def run(models, inputs, steps, scheduler="euler", seed=0, **kw):
    from stableavatar_tpu.pipelines.long import generate_long

    ref, wav = inputs
    out = generate_long(
        models, ref_image=ref, vocal_waveform=wav, prompt="a person talking",
        num_inference_steps=steps, clip_length=9, overlap_window_length=1,
        seed=seed, scheduler=scheduler, **kw,
    )
    return np.asarray(out.videos, dtype=np.float32)


def psnr(a, b):
    mse = float(np.mean((a - b) ** 2))
    return 99.0 if mse == 0 else 10.0 * np.log10(1.0 / mse)


def test_reduced_step_solvers_match_50_step_euler(models, inputs):
    ref50 = run(models, inputs, 50, "euler", seed=0)
    unipc25 = run(models, inputs, 25, "unipc", seed=0)
    dpm25 = run(models, inputs, 25, "dpm++", seed=0)
    euler25 = run(models, inputs, 25, "euler", seed=0)
    # noise floor: the same pipeline from a different seed — what PSNR looks
    # like when the outputs do NOT match
    floor = run(models, inputs, 25, "unipc", seed=1)

    p_unipc = psnr(unipc25, ref50)
    p_dpm = psnr(dpm25, ref50)
    p_euler = psnr(euler25, ref50)
    p_floor = psnr(floor, ref50)
    # measured on this tiny random model: unipc-25 33.4 dB, dpm++-25
    # 35.6 dB, euler-25 35.8 dB, floor 16.0 dB.  The random-weight
    # trajectory is nearly linear (small zero-ish head output), so euler-25
    # already tracks euler-50 — the order-2 advantage on stiff real-weight
    # trajectories is covered by the solver step-parity suite
    # (tests/test_solver_parity.py); THIS test pins that the reduced-step
    # operating points land far above the mismatch floor end to end.
    print(f"PSNR vs euler-50: unipc-25={p_unipc:.2f}dB dpm++-25={p_dpm:.2f}dB "
          f"euler-25={p_euler:.2f}dB noise-floor={p_floor:.2f}dB")

    assert p_unipc > p_floor + 6.0, (p_unipc, p_floor)
    assert p_dpm > p_floor + 6.0, (p_dpm, p_floor)


def test_golden_output_regression(models, inputs):
    """Default euler path vs committed golden.  Regenerate deliberately with
    scripts/make_golden.py after an INTENDED numerics change."""
    vid = run(models, inputs, 4, "euler", seed=0)
    if not os.path.exists(GOLDEN):
        pytest.skip("golden file missing - run scripts/make_golden.py")
    g = np.load(GOLDEN)["videos"].astype(np.float32)
    assert g.shape == vid.shape
    p = psnr(vid, g)
    print(f"golden PSNR: {p:.2f} dB")
    assert p > 40.0, f"default-path numerics drifted vs golden ({p:.2f} dB)"


def test_golden_single_clip_regression(models, inputs):
    """Same guard for the fantasy single-clip pipeline."""
    from stableavatar_tpu.pipelines.single_clip import generate_single_clip

    golden = os.path.join(os.path.dirname(__file__), "golden",
                          "generate_single_clip_tiny.npz")
    if not os.path.exists(golden):
        pytest.skip("golden file missing - run scripts/make_golden.py")
    ref, wav = inputs
    ids = np.ones(16, np.int32)
    out = generate_single_clip(
        models, ref_image=ref, vocal_waveform=wav,
        prompt_ids=(ids, ids),
        negative_prompt_ids=(np.zeros(16, np.int32), ids),
        num_inference_steps=4, clip_length=9, seed=0,
    )
    vid = np.asarray(out.videos, np.float32)
    g = np.load(golden)["videos"].astype(np.float32)
    assert g.shape == vid.shape
    p = psnr(vid, g)
    print(f"single-clip golden PSNR: {p:.2f} dB")
    assert p > 40.0, f"single-clip numerics drifted vs golden ({p:.2f} dB)"

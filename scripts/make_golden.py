"""Regenerate the committed golden output for the default euler path.

Run on the virtual-CPU backend (deterministic across sessions):
    JAX_PLATFORMS=cpu python scripts/make_golden.py

Only run this after an INTENDED numerics change; the golden guards the
default path against silent drift from perf work
(tests/test_solver_quality.py::test_golden_output_regression).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main():
    from tests.test_solver_quality import make_active_models
    from stableavatar_tpu.pipelines.long import generate_long
    from stableavatar_tpu.pipelines.single_clip import generate_single_clip

    models = make_active_models()
    rng = np.random.default_rng(7)
    ref = rng.uniform(-1, 1, (1, 3, 32, 32)).astype(np.float32)
    wav = rng.standard_normal(9 * 640).astype(np.float32) * 0.1
    out = generate_long(
        models, ref_image=ref, vocal_waveform=wav, prompt="a person talking",
        num_inference_steps=4, clip_length=9, overlap_window_length=1,
        seed=0, scheduler="euler",
    )
    gdir = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")
    os.makedirs(gdir, exist_ok=True)
    path = os.path.join(gdir, "generate_long_tiny.npz")
    np.savez_compressed(path, videos=np.asarray(out.videos, np.float16))
    print(f"wrote {os.path.abspath(path)} shape={out.videos.shape}")

    ids = np.ones(16, np.int32)
    out_sc = generate_single_clip(
        models, ref_image=ref, vocal_waveform=wav,
        prompt_ids=(ids, ids),
        negative_prompt_ids=(np.zeros(16, np.int32), ids),
        num_inference_steps=4, clip_length=9, seed=0,
    )
    path_sc = os.path.join(gdir, "generate_single_clip_tiny.npz")
    np.savez_compressed(path_sc, videos=np.asarray(out_sc.videos, np.float16))
    print(f"wrote {os.path.abspath(path_sc)} shape={out_sc.videos.shape}")


if __name__ == "__main__":
    main()

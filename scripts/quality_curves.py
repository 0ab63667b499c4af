"""Measured quality-vs-steps and TeaCache frontier at the bench geometry
(VERDICT r4 items 5 & 6).

Runs the REAL `generate_long` denoise loop at 512x512 (2 sliding windows,
overlap 15 — the bench operating point) with STRUCTURED inputs (smooth
radial reference image, harmonic-stack audio — not white noise) and
reports, against the euler-50 reference trajectory (same seed):

1. PSNR for UniPC-2 at steps in {15, 20, 25, 35, 50} plus euler reduced
   steps — so the bench's "UniPC-25 ~ euler-50" reduced-step operating
   point sits on a MEASURED curve for this model rather than on
   literature.
2. The TeaCache rel_l1_thresh frontier: measured skip fraction, wall
   speedup, and PSNR per threshold — so the bench's skip-fraction cap is
   traceable to a measured PSNR-vs-speedup frontier.

Metrics (both computed on device; only scalars cross the tunnel):
- `psnr_latent`  — PSNR over the FINAL LATENTS (peak = reference latent
  dynamic range).  Primary solver-agreement number: with random-init
  weights the uint8 display decode saturates/quantizes away sub-1/255
  differences (every earlier attempt measured `inf` there), so the
  latent trajectory is the honest signal.
- `psnr_video_f32` — PSNR over the UNCLIPPED float32 VAE decode (peak =
  reference decode dynamic range): same comparison after the decoder's
  nonlinear amplification, before display clipping.

Wall times cover the denoise sweep only (decode excluded — identical
across operating points and measured separately in bench.py).

Caveat (printed into the output): weights are random-init (zero-egress
environment), so absolute PSNRs and TeaCache skip rates differ from
trained weights; `scripts/weights_autoprobe.py` re-runs this automatically
the first time real checkpoints appear.

Writes docs/quality_curves.json INCREMENTALLY (every row — a timeout
still leaves a usable curve) and regenerates docs/QUALITY.md at each
write.  ~45 min on the v5e; CPU smoke: QC_SMALL=1.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def structured_inputs(size, n_windows, overlap=15, fps=25, sr=16000):
    """Smooth, deterministic, non-random inputs: a radial-gradient face-ish
    reference and a harmonic voice-like waveform."""
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    r = np.sqrt((xx - 0.5) ** 2 + (yy - 0.45) ** 2)
    img = np.stack([
        0.8 - r * 1.2,
        0.6 - r * 0.9 + 0.2 * np.sin(6.28 * xx),
        0.5 - r * 1.0 + 0.2 * np.cos(6.28 * yy),
    ])
    ref_image = np.clip(img, -1, 1)[None]  # [1, 3, H, W]

    infer_length = 21 + (21 - overlap) * (n_windows - 1)
    total_video_frames = (infer_length - 1) * 4 + 1
    t = np.arange(total_video_frames * (sr // fps)) / sr
    wav = (
        0.35 * np.sin(2 * np.pi * 155 * t)
        + 0.2 * np.sin(2 * np.pi * 310 * t + 0.5)
        + 0.1 * np.sin(2 * np.pi * 620 * t + 1.1)
    ) * (0.6 + 0.4 * np.sin(2 * np.pi * 3.1 * t))  # syllable-rate envelope
    return ref_image.astype(np.float32), wav.astype(np.float32)


def sensitize_random_init(models) -> None:
    """Make a random-init DiT solver-discriminating (in place).

    Two reference-parity inits defeat the measurement as-is (verified by
    direct probe):
    1. The output head is ZERO-init (models/dit.py init_dit, mirroring the
       reference's init_weights `wan_fantasy_transformer3d_1B.py:1208`), so
       the velocity output is exactly 0: latents never change and EVERY
       solver/step-count yields bit-identical trajectories (the old curve's
       `inf` rows were this, not solver agreement).
    2. The time-MLP's 0.02-std init makes e0 nearly t-constant, so adaLN
       modulation barely varies across timesteps (also starves TeaCache's
       rel-L1 signal).

    Re-randomize the head at 1/sqrt(dim) scale and amplify the time-MLP so
    the velocity field varies with (x, t) like a trained model's.  The
    result measures SOLVER agreement on a non-degenerate field — still not
    perceptual quality (see the weights caveat)."""
    import jax

    d = models.dit_cfg.dim
    head = models.dit_params["head"]["head"]
    key = jax.random.PRNGKey(1234)
    head["w"] = (
        jax.random.normal(key, head["w"].shape, jnp.float32) / d**0.5
    ).astype(head["w"].dtype)
    te = models.dit_params["time_embedding"]
    for fc in ("fc1", "fc2"):
        te[fc]["w"] = te[fc]["w"] * 5.0


def psnr_from_mse(mse: float, peak: float) -> float:
    if mse <= 0:
        return float("inf")
    return 10.0 * float(np.log10(peak * peak / mse))


def main():
    small = os.environ.get("QC_SMALL") == "1"
    true_ref = os.environ.get("QC_TRUE_REF") == "1"
    size = 64 if small else 512
    n_windows = 2
    steps_grid = [2, 3] if small else [15, 20, 25, 35, 50]
    # unipc is the bench's reduced-step solver; dpm++ has step-parity tests
    # (tests/test_solver_parity.py) and is omitted here to bound on-chip time
    solvers = ["unipc"]
    euler_reduced = [2] if small else [15, 25, 35]
    tc_thresholds = [0.05] if small else [0.05, 0.1, 0.2, 0.3]
    full_steps = 3 if small else 50
    if true_ref:
        # Matched-quality mode: measuring "distance from the EULER-50
        # trajectory" favors same-scheme euler-reduced runs (discretization
        # bias — measured: euler-15 scored above unipc-25 on that metric).
        # The honest operationalization of "unipc-25 ~ euler-50 quality" is
        # distance from the TRUE ODE solution: reference = unipc-200
        # (global error O(1/200^2)), cross-validated by an euler-200 row
        # (different scheme converging to the same solution), candidates =
        # euler-{25,50} and unipc-{15,25,35,50} all scored against it.
        full_steps = 6 if small else 200
        ref_solver = "unipc"
        steps_grid = [2, 3] if small else [15, 25, 35, 50]
        euler_reduced = [2, 3, 6] if small else [25, 50, 200]
        tc_thresholds = []  # frontier belongs to the euler-50 baseline mode
    else:
        ref_solver = "euler"

    p = os.environ.get("JAX_PLATFORMS")
    if p:
        jax.config.update("jax_platforms", p)
    if not p or "tpu" in p or "axon" in p:
        # persistent cache for the TPU backend only: XLA:CPU AOT entries
        # written on another host SIGILL/segfault on load when the session
        # migrates machines (tests/conftest.py has the full history)
        jax.config.update(
            "jax_compilation_cache_dir", "/tmp/stableavatar_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import build_models
    from stableavatar_tpu.models.teacache import TeaCache, get_teacache_coefficients
    from stableavatar_tpu.models.vae import decode_video
    from stableavatar_tpu.pipelines.long import generate_long

    ckpt_root = os.environ.get("QC_CKPT_ROOT")
    prompt = None
    if ckpt_root:
        # real weights (weights_autoprobe sets this the moment checkpoints
        # mount): build through the CLI loader and use a real prompt
        from stableavatar_tpu.cli.inference import build_parser, load_models

        args = build_parser().parse_args([
            "--pretrained_model_name_or_path", ckpt_root,
            "--validation_reference_path", "unused.png",
            "--validation_driven_audio_path", "unused.wav",
            "--fast_path", "linears",
        ])
        models = load_models(args)
        prompt = "A person is talking with natural expressions"
    else:
        models = build_models(small)
        sensitize_random_init(models)
    ref_image, wav = structured_inputs(size, n_windows)
    text_ctx = None
    if prompt is None:
        rng = np.random.default_rng(7)
        text_ctx = jnp.asarray(
            rng.standard_normal((3, models.dit_cfg.text_len, models.dit_cfg.text_dim)) * 0.3,
            jnp.bfloat16,
        )

    def run(steps, scheduler="euler", teacache=None):
        """Denoise sweep only (output_type='latent'): returns final latents
        (device f32) + wall.  A one-element host read forces completion
        (block_until_ready is a no-op over the remote tunnel)."""
        models.teacache = teacache
        t0 = time.perf_counter()
        out = generate_long(
            models, ref_image=ref_image, vocal_waveform=wav,
            text_ctx=text_ctx, prompt=prompt or "",
            num_inference_steps=steps,
            overlap_window_length=15, seed=42, scheduler=scheduler,
            output_type="latent",
        )
        np.asarray(out.latents[0, 0, 0, 0, 0])
        wall = time.perf_counter() - t0
        models.teacache = None
        return out.latents, wall

    def decode_f32(latents):
        # decode in the pipeline's dtype (bf16), keep f32 stats on device
        return decode_video(
            models.vae_params, latents.astype(jnp.bfloat16), models.vae_cfg
        ).astype(jnp.float32)

    @jax.jit
    def mse_pair(a, b):
        return jnp.mean((a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2)

    results = {
        "full_steps": full_steps,
        "ref_solver": ref_solver,
        "mode": ("true-ref (distance from the unipc-200 truth proxy; "
                 "euler-200 row cross-validates the proxy)" if true_ref
                 else "euler-50-trajectory baseline"),
        "geometry": (f"{size}x{size}, {n_windows} windows, overlap 15; "
                     "wall = denoise sweep only (decode excluded)"),
        "weights": (f"real checkpoints: {ckpt_root}" if ckpt_root else
                    "random-init + solver-sensitization (random head, 5x "
                    "time-MLP; see sensitize_random_init — the reference's "
                    "zero-init head makes raw random-init trajectories "
                    "solver-invariant); autoprobe re-measures on real ckpts"),
        "metric_note": ("psnr_latent: final latents, peak = ref latent range; "
                        "psnr_video_f32: unclipped f32 VAE decode, peak = ref "
                        "decode range (uint8 display decode quantizes random-"
                        "init differences to zero, hence not used)"),
        "solver_curve": [],
        "teacache_frontier": [],
    }

    docs = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs")
    if ckpt_root:
        name = ("quality_curves_realweights_trueref.json" if true_ref
                else "quality_curves_realweights.json")
    else:
        name = ("quality_curves_trueref.json" if true_ref
                else "quality_curves.json")
    out_path = os.path.join(docs, name)

    def flush_results():
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)
        write_quality_md(docs)

    # warmups: compile euler + unipc sweeps + decode once (persistent cache)
    print("warmup compiles ...", flush=True)
    lat_w, _ = run(2)
    decode_f32(lat_w)
    for s in solvers:
        run(3, s)

    print(f"reference {ref_solver}-{full_steps} trajectory ...", flush=True)
    ref_lat, ref_wall = run(full_steps, ref_solver)
    # second run: recompile-free wall (use the min) + determinism floor
    ref_lat2, ref_wall2 = run(full_steps, ref_solver)
    repeat_mse = float(mse_pair(ref_lat, ref_lat2))
    ref_wall = min(ref_wall, ref_wall2)
    ref_dec = decode_f32(ref_lat)
    lat_peak = float(jnp.max(ref_lat) - jnp.min(ref_lat))
    vid_peak = float(jnp.max(ref_dec) - jnp.min(ref_dec))
    results["euler_full_wall_s"] = round(ref_wall, 1)
    results["latent_peak"] = round(lat_peak, 3)
    results["video_f32_peak"] = round(vid_peak, 3)
    nf = psnr_from_mse(repeat_mse, lat_peak)
    results["repeat_noise_floor_psnr_latent"] = (
        None if np.isinf(nf) else round(nf, 2))
    flush_results()

    def measure(latents, wall, **label):
        dec = decode_f32(latents)
        row = dict(label)
        row.update({
            "psnr_latent": round(psnr_from_mse(
                float(mse_pair(latents, ref_lat)), lat_peak), 2),
            "psnr_video_f32": round(psnr_from_mse(
                float(mse_pair(dec, ref_dec)), vid_peak), 2),
            "wall_s": round(wall, 1),
            "speedup_vs_euler50": round(ref_wall / wall, 2),
        })
        return row

    for solver in solvers:
        for steps in steps_grid:
            lat, wall = run(steps, solver)
            row = measure(lat, wall, solver=solver, steps=steps)
            results["solver_curve"].append(row)
            print(row, flush=True)
            flush_results()

    # euler reduced-step for context (same solver, fewer steps)
    for steps in euler_reduced:
        lat, wall = run(steps, "euler")
        row = measure(lat, wall, solver="euler", steps=steps)
        results["solver_curve"].append(row)
        print(row, flush=True)
        flush_results()

    # ---- TeaCache frontier (euler-50 + controller at each threshold) ----
    if tc_thresholds:
        coef = get_teacache_coefficients("wan2.1-t2v-1.3b")
        # compile both TC sweep variants once
        tc_warm = TeaCache(coef, 99, rel_l1_thresh=1e9, num_skip_start_steps=0)
        run(3, "euler", teacache=tc_warm)
    for thr in tc_thresholds:
        tc = TeaCache(coef, full_steps, rel_l1_thresh=thr,
                      num_skip_start_steps=5)
        lat, wall = run(full_steps, "euler", teacache=tc)
        row = measure(lat, wall, rel_l1_thresh=thr,
                      skip_frac=round(tc.skipped_calls / max(tc.total_calls, 1), 3))
        results["teacache_frontier"].append(row)
        print(row, flush=True)
        flush_results()

    flush_results()
    print(f"wrote {out_path}", flush=True)
    print(f"regenerated {os.path.join(docs, 'QUALITY.md')}", flush=True)


def _fmt_psnr(row):
    lat = row.get("psnr_latent", row.get("psnr_vs_euler50"))
    vid = row.get("psnr_video_f32")
    return (f"{lat}" if vid is None else f"{lat} / {vid}")


def _md_tables(r):
    ref = f"{r.get('ref_solver', 'euler')}-{r.get('full_steps', 50)}"
    out = [f"Geometry: {r['geometry']}; weights: {r['weights']}.\n"]
    if r.get("euler_full_wall_s") is not None:
        nf = r.get("repeat_noise_floor_psnr_latent",
                   r.get("repeat_noise_floor_psnr"))
        out.append(
            f"Reference trajectory: {ref} ({r['euler_full_wall_s']} s wall); "
            f"repeat-run noise floor "
            f"{'inf (bit-identical repeats)' if nf is None else f'{nf} dB'}.\n")
    if r.get("metric_note"):
        out.append(f"PSNR columns: latent / f32-decode ({r['metric_note']}).\n")
    out.append(f"\n| solver | steps | PSNR vs {ref} (dB) | wall s | speedup |")
    out.append("|---|---|---|---|---|")
    for row in r.get("solver_curve", []):
        out.append(f"| {row['solver']} | {row['steps']} | "
                   f"{_fmt_psnr(row)} | {row['wall_s']} | "
                   f"{row['speedup_vs_euler50']}x |")
    if r.get("teacache_frontier"):
        out.append(f"\nTeaCache frontier (euler-{r.get('full_steps', 50)}"
                   " + controller):\n")
        out.append(f"| rel_l1_thresh | skip frac | PSNR vs {ref} (dB) "
                   "| wall s | speedup |")
        out.append("|---|---|---|---|---|")
        for row in r["teacache_frontier"]:
            out.append(f"| {row['rel_l1_thresh']} | {row['skip_frac']} | "
                       f"{_fmt_psnr(row)} | {row['wall_s']} | "
                       f"{row['speedup_vs_euler50']}x |")
    return out


def write_quality_md(docs: str) -> None:
    """Regenerate docs/QUALITY.md from whichever measured curve JSONs exist
    (random-init always; real-weights section the moment the autoprobe has
    produced one)."""
    lines = [
        "# Measured quality-vs-steps and TeaCache frontier",
        "",
        "Produced by `scripts/quality_curves.py` (re-run automatically on",
        "real checkpoints by `scripts/weights_autoprobe.py`).  Backs the",
        "bench's reduced-step UniPC-25 operating point and the TeaCache",
        "skip-fraction cap (bench.py detail rows; VERDICT r4 items 5/6).",
        "",
    ]
    for fname, title in [
        ("quality_curves_realweights_trueref.json",
         "Real trained weights — vs the true-solution proxy"),
        ("quality_curves_realweights.json", "Real trained weights"),
        ("quality_curves_trueref.json",
         "Random-init weights — vs the true-solution proxy (unipc-200; "
         "the euler-50-trajectory baseline below is scheme-biased toward "
         "euler-reduced rows)"),
        ("quality_curves.json", "Random-init weights"),
    ]:
        path = os.path.join(docs, fname)
        if not os.path.exists(path):
            continue
        with open(path) as f:
            r = json.load(f)
        lines.append(f"## {title}")
        lines.append("")
        lines.extend(_md_tables(r))
        lines.append("")
    lines.append(
        "Caveat: random-init curves measure SOLVER agreement on this exact\n"
        "architecture (structured non-random inputs), not perceptual video\n"
        "quality; trained-weight curves replace them automatically when\n"
        "checkpoints mount (zero-egress environment).")
    with open(os.path.join(docs, "QUALITY.md"), "w") as f:
        f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()

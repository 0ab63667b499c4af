"""Benchmark: generated-video seconds per minute per chip, 1.3B @ 512x512.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Round-5 redesign — FIT THE DRIVER CAPTURE WINDOW (VERDICT r4 items 1/2/7).
BENCH_r03 died rc=1 (tunnel outage mid-run); BENCH_r04 died rc=124 (the
bench measured ~6 full 50-step pipeline passes and outlived the driver's
timeout).  This version makes a captured line a *guarantee*, not a hope:

- **Hard wall-clock budget** (`BENCH_BUDGET_S`, default 900 s).  A watchdog
  thread emits the JSON line with whatever phases completed and `os._exit(0)`s
  the process ~25 s before the budget expires.  A hung backend init (dead
  axon tunnel — the round-3 failure) gets its own shorter deadline (150 s)
  so an outage documents itself early instead of eating the window.
- **Value-ordered phases.**  1) euler steady-state (the headline), 2) the
  UniPC-25 matched-quality operating point, 3) TeaCache, 4) weight-free
  diagnostics + the real-weights autoprobe.  Each later phase runs only if
  the remaining budget covers its estimated cost; skips are listed in
  `detail.skipped_phases`.
- **Step sub-sampling.**  Per-window-step time is shape-uniform (one jitted
  sweep program per step), so we measure `BENCH_STEPS` (default 10) steps
  and report the 50-step steady-state rate from the measured per-step time
  — the same extrapolation the round-4 bench already used for steady state,
  now applied to wall time too (a full euler-50 pass alone is ~325 s wall
  on the v5e; 10 steps is ~65 s).
- **One process, one backend init**, persistent compile cache shared across
  phases and across rounds.

Headline continuity (VERDICT r4 item 2): `value` is the SAME-SOLVER-SAME-
STEPS euler-50 steady-state rate, directly comparable to rounds 1-3 and to
the A100 baseline estimate.  The reduced-step (UniPC-25) and TeaCache
operating points are reported as clearly-labelled detail rows with their
quality evidence linked — not silently promoted into the trend slot.

Method: the REAL `generate_long` pipeline end-to-end at 512x512, overlap 15
(reference `inference.sh:13-24`) with enough audio for two sliding windows,
on the TPU inference fast path (split-pair rope + int8 QK self-attention +
W8A8 block linears, `utils/fastpath.py`; oracle-validated numerics in
tests/test_fastpath.py).  Steady state of the infinite stream: each sweep
advances (21 - 15) latent = 24 video frames, costing `steps` measured
window-steps plus the amortized segmented VAE decode + device->host
transfer.

vs_baseline compares against an A100 reference ESTIMATE for the same
pipeline (the reference publishes no numbers, BASELINE.md): ~4.2e14 DiT
FLOPs/step (3x CFG) at 312 TFLOPs bf16 and ~40% MFU (torch eager; the 1B
reference force-disables flash-attn, `wan_fantasy_transformer3d_1B.py:45-46`,
and recomputes wav2vec every (step x window),
`wan_inference_long_pipeline.py:727-729`) -> ~3.4 s/step -> ~0.34
video-s/min at 50 Euler steps.  Sensitivity: 30% MFU -> 0.26, 55% -> 0.47.
NOTE the hardware asymmetry: v5e peak is 197 TF/s bf16 vs A100's 312 — at
EQUAL MFU a v5e chip sustains 0.63x an A100.  See docs/PERF.md for the
measured roofline decomposition.
"""

import json
import os
import subprocess
import sys
import threading
import time

import numpy as np

A100_REF_VIDEO_SEC_PER_MIN = 0.34  # ESTIMATED reference throughput (docstring)

# Published TeaCache-for-Wan2.1 envelope: ~1.6-2.1x at recommended
# thresholds; the conservative low end grounds the skip-fraction cap used
# for the random-init model (which over-skips; measured ~0.84 vs trained).
TEACACHE_PUBLISHED_SPEEDUP_LOW = 1.6

BACKEND_INIT_DEADLINE_S = 150.0  # dead-tunnel early exit (round-3 outage mode)
WATCHDOG_MARGIN_S = 25.0         # emit this long before the budget expires


class BenchState:
    """Shared between the measuring thread and the watchdog: the best
    currently-emittable result.  The watchdog prints it and exits if the
    budget runs out; the main path prints it on normal completion."""

    def __init__(self, budget_s: float):
        self.t0 = time.monotonic()
        self.budget_s = budget_s
        self.lock = threading.Lock()
        self.value = 0.0
        self.detail = {"completed_phases": [], "skipped_phases": []}
        self.error = None
        self.phase = "startup"
        self.phase_t0 = self.t0
        self._emitted = False

    def elapsed(self):
        return time.monotonic() - self.t0

    def remaining(self):
        return self.budget_s - self.elapsed()

    def set_phase(self, name):
        with self.lock:
            # record the finished phase's wall time so a PARTIAL emit still
            # documents where the budget went (r5 on-chip lesson: the 540 s
            # trial expired with completed_phases=["backend_init"] and no
            # timing evidence at all)
            self.detail.setdefault("phase_wall_s", {})[self.phase] = round(
                time.monotonic() - self.phase_t0, 1)
            self.phase = name
            self.phase_t0 = time.monotonic()

    def phase_done(self, name, **detail_updates):
        with self.lock:
            self.detail["completed_phases"].append(name)
            self.detail.update(detail_updates)

    def skip_phase(self, name, why):
        with self.lock:
            self.detail["skipped_phases"].append(f"{name}: {why}")

    def set_headline(self, value, **detail_updates):
        with self.lock:
            self.value = float(value)
            self.detail.update(detail_updates)

    def emit(self, final=True):
        """Print the ONE json line (first caller wins)."""
        with self.lock:
            if self._emitted:
                return False
            self._emitted = True
            detail = dict(self.detail)
            if not final:
                detail["watchdog"] = (
                    f"budget {self.budget_s:.0f}s expired during phase "
                    f"'{self.phase}' at {self.elapsed():.0f}s; partial result"
                )
            detail["bench_wall_s"] = round(self.elapsed(), 1)
            out = {
                "metric": "video_sec_per_min_per_chip",
                "value": round(float(self.value), 4),
                "unit": "video_s/min",
                "vs_baseline": round(self.value / A100_REF_VIDEO_SEC_PER_MIN, 3),
            }
            err = self.error
            if err is None and not final and self.value == 0.0:
                err = f"budget expired during '{self.phase}' before any measurement"
            if err is not None:
                out["error"] = str(err)[:800]
            out["detail"] = detail
            print(json.dumps(out), flush=True)
            return True


def start_watchdog(state: BenchState):
    def run():
        while True:
            time.sleep(2.0)
            with state.lock:
                if state._emitted:
                    return
                phase = state.phase
                phase_elapsed = time.monotonic() - state.phase_t0
            over_budget = state.remaining() <= WATCHDOG_MARGIN_S
            backend_hang = (
                phase == "backend_init"
                and phase_elapsed > BACKEND_INIT_DEADLINE_S
            )
            if backend_hang:
                state.error = (
                    f"TPU backend init hung >{BACKEND_INIT_DEADLINE_S:.0f}s "
                    "(axon tunnel outage)"
                )
            if over_budget or backend_hang:
                state.emit(final=False)
                # flush then hard-exit: the main thread may be blocked in a
                # hung RPC that would never return
                sys.stdout.flush()
                os._exit(0)

    t = threading.Thread(target=run, daemon=True, name="bench-watchdog")
    t.start()
    return t


def build_models(small, quant=True):
    from stableavatar_tpu.config import (
        WAN_1_3B, CLIPConfig, DiTConfig, VAEConfig, Wav2Vec2Config,
    )
    from stableavatar_tpu.models.dit import cast_params, init_dit
    from stableavatar_tpu.models.vae import init_vae
    from stableavatar_tpu.models.clip import init_clip_visual
    from stableavatar_tpu.models.wav2vec import init_wav2vec2
    from stableavatar_tpu.pipelines.common import WanModels
    from stableavatar_tpu.utils.fastpath import prepare_fast_params

    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)

    if small:
        cfg = DiTConfig(dim=128, ffn_dim=256, num_heads=8, num_layers=4,
                        audio_proj_dim=128, vocal_num_heads=8)
    else:
        cfg = WAN_1_3B
    vae_cfg = VAEConfig()
    clip_cfg = CLIPConfig()
    w2v_cfg = Wav2Vec2Config()

    dit_params = cast_params(init_dit(ks[0], cfg), jnp.bfloat16)
    dit_params = prepare_fast_params(dit_params, cfg, quant=quant)
    vae_params = cast_params(init_vae(ks[1], vae_cfg), jnp.bfloat16)
    clip_params = cast_params(init_clip_visual(ks[2], clip_cfg), jnp.bfloat16)
    w2v_params = init_wav2vec2(ks[3], w2v_cfg)

    return WanModels(
        dit_params=dit_params,
        dit_cfg=cfg,
        vae_params=vae_params,
        vae_cfg=vae_cfg,
        clip_params=clip_params,
        clip_cfg=clip_cfg,
        wav2vec_params=w2v_params,
        wav2vec_cfg=w2v_cfg,
        rope_split=True,
        attn_quant="qk" if quant else "none",
    )


def run_pipeline(models, *, size, steps, seed, n_windows, overlap=15, fps=25,
                 sr=16000, scheduler="euler"):
    """One generate_long call sized for `n_windows` sliding windows."""
    import jax
    import jax.numpy as jnp

    from stableavatar_tpu.pipelines.long import generate_long
    from stableavatar_tpu.utils.profiling import StepTimer

    infer_length = 21 + (21 - overlap) * (n_windows - 1)
    total_video_frames = (infer_length - 1) * 4 + 1
    n_samples = total_video_frames * (sr // fps)

    rng = np.random.default_rng(0)
    ref_image = rng.standard_normal((1, 3, size, size)).astype(np.float32) * 0.2
    wav = rng.standard_normal((n_samples,)).astype(np.float32) * 0.05

    text_ctx = jnp.asarray(
        rng.standard_normal((3, models.dit_cfg.text_len, models.dit_cfg.text_dim)),
        jnp.bfloat16,
    )

    # JAX dispatch is async: force a host read on the LAST step so the whole
    # (sequentially-chained) denoise wall lands in the denoise_step phase and
    # the decode phase measures only the decode
    def sync_last(i, lat):
        if i == steps - 1:
            float(jnp.sum(lat[0, 0, 0, 0, 0]))

    timer = StepTimer()
    t0 = time.perf_counter()
    out = generate_long(
        models,
        ref_image=ref_image,
        vocal_waveform=wav,
        text_ctx=text_ctx,
        num_inference_steps=steps,
        overlap_window_length=overlap,
        seed=seed,
        scheduler=scheduler,
        timer=timer,
        step_callback=sync_last,
    )
    jax.block_until_ready(out.latents)
    wall = time.perf_counter() - t0
    # force the numpy video (generate_long already materialized it)
    video_frames = out.videos.shape[2]
    return wall, timer.summary(), video_frames


def schedule_skip_fraction(steps: int, thresh: float = 0.1,
                           skip_start: int = 5, n_windows: int = 2,
                           shift: float = 5.0) -> float:
    """Weight-free diagnostic: run the TeaCache controller over the rel-L1
    trajectory of the raw SINUSOIDAL timestep features of the actual
    shifted schedule (the e0 signal before the time-MLP; the published 4x5
    polynomial then rescales it)."""
    from stableavatar_tpu.models.teacache import (
        TeaCache, get_teacache_coefficients,
    )
    from stableavatar_tpu.schedulers.flow_match import flow_match_timesteps

    import jax.numpy as jnp

    from stableavatar_tpu.ops.embeddings import sinusoidal_embedding_1d

    sched = flow_match_timesteps(steps, shift=shift)
    ts = jnp.asarray(np.asarray(sched.timesteps), jnp.float32)
    embs = np.asarray(sinusoidal_embedding_1d(256, ts))  # one device op, host loop after
    tc = TeaCache(get_teacache_coefficients("wan2.1-t2v-1.3b"), steps,
                  rel_l1_thresh=thresh, num_skip_start_steps=skip_start)
    have = False
    for i in range(steps):
        for _ in range(n_windows):
            if tc.plan(embs[i : i + 1], can_skip=have):
                have = True
    return tc.skipped_calls / max(tc.total_calls, 1)


def maybe_autoprobe_weights(state: BenchState):
    """Zero-latency real-weights parity: check the standard checkpoint
    mounts (cheap filesystem walk); the first time one appears, the parity
    harness runs automatically — with whatever budget remains."""
    try:
        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "scripts"))
        from weights_autoprobe import find_ckpt_root

        if find_ckpt_root() is None:
            return
        probe_budget = state.remaining() - WATCHDOG_MARGIN_S - 10
        if probe_budget < 120:
            state.skip_phase("weights_autoprobe",
                             "checkpoint root found but budget exhausted")
            return
        subprocess.run(
            [sys.executable,
             os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "scripts", "weights_autoprobe.py")],
            timeout=probe_budget, check=False,
        )
        state.phase_done("weights_autoprobe")
    except Exception as e:  # noqa: BLE001 — the probe must never kill a bench
        print(f"weights_autoprobe skipped: {e}", file=sys.stderr)


def run_bench(state: BenchState):
    state.set_phase("backend_init")
    import jax

    p = os.environ.get("JAX_PLATFORMS")
    if p:
        jax.config.update("jax_platforms", p)

    # persistent compile cache: shared across phases AND across rounds —
    # without it a fresh bench process leaks stray compiles into measured
    # phases (round-2's "VAE decode 1.94 fps" was exactly this)
    jax.config.update("jax_compilation_cache_dir", "/tmp/stableavatar_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    jax.devices()  # force backend init under the watchdog's 150 s deadline
    if jax.default_backend() not in ("tpu",):
        # CPU-fallback smoke: do NOT share the TPU cache dir — XLA:CPU AOT
        # entries written on one host SIGILL/segfault when loaded after the
        # session migrates machines (tests/conftest.py has the history)
        jax.config.update("jax_compilation_cache_dir", None)
    state.phase_done("backend_init", backend=jax.default_backend())

    small = os.environ.get("BENCH_SMALL") == "1"
    # sub-sampled measurement steps; steady-state per-step time is
    # shape-uniform so the 50-step rate extrapolates from the mean
    steps = int(os.environ.get("BENCH_STEPS", "4" if small else "10"))
    full_steps = 50                        # the reference operating point
    rs_steps_op = 25                       # UniPC matched-quality point
    size = 64 if small else 512
    n_windows = 2
    overlap = 15
    fps = 25
    adv_video_frames = (21 - overlap) * 4  # per-sweep advance, steady state

    state.set_phase("build_models")
    models = build_models(small)

    # ---------------- phase 1: euler headline ----------------
    state.set_phase("euler_warmup")
    # warmup compiles every shape (full window, final window, vae, encoders)
    run_pipeline(models, size=size, steps=2, seed=1, n_windows=n_windows,
                 overlap=overlap)
    warm_s = time.monotonic() - state.phase_t0

    def euler_headline(wall, phases, video_frames, n_steps, provisional):
        """Compute + install the euler-50 steady-state headline from one
        measured pass; returns (out_cost, t_wstep) for the later phases."""
        denoise_total = phases["denoise_step"]["total_s"]
        t_wstep = denoise_total / (n_steps * n_windows)
        vae_s = phases["vae_decode"]["total_s"]
        vae_fps = video_frames / max(vae_s, 1e-9)
        # device->host video transfer (u8 over the remote tunnel) — measured
        # as its own phase; part of the amortized per-sweep cost
        xfer_s = phases.get("video_transfer", {}).get("total_s", 0.0)
        xfer_fps = video_frames / max(xfer_s, 1e-9)
        finite_rate = (video_frames / fps) / wall * 60.0
        # steady state of the infinite stream at 50-step euler quality
        # (decode AND host transfer amortized per 24-frame sweep advance)
        out_cost = (adv_video_frames / max(vae_fps, 1e-9)
                    + adv_video_frames / max(xfer_fps, 1e-9))
        sweep_s = full_steps * t_wstep + out_cost
        steady_rate = (adv_video_frames / fps) / sweep_s * 60.0
        state.set_headline(
            steady_rate,
            headline=(f"euler-{full_steps} steady-state (same solver/steps as "
                      f"the reference default, inference.sh:17; per-step time "
                      f"measured over {n_steps} steps x {n_windows} windows"
                      + (", PROVISIONAL short pass)" if provisional else ")")),
            baseline_note="vs_baseline denominator is an ESTIMATED A100 rate "
                          "(0.34 video-s/min at 40% MFU; see module docstring)",
            euler50_window_step_s=round(t_wstep, 4),
            euler50_video_s_per_min=round(steady_rate, 4),
            euler50_finite_run_video_s_per_min=round(finite_rate, 4),
            vae_decode_fps=round(vae_fps, 2),
            video_transfer_fps=round(xfer_fps, 2),
            decode_plus_transfer_fps=round(
                video_frames / max(vae_s + xfer_s, 1e-9), 2),
            measured_run_wall_s=round(wall, 2),
            warmup_compile_s=round(warm_s, 1),
            fast_path="rope_split + int8-qk self-attn + w8a8 linears",
            small=small,
            steps_measured=n_steps,
        )
        return out_cost, t_wstep

    # SECURE a headline first with a short pass (everything is compiled now,
    # so this is pure measurement), then REFINE with the full `steps` pass if
    # the budget allows.  The r5 540 s on-chip trial died mid-measure with
    # value=0.0 — never again: the short pass makes the first number land
    # within ~1 min of warmup finishing.
    quick_steps = min(4, steps)
    state.set_phase("euler_measure_quick")
    wall_q, phases_q, frames_q = run_pipeline(
        models, size=size, steps=quick_steps, seed=42, n_windows=n_windows,
        overlap=overlap,
    )
    out_cost, t_wstep = euler_headline(
        wall_q, phases_q, frames_q, quick_steps, provisional=True)
    state.phase_done("euler_quick")

    measure_cost = wall_q  # actual cost of one measured pass
    measured_pass_steps = quick_steps
    if steps > quick_steps:
        est = measure_cost * (steps / quick_steps) * 1.2
        if state.remaining() - WATCHDOG_MARGIN_S < est:
            state.skip_phase("euler_refine", f"needs ~{est:.0f}s, "
                                             f"{state.remaining():.0f}s left")
        else:
            state.set_phase("euler_measure")
            wall, phases, video_frames = run_pipeline(
                models, size=size, steps=steps, seed=42, n_windows=n_windows,
                overlap=overlap,
            )
            out_cost, t_wstep = euler_headline(
                wall, phases, video_frames, steps, provisional=False)
            state.phase_done("euler")
            measure_cost = wall
            measured_pass_steps = steps

    # ------------- phase 2: UniPC matched-quality point -------------
    # warmup compiles the multistep sweep (blend=False step 0 + blend=True)
    est = measure_cost * ((3 + steps) / measured_pass_steps) + 60
    if state.remaining() - WATCHDOG_MARGIN_S < est:
        state.skip_phase("unipc", f"needs ~{est:.0f}s, "
                                  f"{state.remaining():.0f}s left")
    else:
        state.set_phase("unipc_warmup")
        run_pipeline(models, size=size, steps=3, seed=1, n_windows=n_windows,
                     overlap=overlap, scheduler="unipc")
        state.set_phase("unipc_measure")
        wall_rs, phases_rs, _ = run_pipeline(
            models, size=size, steps=steps, seed=42, n_windows=n_windows,
            overlap=overlap, scheduler="unipc",
        )
        t_wstep_rs = phases_rs["denoise_step"]["total_s"] / (steps * n_windows)
        sweep_rs = rs_steps_op * t_wstep_rs + out_cost
        steady_rate_rs = (adv_video_frames / fps) / sweep_rs * 60.0
        state.phase_done(
            "unipc",
            unipc25_note=("ALTERNATIVE OPERATING POINT: UniPC order-2 @ 25 "
                          "steps ~ euler-50 quality (measured PSNR-vs-steps "
                          "curve: docs/QUALITY.md; solver step-parity: "
                          "tests/test_solver_parity.py). The reference ships "
                          "UniPC as a live injectable scheduler, "
                          "wan/utils/__init__.py:1-3"),
            unipc25_window_step_s=round(t_wstep_rs, 4),
            unipc25_video_s_per_min=round(steady_rate_rs, 4),
            unipc25_vs_baseline=round(
                steady_rate_rs / A100_REF_VIDEO_SEC_PER_MIN, 3),
        )

    # ---------------- phase 3: TeaCache ----------------
    # warmup (3 steps) + all-skip t_skip pass + thr-0.1 pass; the all-skip
    # pass mostly skips, so budget it at ~40% of a full pass
    est = measure_cost * ((3 + 1.4 * steps) / measured_pass_steps) + 60
    if state.remaining() - WATCHDOG_MARGIN_S < est:
        state.skip_phase("teacache", f"needs ~{est:.0f}s, "
                                     f"{state.remaining():.0f}s left")
    else:
        from stableavatar_tpu.models.teacache import (
            TeaCache, get_teacache_coefficients,
        )

        state.set_phase("teacache_warmup")
        # warmup that compiles BOTH sweep variants (all-compute and
        # all-skip): huge threshold + no start window forces skips early
        models.teacache = TeaCache(
            get_teacache_coefficients("wan2.1-t2v-1.3b"), 99,
            rel_l1_thresh=1e9, num_skip_start_steps=0,
        )
        run_pipeline(models, size=size, steps=3, seed=1, n_windows=n_windows,
                     overlap=overlap)
        # t_skip from a dedicated ALL-SKIP pass: with thresh=inf and no
        # start window, all but the first call per window skip, so the
        # skipped calls dominate the subtraction and tunnel variance in
        # t_wstep cannot blow up the estimate (at a thr-0.1 10-step pass
        # only ~4 of 20 calls skip and the estimator once produced a
        # nonsensical 3.53 s "skip step")
        state.set_phase("teacache_skiprate")
        models.teacache = TeaCache(
            get_teacache_coefficients("wan2.1-t2v-1.3b"), steps,
            rel_l1_thresh=1e9, num_skip_start_steps=0,
        )
        _, phases_sk, _ = run_pipeline(
            models, size=size, steps=steps, seed=42, n_windows=n_windows,
            overlap=overlap,
        )
        tc_sk = models.teacache
        computed_sk = tc_sk.total_calls - tc_sk.skipped_calls
        t_skip = (
            (phases_sk["denoise_step"]["total_s"] - computed_sk * t_wstep)
            / tc_sk.skipped_calls
            if tc_sk.skipped_calls else 0.0
        )
        t_skip = max(t_skip, 0.0)

        state.set_phase("teacache_measure")
        models.teacache = TeaCache(
            get_teacache_coefficients("wan2.1-t2v-1.3b"), steps,
            rel_l1_thresh=0.1, num_skip_start_steps=min(5, steps // 2),
        )
        run_pipeline(
            models, size=size, steps=steps, seed=42, n_windows=n_windows,
            overlap=overlap,
        )
        tc = models.teacache
        models.teacache = None
        skip_frac_randinit = tc.skipped_calls / max(tc.total_calls, 1)
        # random-init over-skips; cap at the LOW end of the published
        # TeaCache-for-Wan2.1 envelope (module docstring). The measured
        # rel_l1-vs-speedup frontier for THIS model: docs/QUALITY.md.
        skip_cap_published = 1.0 - 1.0 / TEACACHE_PUBLISHED_SPEEDUP_LOW
        skip_frac = min(skip_frac_randinit, skip_cap_published)
        eff_step = t_wstep * (1 - skip_frac) + t_skip * skip_frac
        sweep_tc = full_steps * eff_step + out_cost
        steady_rate_tc = (adv_video_frames / fps) / sweep_tc * 60.0
        state.phase_done(
            "teacache",
            teacache_note=("ALTERNATIVE OPERATING POINT: euler-50 + TeaCache "
                           "(thr 0.1, skip-first-5, app.py:284-285); skip "
                           "fraction capped at the published Wan2.1 envelope "
                           "low end because random-init weights over-skip"),
            teacache_video_s_per_min=round(steady_rate_tc, 4),
            teacache_vs_baseline=round(
                steady_rate_tc / A100_REF_VIDEO_SEC_PER_MIN, 3),
            teacache_skip_step_s=round(t_skip, 4),
            teacache_skip_frac_used=round(skip_frac, 3),
            teacache_skip_frac_randinit=round(skip_frac_randinit, 3),
            teacache_skip_cap_published=round(skip_cap_published, 3),
        )

    # ---------------- phase 4: cheap diagnostics ----------------
    if state.remaining() - WATCHDOG_MARGIN_S > 40:
        state.set_phase("diagnostics")
        try:
            state.phase_done(
                "diagnostics",
                teacache_skip_frac_schedule_derived=round(
                    schedule_skip_fraction(full_steps), 3),
            )
        except Exception as e:  # noqa: BLE001
            state.skip_phase("diagnostics", str(e)[:120])
    else:
        state.skip_phase("diagnostics", "budget")

    state.set_phase("weights_autoprobe")
    maybe_autoprobe_weights(state)


def main():
    # r2 (rc=0) captured a run whose MEASURED pass alone was 424 s (plus a
    # teacache pass + compiles: >=15 min total) => the driver window is at
    # least ~20 min.  r4 (rc=124) needed ~25-35 min.  The first r5 on-chip
    # trial proved 540 s too small (build+warmup compiles alone ~8 min cold).
    # Two r5 on-chip captures at 900 s landed rc=0 with walls 709/854 s but
    # skipped the TeaCache phase by ~20-120 s; 1050 s fits it (measured
    # need: warmup <=541 + phases ~450) and the watchdog still emits >=2.5
    # min before a 20-min window.
    budget = float(os.environ.get("BENCH_BUDGET_S", "1050"))
    state = BenchState(budget)
    start_watchdog(state)
    try:
        run_bench(state)
    except Exception as e:  # noqa: BLE001 — a crash must still emit a line
        import traceback

        tb = traceback.format_exc().strip().splitlines()
        if state.value == 0.0:
            state.error = (f"{type(e).__name__}: {e} | "
                           f"{' / '.join(tb[-3:])}")
        else:  # headline already secured; record the late failure only
            state.detail["late_error"] = (
                f"phase '{state.phase}': {type(e).__name__}: {e}")
    state.emit(final=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Multistep flow-matching solvers: DPM-Solver++(2M) and UniPC.

TPU-native equivalents of the reference's vendored
`wan/utils/fm_solvers.py` (FlowDPMSolverMultistepScheduler, 857 LoC) and
`fm_solvers_unipc.py` (FlowUniPCMultistepScheduler, 800 LoC), re-derived
from the published algorithms (DPM-Solver++ arXiv:2211.01095, UniPC
arXiv:2302.04867) for the rectified-flow parameterization:

  x_t = (1-σ) x0 + σ ε,  α_t = 1-σ_t,  λ_t = log α_t - log σ_t,
  velocity prediction v -> data prediction x0 = x - σ v.

State (previous x0 predictions) is an explicit pytree carried by the caller
— jit-friendly, no hidden counters; the sliding-window pipeline's per-window
"_step_index reset" is the natural consequence of passing state explicitly.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp

from stableavatar_tpu.schedulers.flow_match import FlowMatchEulerSchedule, flow_match_timesteps


def get_sampling_sigmas(sampling_steps: int, shift: float):
    """Shifted sigma ladder used by the reference entry points
    (`wan/utils/fm_solvers.py` re-export)."""
    import numpy as np

    sigma = np.linspace(1, 0, sampling_steps + 1)[:sampling_steps]
    sigma = shift * sigma / (1 + (shift - 1) * sigma)
    return sigma


def _to_x0(sample, v, sigma):
    # velocity -> data prediction for rectified flow
    return sample - sigma * v


def _make_sched(num_steps: int, shift: float, sigmas=None) -> FlowMatchEulerSchedule:
    """Build the schedule; `sigmas` (S+1 values incl. terminal) overrides the
    default shifted ladder — used by the parity tests to drive our solvers on
    the reference's exact ladder."""
    if sigmas is None:
        return flow_match_timesteps(num_steps, shift=shift)
    sig = jnp.asarray(sigmas, jnp.float32)
    return FlowMatchEulerSchedule(sigmas=sig, timesteps=sig[:-1] * 1000.0)


@dataclasses.dataclass
class MultistepState:
    """Carry for multistep solvers: ring buffer of previous x0 predictions,
    plus (UniPC) the sample the last predictor started from and its order."""

    x0_prev: Optional[jnp.ndarray] = None  # x0 at step i-1
    x0_prev2: Optional[jnp.ndarray] = None  # x0 at step i-2
    x0_prev3: Optional[jnp.ndarray] = None  # x0 at step i-3 (UniPC-3 corrector)
    last_sample: Optional[jnp.ndarray] = None  # UniPC corrector input
    prev_order: int = 1  # order used by the last predictor


def dpm_effective_order(i: int, num_steps: int, order: int,
                        lower_order_final: bool = True,
                        euler_at_final: bool = False) -> int:
    """The order the reference DPM++ step actually uses at step i
    (`wan/utils/fm_solvers.py:746-783`): lower_order_nums warmup (step 0 is
    order 1, step 1 at most order 2), order 1 at the final step
    (final_sigmas_type="zero" default, `:747-749`; `euler_at_final=True` is
    therefore a no-op on the zero ladder — kept for option-surface parity),
    and — only for runs shorter than 15 steps with `lower_order_final` —
    order 2 at the second-to-last step (`:750-752`).

    (`final_sigmas_type="sigma_min"` and the `sde-dpmsolver++` algorithm
    that requires it are DEAD options in the reference: set_timesteps
    dereferences `self.alphas_cumprod`, which is never defined in the
    flow-match vendored file — `fm_solvers.py:261-263` AttributeErrors.)"""
    del euler_at_final  # subsumed by the zero terminal sigma (see docstring)
    if i == 0 or i == num_steps - 1 or order == 1:
        return 1
    if order == 2 or i == 1 or (
        i == num_steps - 2 and num_steps < 15 and lower_order_final
    ):
        return 2
    return 3


def dpm_coeffs(sched: FlowMatchEulerSchedule, i: int, order: int,
               solver_type: str = "midpoint",
               lower_order_final: bool = True,
               euler_at_final: bool = False):
    """Host-side per-step scalars for the DPM-Solver++ multistep update,
    linearized over the x0-prediction history (m0=x0(i), m1=x0(i-1),
    m2=x0(i-2), `fm_solvers.py:529-593,596-680`):

        x0 = sample - σ_i v;   x_next = A·sample + b0·x0 + b1·x0_prev + b2·x0_prev2

    `solver_type` is the reference's midpoint/heun D1 weighting at order 2
    (`fm_solvers.py:551-558`; heun replaces the 1/2·D1 midpoint rule with
    ((e^-h-1)/h + 1)·D1/B).  The per-step structure (first/last step,
    warmup, lower_order_final, order 1/2/3) is folded into the VALUES so
    one compiled program serves every step — this is what lets
    `generate_long` run multistep solvers inside its single-dispatch sweep
    (`pipelines/long.py:_sweep_step_ms`)."""
    import numpy as np

    if solver_type not in ("midpoint", "heun"):
        raise ValueError(f"unknown solver_type {solver_type!r}")

    def out(A=0.0, b0=0.0, b1=0.0, b2=0.0):
        # float64 host math, f32 at the boundary: linearizing the reference's
        # update into (A, b0, b1, b2) concentrates its per-term f32 roundoff
        # into single coefficients — computed in f32 the order-3 b0/b1 lose
        # ~2.5e-4 to cancellation (measured vs a probe of the reference's
        # own update); in f64 they match it to ~5e-8
        return {k: jnp.float32(v) for k, v in
                dict(A=A, b0=b0, b1=b1, b2=b2).items()}

    eff = dpm_effective_order(
        i, sched.num_steps, order, lower_order_final, euler_at_final
    )
    if i == sched.num_steps - 1:
        # final step to sigma=0 lands exactly on x0
        return out(b0=1.0)
    sig = np.asarray(sched.sigmas, np.float64)

    def lam(s):
        return float(np.log(max(1.0 - s, 1e-6)) - np.log(max(s, 1e-6)))

    s_i, s_n = sig[i], sig[i + 1]
    h = lam(s_n) - lam(s_i)
    a_n = 1.0 - s_n
    A = s_n / s_i
    B = -a_n * np.expm1(-h)
    if eff == 1:
        return out(A=A, b0=B)
    r0 = (lam(s_i) - lam(sig[i - 1])) / h
    if eff == 2:
        if solver_type == "heun":
            # heun rule (`fm_solvers.py:555-558`):
            # x = A·x + B·D0 + G1·D1, D1 = (m0 - m1)/r0
            G1 = a_n * (np.expm1(-h) / h + 1.0)
            return out(A=A, b0=B + G1 / r0, b1=-G1 / r0)
        # midpoint rule: D1 = (m0 - m1)/r0, x = A·x + B·(D0 + D1/2)
        c = 1.0 / (2.0 * r0)
        return out(A=A, b0=B * (1.0 + c), b1=-B * c)
    # third order (`fm_solvers.py:640-673`)
    r1 = (lam(sig[i - 1]) - lam(sig[i - 2])) / h
    G1 = a_n * (np.expm1(-h) / h + 1.0)
    G2 = -a_n * ((np.expm1(-h) + h) / (h * h) - 0.5)
    w = r0 / (r0 + r1)
    # D1 = (1+w)·(m0-m1)/r0 - w·(m1-m2)/r1;  D2 = (D1_0 - D1_1)/(r0+r1)
    b0 = B + G1 * (1.0 + w) / r0 + G2 / (r0 * (r0 + r1))
    b1 = (-G1 * ((1.0 + w) / r0 + w / r1)
          - G2 * (1.0 / r0 + 1.0 / r1) / (r0 + r1))
    b2 = G1 * w / r1 + G2 / (r1 * (r0 + r1))
    return out(A=A, b0=b0, b1=b1, b2=b2)


def dpm_apply(sample, v, sigma_i, x0_prev, x0_prev2, *, A, b0, b1, b2):
    """Jit-friendly DPM++ update (any order); returns (x_next, x0)."""
    sample = sample.astype(jnp.float32)
    v = v.astype(jnp.float32)
    x0 = sample - sigma_i * v
    return A * sample + b0 * x0 + b1 * x0_prev + b2 * x0_prev2, x0


def _unipc_rhos(hh: float, b_h: float, rks, order: int, corrector: bool):
    """The reference's R/b system (`fm_solvers_unipc.py:571-607` corrector,
    `:427-463` predictor): rho weights of the D1 differences.  Host-side
    float64 numpy (2x2/3x3 solves of per-step scalars)."""
    import numpy as np

    rks = np.asarray(list(rks) + [1.0], np.float64)
    R, b = [], []
    h_phi_k = np.expm1(hh) / hh - 1.0
    factorial_i = 1.0
    for k in range(1, order + 1):
        R.append(rks ** (k - 1))
        b.append(h_phi_k * factorial_i / b_h)
        factorial_i *= k + 1
        h_phi_k = h_phi_k / hh - 1.0 / factorial_i
    R = np.stack(R)
    b = np.asarray(b, np.float64)
    if corrector:
        # order 1 -> simplified [0.5] (`:604-605`); else solve the full system
        if order == 1:
            return np.asarray([0.5])
        return np.linalg.solve(R, b)
    # predictor: order 2 -> simplified [0.5] (`:457-458`); order >= 3 solves
    # the leading subsystem
    if order == 2:
        return np.asarray([0.5])
    return np.linalg.solve(R[:-1, :-1], b[:-1])


def unipc_coeffs(sched: FlowMatchEulerSchedule, i: int, order: int,
                 prev_order: int, solver_type: str = "bh2",
                 use_corrector: bool = True):
    """Host-side per-step scalars for the UniPC update (corrector then
    predictor, `fm_solvers_unipc.py:487-630,655-740`, orders 1-3,
    B(h) variants bh1/bh2, x0-prediction), linearized as

        x0        = sample - σ_i v
        corrected = Cs·sample + Cx·last_sample + Cm·x0_prev
                    + Cd1·(x0 - x0_prev) + Cd1s·(x0_prev2 - x0_prev)
                    + Cd1s2·(x0_prev3 - x0_prev)
        x_next    = Px·corrected + P0·x0 + Pd·(x0_prev - x0)
                    + Pd2·(x0_prev2 - x0)

    First step / last step / warmup-order structure is folded into the
    VALUES so one compiled program serves every step (the long pipeline's
    single-dispatch multistep sweep).  `use_corrector=False` reproduces the
    reference's per-step `disable_corrector` list (`:689-693` — step i's
    corrector is disabled when i-1 is listed).  Returns
    (coeff dict, this_order)."""
    import numpy as np

    if solver_type not in ("bh1", "bh2"):
        raise ValueError(f"unknown solver_type {solver_type!r}")
    if order > 3:
        raise ValueError("UniPC orders 1-3 supported (reference default 2)")
    sig = np.asarray(sched.sigmas, np.float64)

    def lam(s):
        return float(np.log(max(1.0 - s, 1e-10)) - np.log(max(s, 1e-10)))

    def f32(x):
        return jnp.float32(x)

    z, one = f32(0.0), f32(1.0)
    # this_order = min(order, steps-i [lower_order_final], warmup i+1) (`:712-720`)
    this_order = min(order, sched.num_steps - i, i + 1)
    zc = {"Cs": z, "Cx": z, "Cm": z, "Cd1": z, "Cd1s": z, "Cd1s2": z}
    if i == 0 or not use_corrector:
        # no corrector on the first step (`:700` last_sample is None)
        cc = dict(zc, Cs=one)
    else:
        s_t, s_s0 = sig[i], sig[i - 1]
        a_t = 1.0 - s_t
        h = lam(s_t) - lam(s_s0)
        hh = -h  # predict_x0 convention
        h_phi_1 = np.expm1(hh)
        b_h = hh if solver_type == "bh1" else h_phi_1
        # corrector order = the order the LAST predictor used (`:699-703`)
        p = prev_order
        rks = [(lam(sig[i - 1 - k]) - lam(s_s0)) / h for k in range(1, p)]
        rhos = _unipc_rhos(hh, b_h, rks, p, corrector=True)
        cc = dict(zc, Cx=f32(s_t / s_s0), Cm=f32(-a_t * h_phi_1),
                  Cd1=f32(-a_t * b_h * rhos[-1]))
        for k, key in zip(range(1, p), ("Cd1s", "Cd1s2")):
            cc[key] = f32(-a_t * b_h * rhos[k - 1] / rks[k - 1])
    if i == sched.num_steps - 1:
        # sigma_next == 0: the order-1 update collapses to x0 exactly
        # (the corrector above still applied; this_order == 1 here)
        cc.update({"Px": z, "P0": one, "Pd": z, "Pd2": z})
    else:
        s_i, s_n = sig[i], sig[i + 1]
        a_n = 1.0 - s_n
        h = lam(s_n) - lam(s_i)
        hh = -h
        h_phi_1 = np.expm1(hh)
        b_h = hh if solver_type == "bh1" else h_phi_1
        cc.update({"Px": f32(s_n / s_i), "P0": f32(-a_n * h_phi_1),
                   "Pd": z, "Pd2": z})
        if this_order >= 2:
            rks = [(lam(sig[i - k]) - lam(s_i)) / h
                   for k in range(1, this_order)]
            rhos = _unipc_rhos(hh, b_h, rks, this_order, corrector=False)
            for k, key in zip(range(1, this_order), ("Pd", "Pd2")):
                cc[key] = f32(-a_n * b_h * rhos[k - 1] / rks[k - 1])
    return cc, this_order


def unipc_apply(sample, v, sigma_i, x0_prev, x0_prev2, last_sample, *,
                Cs, Cx, Cm, Cd1, Px, P0, Pd,
                x0_prev3=None, Cd1s=None, Cd1s2=None, Pd2=None):
    """Jit-friendly UniPC update; returns (x_next, x0, corrected_sample).
    x0 comes from the INCOMING (uncorrected) sample — this is what enters
    the history ring (`fm_solvers_unipc.py:695-710`).  The third-order
    history term (x0_prev3/Cd1s2/Pd2) is optional so the order-2 sweep
    carries no dead buffer."""
    sample = sample.astype(jnp.float32)
    v = v.astype(jnp.float32)
    x0 = sample - sigma_i * v
    corrected = (
        Cs * sample + Cx * last_sample + Cm * x0_prev
        + Cd1 * (x0 - x0_prev)
    )
    if Cd1s is not None:
        corrected = corrected + Cd1s * (x0_prev2 - x0_prev)
    if Cd1s2 is not None and x0_prev3 is not None:
        corrected = corrected + Cd1s2 * (x0_prev3 - x0_prev)
    x_t = Px * corrected + P0 * x0 + Pd * (x0_prev - x0)
    if Pd2 is not None:
        x_t = x_t + Pd2 * (x0_prev2 - x0)
    return x_t, x0, corrected


class FlowDPMSolverMultistep:
    """DPM-Solver++ multistep (orders 1-3) on the flow-matching sigma
    ladder; order-3 step-parity vs the vendored reference scheduler is in
    tests/test_solver_parity.py."""

    def __init__(self, num_steps: int, shift: float = 5.0, order: int = 2,
                 sigmas=None, solver_type: str = "midpoint",
                 lower_order_final: bool = True, euler_at_final: bool = False):
        self.sched: FlowMatchEulerSchedule = _make_sched(num_steps, shift, sigmas)
        self.order = order
        self.solver_type = solver_type
        self.lower_order_final = lower_order_final
        self.euler_at_final = euler_at_final

    @property
    def timesteps(self):
        return self.sched.timesteps

    @property
    def sigmas(self):
        return self.sched.sigmas

    def step(
        self, v: jnp.ndarray, i: int, sample: jnp.ndarray, state: MultistepState
    ) -> Tuple[jnp.ndarray, MultistepState]:
        sample = sample.astype(jnp.float32)
        zeros = jnp.zeros_like(sample)
        co = dpm_coeffs(self.sched, i, self.order, self.solver_type,
                        self.lower_order_final, self.euler_at_final)
        out, x0 = dpm_apply(
            sample, v, self.sched.sigmas[i],
            state.x0_prev if state.x0_prev is not None else zeros,
            state.x0_prev2 if state.x0_prev2 is not None else zeros,
            **co,
        )
        return out, MultistepState(x0, state.x0_prev)


class FlowUniPCMultistep:
    """UniPC-2 (unified predictor + corrector, B(h)=e^hh-1 "bh2" variant,
    x0-prediction) on the flow-matching sigma ladder.

    Step-for-step match of the reference vendored FlowUniPCMultistepScheduler
    (`wan/utils/fm_solvers_unipc.py:655-740`, corrector `:487-630`), verified
    in tests/test_solver_parity.py: each `step(v_i, i, x_i)` first CORRECTS
    the previous prediction x_i using the fresh model evaluation (UniC with
    the order the last predictor used), then runs the UniP predictor from
    the corrected sample reusing the same x0."""

    def __init__(self, num_steps: int, shift: float = 5.0, order: int = 2,
                 sigmas=None, solver_type: str = "bh2",
                 disable_corrector=()):
        self.sched = _make_sched(num_steps, shift, sigmas)
        self.order = order
        self.solver_type = solver_type
        # reference semantics (`fm_solvers_unipc.py:689-693`): step i's
        # corrector is skipped when i-1 appears in the list
        self.disable_corrector = tuple(disable_corrector)

    @property
    def timesteps(self):
        return self.sched.timesteps

    @property
    def sigmas(self):
        return self.sched.sigmas

    def step(
        self, v: jnp.ndarray, i: int, sample: jnp.ndarray, state: MultistepState
    ) -> Tuple[jnp.ndarray, MultistepState]:
        sample = sample.astype(jnp.float32)
        zeros = jnp.zeros_like(sample)
        co, this_order = unipc_coeffs(
            self.sched, i, self.order, state.prev_order, self.solver_type,
            use_corrector=(i - 1) not in self.disable_corrector,
        )
        x_t, x0, corrected = unipc_apply(
            sample, v, self.sched.sigmas[i],
            state.x0_prev if state.x0_prev is not None else zeros,
            state.x0_prev2 if state.x0_prev2 is not None else zeros,
            state.last_sample if state.last_sample is not None else zeros,
            x0_prev3=state.x0_prev3 if state.x0_prev3 is not None else zeros,
            **co,
        )
        return x_t, MultistepState(
            x0_prev=x0,
            x0_prev2=state.x0_prev,
            x0_prev3=state.x0_prev2,
            last_sample=corrected,
            prev_order=this_order,
        )

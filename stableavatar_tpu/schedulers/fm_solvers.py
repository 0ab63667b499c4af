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
    last_sample: Optional[jnp.ndarray] = None  # UniPC corrector input
    prev_order: int = 1  # order used by the last predictor


def _lam_dpm(sigma):
    a = jnp.maximum(1.0 - sigma, 1e-6)
    s = jnp.maximum(sigma, 1e-6)
    return jnp.log(a) - jnp.log(s)


def dpm_effective_order(i: int, num_steps: int, order: int) -> int:
    """The order the reference DPM++ step actually uses at step i
    (`wan/utils/fm_solvers.py:746-783`): lower_order_nums warmup (step 0 is
    order 1, step 1 at most order 2), order 1 at the final step
    (final_sigmas_type="zero" default, `:747-749`), and — only for runs
    shorter than 15 steps — order 2 at the second-to-last step (`:750-752`)."""
    if i == 0 or i == num_steps - 1 or order == 1:
        return 1
    if order == 2 or i == 1 or (i == num_steps - 2 and num_steps < 15):
        return 2
    return 3


def dpm_coeffs(sched: FlowMatchEulerSchedule, i: int, order: int):
    """Host-side per-step scalars for the DPM-Solver++ multistep update,
    linearized over the x0-prediction history (m0=x0(i), m1=x0(i-1),
    m2=x0(i-2), `fm_solvers.py:529-593,596-680`):

        x0 = sample - σ_i v;   x_next = A·sample + b0·x0 + b1·x0_prev + b2·x0_prev2

    The per-step structure (first/last step, warmup, lower_order_final,
    order 1/2/3) is folded into the VALUES so one compiled program serves
    every step — this is what lets `generate_long` run multistep solvers
    inside its single-dispatch sweep (`pipelines/long.py:_sweep_step_ms`)."""
    z = jnp.float32(0.0)
    eff = dpm_effective_order(i, sched.num_steps, order)
    if i == sched.num_steps - 1:
        # final step to sigma=0 lands exactly on x0
        return {"A": z, "b0": jnp.float32(1.0), "b1": z, "b2": z}
    s_i = sched.sigmas[i]
    s_n = sched.sigmas[i + 1]
    lam_i, lam_n = _lam_dpm(s_i), _lam_dpm(s_n)
    h = lam_n - lam_i
    a_n = 1.0 - s_n
    A = s_n / s_i
    B = -a_n * (jnp.exp(-h) - 1.0)
    if eff == 1:
        return {"A": A, "b0": B, "b1": z, "b2": z}
    r0 = (lam_i - _lam_dpm(sched.sigmas[i - 1])) / h
    if eff == 2:
        # midpoint rule: D1 = (m0 - m1)/r0, x = A·x + B·(D0 + D1/2)
        c = 1.0 / (2.0 * r0)
        return {"A": A, "b0": B * (1.0 + c), "b1": -B * c, "b2": z}
    # third order (`fm_solvers.py:640-673`)
    r1 = (_lam_dpm(sched.sigmas[i - 1]) - _lam_dpm(sched.sigmas[i - 2])) / h
    G1 = a_n * ((jnp.exp(-h) - 1.0) / h + 1.0)
    G2 = -a_n * ((jnp.exp(-h) - 1.0 + h) / (h * h) - 0.5)
    w = r0 / (r0 + r1)
    # D1 = (1+w)·(m0-m1)/r0 - w·(m1-m2)/r1;  D2 = (D1_0 - D1_1)/(r0+r1)
    b0 = B + G1 * (1.0 + w) / r0 + G2 / (r0 * (r0 + r1))
    b1 = (-G1 * ((1.0 + w) / r0 + w / r1)
          - G2 * (1.0 / r0 + 1.0 / r1) / (r0 + r1))
    b2 = G1 * w / r1 + G2 / (r1 * (r0 + r1))
    return {"A": A, "b0": b0, "b1": b1, "b2": b2}


def dpm_apply(sample, v, sigma_i, x0_prev, x0_prev2, *, A, b0, b1, b2):
    """Jit-friendly DPM++ update (any order); returns (x_next, x0)."""
    sample = sample.astype(jnp.float32)
    v = v.astype(jnp.float32)
    x0 = sample - sigma_i * v
    return A * sample + b0 * x0 + b1 * x0_prev + b2 * x0_prev2, x0


def _lam_unipc(sigma):
    a = jnp.maximum(1.0 - sigma, 1e-10)
    s = jnp.maximum(sigma, 1e-10)
    return jnp.log(a) - jnp.log(s)


def unipc_coeffs(sched: FlowMatchEulerSchedule, i: int, order: int,
                 prev_order: int):
    """Host-side per-step scalars for the UniPC-2 update (corrector then
    predictor, `fm_solvers_unipc.py:487-630,655-740`), linearized as

        x0        = sample - σ_i v
        corrected = Cs·sample + Cx·last_sample + Cm·x0_prev
                    + Cd1s·(x0_prev2 - x0_prev) + Cd1·(x0 - x0_prev)
        x_next    = Px·corrected + P0·x0 + Pd·(x0_prev - x0)

    First step / last step / warmup-order structure is folded into the
    VALUES so one compiled program serves every step (the long pipeline's
    single-dispatch multistep sweep).  Returns (coeff dict, this_order)."""
    z = jnp.float32(0.0)
    one = jnp.float32(1.0)
    this_order = min(order, sched.num_steps - i, 1 if i == 0 else 2)
    if i == 0:
        # no corrector on the first step (`:700` last_sample is None)
        cc = {"Cs": one, "Cx": z, "Cm": z, "Cd1s": z, "Cd1": z}
    else:
        s_t = sched.sigmas[i]
        s_s0 = sched.sigmas[i - 1]
        a_t = 1.0 - s_t
        lam_t, lam_s0 = _lam_unipc(s_t), _lam_unipc(s_s0)
        h = lam_t - lam_s0
        hh = -h  # predict_x0 convention
        h_phi_1 = jnp.expm1(hh)
        b_h = h_phi_1  # bh2
        if prev_order == 1:
            rho_last = jnp.float32(0.5)
            cd1s = z
        else:
            s_s1 = sched.sigmas[i - 2]
            r1 = (_lam_unipc(s_s1) - lam_s0) / h
            # solve [[1, 1], [r1, 1]] rho = [b1, b2] (reference loop `:575-586`)
            h_phi_k = h_phi_1 / hh - 1.0
            b1 = h_phi_k / b_h
            h_phi_k = h_phi_k / hh - 0.5
            b2 = h_phi_k * 2.0 / b_h
            rho1 = (b1 - b2) / (1.0 - r1)
            rho_last = b1 - rho1
            cd1s = -a_t * b_h * rho1 / r1
        cc = {
            "Cs": z,
            "Cx": s_t / s_s0,
            "Cm": -a_t * h_phi_1,
            "Cd1s": cd1s,
            "Cd1": -a_t * b_h * rho_last,
        }
    if i == sched.num_steps - 1:
        # sigma_next == 0: the order-1 update collapses to x0 exactly
        # (the corrector above still applied, its coefficient is 0 here)
        cc.update({"Px": z, "P0": one, "Pd": z})
    else:
        s_i = sched.sigmas[i]
        s_n = sched.sigmas[i + 1]
        a_n = 1.0 - s_n
        lam_i, lam_n = _lam_unipc(s_i), _lam_unipc(s_n)
        h = lam_n - lam_i
        hh = -h
        h_phi_1 = jnp.expm1(hh)
        b_h = h_phi_1  # bh2
        pd = z
        if this_order >= 2:
            s_p = sched.sigmas[i - 1]
            rk = (_lam_unipc(s_p) - lam_i) / h
            pd = -a_n * b_h * 0.5 / rk  # simplified rho_p = 1/2
        cc.update({"Px": s_n / s_i, "P0": -a_n * h_phi_1, "Pd": pd})
    return cc, this_order


def unipc_apply(sample, v, sigma_i, x0_prev, x0_prev2, last_sample, *,
                Cs, Cx, Cm, Cd1s, Cd1, Px, P0, Pd):
    """Jit-friendly UniPC update; returns (x_next, x0, corrected_sample).
    x0 comes from the INCOMING (uncorrected) sample — this is what enters
    the history ring (`fm_solvers_unipc.py:695-710`)."""
    sample = sample.astype(jnp.float32)
    v = v.astype(jnp.float32)
    x0 = sample - sigma_i * v
    corrected = (
        Cs * sample + Cx * last_sample + Cm * x0_prev
        + Cd1s * (x0_prev2 - x0_prev) + Cd1 * (x0 - x0_prev)
    )
    x_t = Px * corrected + P0 * x0 + Pd * (x0_prev - x0)
    return x_t, x0, corrected


class FlowDPMSolverMultistep:
    """DPM-Solver++ multistep (orders 1-3) on the flow-matching sigma
    ladder; order-3 step-parity vs the vendored reference scheduler is in
    tests/test_solver_parity.py."""

    def __init__(self, num_steps: int, shift: float = 5.0, order: int = 2,
                 sigmas=None):
        self.sched: FlowMatchEulerSchedule = _make_sched(num_steps, shift, sigmas)
        self.order = order

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
        co = dpm_coeffs(self.sched, i, self.order)
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
                 sigmas=None):
        self.sched = _make_sched(num_steps, shift, sigmas)
        self.order = order

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
            self.sched, i, self.order, state.prev_order
        )
        x_t, x0, corrected = unipc_apply(
            sample, v, self.sched.sigmas[i],
            state.x0_prev if state.x0_prev is not None else zeros,
            state.x0_prev2 if state.x0_prev2 is not None else zeros,
            state.last_sample if state.last_sample is not None else zeros,
            **co,
        )
        return x_t, MultistepState(
            x0_prev=x0,
            x0_prev2=state.x0_prev,
            last_sample=corrected,
            prev_order=this_order,
        )

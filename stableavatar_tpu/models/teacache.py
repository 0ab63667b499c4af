"""TeaCache — timestep-embedding-aware transformer-block skipping.

Re-implements the reference `TeaCache` (`wan/models/cache_utils.py:19-74`)
as a host-side controller around the jitted DiT: the skip decision is Python
control flow over a step counter and a scalar rel-L1 distance, so it lives
OUTSIDE jit (SURVEY.md §7 step 5); only two jitted paths exist — "compute +
capture residual" and "apply cached residual".

Semantics preserved as-built (SURVEY.md "Hard parts"):
- the counter increments once per *transformer call*, i.e. per window per
  step in the long pipeline (`wan_fantasy_transformer3d_1B.py:1039`);
- forced compute on cnt==0, cnt==num_steps-1 and the first
  `num_skip_start_steps` calls (`:1026-1028`);
- the polynomial rescale of the rel-L1 distance of the modulated timestep
  embedding (`:1031-1033`);
- reference coefficient tables (numeric constants from
  `cache_utils.py:5-16`; note the reference's always-true `or` bug resolves
  every name to the 1.3B table — we key the table properly).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

TEACACHE_COEFFICIENTS = {
    "wan2.1-t2v-1.3b": [-5.21862437e04, 9.23041404e03, -5.28275948e02, 1.36987616e01, -4.99875664e-02],
    "wan2.1-t2v-14b": [-3.03318725e05, 4.90537029e04, -2.65530556e03, 5.87365115e01, -3.15583525e-01],
    "wan2.1-i2v-14b-480p": [2.57151496e05, -3.54229917e04, 1.40286849e03, -1.35890334e01, 1.32517977e-01],
    "wan2.1-i2v-14b-720p": [8.10705460e03, 2.13393892e03, -3.72934672e02, 1.66203073e01, -4.17769401e-02],
}


def get_teacache_coefficients(model_name: str) -> Optional[list]:
    name = model_name.lower()
    for key, coef in TEACACHE_COEFFICIENTS.items():
        if key in name:
            return coef
    # 1.3B default mirrors the reference's effective behavior
    if "1.3b" in name or "1b" in name:
        return TEACACHE_COEFFICIENTS["wan2.1-t2v-1.3b"]
    return None


class TeaCache:
    """Host-side skip controller.

    Usage per transformer call (cond pass decides for the whole CFG batch):
        if cache.plan(e0):           # compute path
            out, resid = dit_forward(..., return_residual=True)
            cache.store(resid)
        else:                        # skip path
            out = dit_forward_skip(..., cache.residual)
    """

    def __init__(
        self,
        coefficients,
        num_steps: int,
        rel_l1_thresh: float = 0.1,
        num_skip_start_steps: int = 0,
    ):
        if num_steps < 1:
            raise ValueError("num_steps must be >= 1")
        if rel_l1_thresh < 0:
            raise ValueError("rel_l1_thresh must be >= 0")
        self.coefficients = list(coefficients)
        self.rescale = np.poly1d(self.coefficients)
        self.num_steps = num_steps
        self.rel_l1_thresh = rel_l1_thresh
        self.num_skip_start_steps = num_skip_start_steps
        self.reset()

    def reset(self):
        self.cnt = 0
        self.accumulated = 0.0
        self.prev_modulated: Optional[jnp.ndarray] = None
        self.residual: Optional[jnp.ndarray] = None
        self.skipped_calls = 0
        self.total_calls = 0

    def plan(self, modulated_input: jnp.ndarray, can_skip: bool = True) -> bool:
        """Decide compute (True) vs skip (False) for this call and advance the
        counter.  `modulated_input` is e0 (the projected time embedding).

        `can_skip=False` forces the compute path (and counts the call as
        computed) — the pipeline passes it when no compatible cached residual
        exists (first call, or a different window shape), so the skip
        accounting reflects calls that actually skipped."""
        self.total_calls += 1
        skip_window = self.cnt < self.num_skip_start_steps
        if self.cnt == 0 or self.cnt == self.num_steps - 1 or skip_window or not can_skip:
            should_calc = True
            self.accumulated = 0.0
        else:
            prev, cur = self.prev_modulated, modulated_input
            rel = float(jnp.mean(jnp.abs(cur - prev)) / jnp.mean(jnp.abs(prev)))
            self.accumulated += float(self.rescale(rel))
            if self.accumulated < self.rel_l1_thresh:
                should_calc = False
            else:
                should_calc = True
                self.accumulated = 0.0
        self.prev_modulated = modulated_input
        self.cnt += 1
        if self.cnt == self.num_steps:
            self.reset_counter_only()
        if not should_calc:
            self.skipped_calls += 1
        return should_calc

    def reset_counter_only(self):
        self.cnt = 0
        self.accumulated = 0.0

    def store(self, residual: jnp.ndarray):
        self.residual = residual

"""Dual-context fused cross-attention (ops/cross_attention.py) vs the
two-call reference path it replaces (models/dit.py:_cross_attention txt+img
branches, reference wan_fantasy_transformer3d_1B.py:504-605)."""

import numpy as np
import pytest

import jax.numpy as jnp

from stableavatar_tpu.ops.cross_attention import (
    _dual_reference,
    dual_context_attention,
)


def _mk(b=2, lq=256, l1=96, l2=33, n=2, d=64, seed=0, dtype=np.float32):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, lq, n, d)).astype(dtype))
    k1 = jnp.asarray(rng.standard_normal((b, l1, n, d)).astype(dtype))
    v1 = jnp.asarray(rng.standard_normal((b, l1, n, d)).astype(dtype))
    k2 = jnp.asarray(rng.standard_normal((b, l2, n, d)).astype(dtype))
    v2 = jnp.asarray(rng.standard_normal((b, l2, n, d)).astype(dtype))
    return q, k1, v1, k2, v2


def test_dual_kernel_interpret_matches_two_calls():
    """Interpreter-mode kernel == two separate softmax attentions summed,
    with BOTH segments needing padding (96 -> 128, 33 -> 128)."""
    q, k1, v1, k2, v2 = _mk()
    got = dual_context_attention(q, k1, v1, k2, v2, block_q=128,
                                 interpret=True)
    want = _dual_reference(q, k1, v1, k2, v2, scale=q.shape[-1] ** -0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_dual_kernel_ragged_q_padding():
    """Lq not a block multiple: q rows beyond Lq are padding and dropped."""
    q, k1, v1, k2, v2 = _mk(lq=200)
    got = dual_context_attention(q, k1, v1, k2, v2, block_q=128,
                                 interpret=True)
    want = _dual_reference(q, k1, v1, k2, v2, scale=q.shape[-1] ** -0.5)
    assert got.shape == want.shape == q.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_dual_kernel_lane_aligned_segments():
    """Segment lengths already lane multiples (512/256 — the real text/img
    budgets rounded): no padding columns at all."""
    q, k1, v1, k2, v2 = _mk(lq=256, l1=128, l2=128, seed=3)
    got = dual_context_attention(q, k1, v1, k2, v2, block_q=128,
                                 interpret=True)
    want = _dual_reference(q, k1, v1, k2, v2, scale=q.shape[-1] ** -0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_auto_backend_falls_back_off_tpu():
    """backend='auto' on CPU routes to the two-call XLA path (exact)."""
    q, k1, v1, k2, v2 = _mk(seed=5)
    got = dual_context_attention(q, k1, v1, k2, v2)
    want = _dual_reference(q, k1, v1, k2, v2, scale=q.shape[-1] ** -0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_dual_kernel_bf16():
    """bf16 operands (the production dtype) stay within bf16 tolerance."""
    q, k1, v1, k2, v2 = _mk(seed=7)
    cast = lambda x: x.astype(jnp.bfloat16)  # noqa: E731
    got = dual_context_attention(cast(q), cast(k1), cast(v1), cast(k2),
                                 cast(v2), block_q=128, interpret=True)
    want = _dual_reference(q, k1, v1, k2, v2, scale=q.shape[-1] ** -0.5)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32), np.asarray(want),
                               rtol=0.05, atol=0.05)

"""CAME optimizer (Confidence-guided Adaptive Memory Efficient optimization,
Luo et al. 2023, arXiv:2307.02047) as an optax transform.

The reference trainers expose `--use_came` and construct came_pytorch.CAME
with betas=(0.9, 0.999, 0.9999), eps=(1e-30, 1e-16)
(`train_1B_square.py:919-950`).  Semantics follow the published algorithm /
came_pytorch:

1. factored (Adafactor-style row/col) second moment of g^2 normalizes the
   gradient: u = g / sqrt(v̂);
2. u is RMS-clipped, then first-moment EMA m = EMA_b1(u);
3. the *instability* (u - m)^2 gets its own factored EMA (confidence s);
   the final update is m / sqrt(ŝ) — large disagreement between the
   instantaneous and averaged update directions shrinks the step.

Params with ndim < 2 use an unfactored second moment and skip the
confidence step (as in came_pytorch)."""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax


class _Leaf(NamedTuple):
    exp_avg: jnp.ndarray
    row: jnp.ndarray  # factored second moment (or full v when unfactored)
    col: jnp.ndarray  # zeros placeholder when unfactored
    res_row: jnp.ndarray
    res_col: jnp.ndarray


class CAMEState(NamedTuple):
    count: jnp.ndarray
    leaves: any


def _factored(shape) -> bool:
    return len(shape) >= 2


def _approx_sq_grad(row, col):
    """came_pytorch `_approx_sq_grad`: rank-1 reconstruction of 1/sqrt(v)."""
    r = row / jnp.mean(row, axis=-1, keepdims=True)
    r_factor = jax.lax.rsqrt(r)[..., None]
    c_factor = jax.lax.rsqrt(col)[..., None, :]
    return r_factor * c_factor


def came(
    learning_rate,
    betas: Tuple[float, float, float] = (0.9, 0.999, 0.9999),
    eps: Tuple[float, float] = (1e-30, 1e-16),
    weight_decay: float = 0.0,
    clip_threshold: float = 1.0,
) -> optax.GradientTransformation:
    b1, b2, b3 = betas
    eps1, eps2 = eps

    def init_fn(params):
        def leaf(p):
            if _factored(p.shape):
                return _Leaf(
                    exp_avg=jnp.zeros_like(p, jnp.float32),
                    row=jnp.zeros(p.shape[:-1], jnp.float32),
                    col=jnp.zeros(p.shape[:-2] + p.shape[-1:], jnp.float32),
                    res_row=jnp.zeros(p.shape[:-1], jnp.float32),
                    res_col=jnp.zeros(p.shape[:-2] + p.shape[-1:], jnp.float32),
                )
            return _Leaf(
                exp_avg=jnp.zeros_like(p, jnp.float32),
                row=jnp.zeros_like(p, jnp.float32),
                col=jnp.zeros((), jnp.float32),
                res_row=jnp.zeros((), jnp.float32),
                res_col=jnp.zeros((), jnp.float32),
            )

        return CAMEState(
            count=jnp.zeros((), jnp.int32),
            leaves=jax.tree.map(leaf, params),
        )

    def update_fn(grads, state, params=None):
        lr = learning_rate(state.count) if callable(learning_rate) else learning_rate
        if params is None:
            if weight_decay:
                raise ValueError("came with weight_decay needs params")
            params = grads  # dtype source only

        def leaf(g, s: _Leaf, p):
            g = g.astype(jnp.float32)
            sq = g * g + eps1
            if _factored(g.shape):
                row = b2 * s.row + (1 - b2) * jnp.mean(sq, axis=-1)
                col = b2 * s.col + (1 - b2) * jnp.mean(sq, axis=-2)
                u = g * _approx_sq_grad(row, col)
            else:
                row = b2 * s.row + (1 - b2) * sq
                col = s.col
                u = g * jax.lax.rsqrt(row)
            rms = jnp.sqrt(jnp.mean(u * u))
            u = u / jnp.maximum(1.0, rms / clip_threshold)
            m = b1 * s.exp_avg + (1 - b1) * u
            if _factored(g.shape):
                res = (u - m) ** 2 + eps2
                res_row = b3 * s.res_row + (1 - b3) * jnp.mean(res, axis=-1)
                res_col = b3 * s.res_col + (1 - b3) * jnp.mean(res, axis=-2)
                upd = m * _approx_sq_grad(res_row, res_col)
            else:
                res_row, res_col = s.res_row, s.res_col
                upd = m
            if weight_decay and params is not None:
                upd = upd + weight_decay * p.astype(jnp.float32)
            delta = (-lr * upd).astype(p.dtype if p is not None else jnp.float32)
            return delta, _Leaf(m, row, col, res_row, res_col)

        g_flat, treedef = jax.tree.flatten(grads)
        s_flat = treedef.flatten_up_to(state.leaves)
        p_flat = treedef.flatten_up_to(params)
        out = [leaf(g, s, p) for g, s, p in zip(g_flat, s_flat, p_flat)]
        deltas = treedef.unflatten([o[0] for o in out])
        leaves = treedef.unflatten([o[1] for o in out])
        return deltas, CAMEState(count=state.count + 1, leaves=leaves)

    return optax.GradientTransformation(init_fn, update_fn)

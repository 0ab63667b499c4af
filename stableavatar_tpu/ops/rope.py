"""3D rotary position embedding for the Wan DiT, TPU-native formulation.

The reference (`wan_fantasy_transformer3d_1B.py:224-323`) builds complex-valued
frequency tables split over the head dim as ``d-4(d//6), 2(d//6), 2(d//6)``
(frames / height / width) and applies them with complex multiplies in a Python
loop over batch samples.  Complex arithmetic and per-sample loops are hostile
to the TPU vector unit and XLA, so we:

- precompute cos/sin tables in fp32 once per (F, H, W) grid (static shapes
  under jit — each grid size compiles once),
- apply the rotation as two fused elementwise multiplies over the whole batch.

For an interleaved pair (x0, x1) and angle t the complex multiply
``(x0 + i x1) * (cos t + i sin t)`` is
``(x0 cos - x1 sin, x0 sin + x1 cos)`` — exactly what we compute.

RIFLEx frequency reduction for length extrapolation
(`wan_fantasy_transformer3d_1B.py:235-292`) is supported via
`rope_freqs_3d(..., riflex_k=, riflex_L_test=, riflex_scale=)`.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class RopeFreqs:
    """Per-grid cos/sin tables, shape [F*H*W, head_dim//2] each, fp32."""

    cos: jnp.ndarray
    sin: jnp.ndarray


def _axis_freqs(
    dim_half: int,
    theta: float = 10000.0,
    riflex_k: Optional[int] = None,
    riflex_L_test: Optional[int] = None,
    riflex_scale: Optional[float] = None,
) -> np.ndarray:
    """Inverse frequencies for one axis; `dim_half` frequencies.

    Matches `rope_params` (`wan_fantasy_transformer3d_1B.py:224-231`) which uses
    ``1/theta**(arange(0, dim, 2)/dim)`` in float64.  RIFLEx modifies the k-th
    intrinsic frequency (`get_1d_rotary_pos_embed_riflex`, `:236-292`).
    """
    freqs = 1.0 / np.power(
        theta, np.arange(0, 2 * dim_half, 2, dtype=np.float64) / (2 * dim_half)
    )
    if riflex_k is not None:
        freqs[riflex_k - 1] = 0.9 * 2 * np.pi / riflex_L_test
        if riflex_scale is not None:
            freqs[riflex_k - 1] = freqs[riflex_k - 1] / riflex_scale
    return freqs


def rope_freqs_3d(
    grid: Tuple[int, int, int],
    head_dim: int,
    theta: float = 10000.0,
    riflex_k: Optional[int] = None,
    riflex_L_test: Optional[int] = None,
    riflex_scale: Optional[float] = None,
) -> RopeFreqs:
    """Build the flattened [F*H*W, head_dim//2] cos/sin tables for a 3D grid.

    The head dim is split as (d - 4*(d//6), 2*(d//6), 2*(d//6)) halves over
    (frames, height, width), matching the concatenation in the reference model
    constructor (`wan_fantasy_transformer3d_1B.py:855-862`) and the expand in
    `rope_apply` (`:295-323`).
    """
    f, h, w = grid
    d = head_dim
    c = d // 2
    c_h = c // 3
    c_w = c // 3
    c_f = c - 2 * (c // 3)

    def table(n, dim_half, **kw):
        fr = _axis_freqs(dim_half, theta, **kw)
        ang = np.outer(np.arange(n, dtype=np.float64), fr)  # [n, dim_half]
        return ang

    ang_f = table(
        f, c_f, riflex_k=riflex_k, riflex_L_test=riflex_L_test, riflex_scale=riflex_scale
    )
    ang_h = table(h, c_h)
    ang_w = table(w, c_w)

    # broadcast to the full [f, h, w, c] angle grid then flatten
    ang = np.concatenate(
        [
            np.broadcast_to(ang_f[:, None, None, :], (f, h, w, c_f)),
            np.broadcast_to(ang_h[None, :, None, :], (f, h, w, c_h)),
            np.broadcast_to(ang_w[None, None, :, :], (f, h, w, c_w)),
        ],
        axis=-1,
    ).reshape(f * h * w, c)

    return RopeFreqs(
        cos=jnp.asarray(np.cos(ang), dtype=jnp.float32),
        sin=jnp.asarray(np.sin(ang), dtype=jnp.float32),
    )


@partial(jax.jit, static_argnames=())
def rope_apply(x: jnp.ndarray, freqs: RopeFreqs) -> jnp.ndarray:
    """Rotate q/k by the precomputed 3D RoPE tables.

    Args:
      x: [B, L, N, D] with L == freqs tables' length (padding tokens, if any,
         must be sliced off by the caller or carry identity rotation rows).
      freqs: RopeFreqs with cos/sin of shape [L, D//2].

    Returns fp32 output like the reference (`rope_apply` returns .float(),
    `wan_fantasy_transformer3d_1B.py:323`); callers cast back to bf16.
    """
    b, l, n, d = x.shape
    xf = x.astype(jnp.float32).reshape(b, l, n, d // 2, 2)
    x0, x1 = xf[..., 0], xf[..., 1]
    cos = freqs.cos[None, :, None, :]
    sin = freqs.sin[None, :, None, :]
    y0 = x0 * cos - x1 * sin
    y1 = x0 * sin + x1 * cos
    return jnp.stack([y0, y1], axis=-1).reshape(b, l, n, d)


jax.tree_util.register_pytree_node(
    RopeFreqs,
    lambda rf: ((rf.cos, rf.sin), None),
    lambda _, ch: RopeFreqs(*ch),
)


# ---------------------------------------------------------------------------
# split-pair ("half") layout — the TPU kernel-fusion form
# ---------------------------------------------------------------------------
#
# The reference stores rotation pairs interleaved over the head dim:
# (0,1), (2,3), ... (`rope_apply` reshape to [..., d//2, 2],
# `wan_fantasy_transformer3d_1B.py:295-323`).  Interleaved pair-swaps are lane
# shuffles on the TPU VPU; rotating in a "split" layout where pair j lives at
# channels (j, j + d/2) needs only two contiguous half-register slices.  Since
# attention logits are invariant under any joint permutation of the q/k head
# dim, we pre-permute the q/k projection weights once
# (`split_pair_permutation`) and fuse the rotation into the flash kernel
# (`ops/flash_attention.py`) with a packed [L, d] cos||sin table.


def split_pair_permutation(head_dim: int, num_heads: int) -> np.ndarray:
    """Channel permutation moving interleaved rope pairs to split layout.

    Returns `perm` with `new[c] = old[perm[c]]` over `num_heads * head_dim`
    channels: within each head, channel j < d/2 takes old channel 2j (pair
    reals) and channel j >= d/2 takes old channel 2(j - d/2) + 1.
    """
    d = head_dim
    half = d // 2
    per_head = np.concatenate([np.arange(half) * 2, np.arange(half) * 2 + 1])
    return np.concatenate([h * d + per_head for h in range(num_heads)])


def pack_split(freqs: RopeFreqs) -> jnp.ndarray:
    """Pack cos/sin tables as one [L, head_dim] fp32 array: [cos || sin].

    Column j < d/2 is cos(angle_j) and column d/2 + j is sin(angle_j) for
    rope pair j — the layout consumed by the fused flash kernel.
    """
    return jnp.concatenate([freqs.cos, freqs.sin], axis=1)


def rope_apply_split(x: jnp.ndarray, packed: jnp.ndarray) -> jnp.ndarray:
    """Apply rope to x [B, L, N, D] already in split-pair channel layout.

    `packed` is `pack_split(freqs)` ([L, D] = cos||sin).  Reference math per
    pair: (x0 + i x1)(cos + i sin).  Returns fp32 (as `rope_apply`).
    """
    b, l, n, d = x.shape
    half = d // 2
    xf = x.astype(jnp.float32)
    x0, x1 = xf[..., :half], xf[..., half:]
    c = packed[None, :, None, :half]
    s = packed[None, :, None, half:]
    return jnp.concatenate([x0 * c - x1 * s, x0 * s + x1 * c], axis=-1)

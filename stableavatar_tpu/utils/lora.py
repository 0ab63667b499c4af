"""LoRA as pytree adapters: create / apply / merge / unmerge.

Replaces the reference's forward-hook LoRA (`wan/utils/lora_utils.py`):
instead of monkey-patching module forwards, adapters are a parallel pytree of
(down, up) factors over the DiT's linear weights; `merge_lora` folds them
into the weights for deployment (`lora_utils.py:336-470`), `unmerge_lora`
subtracts them back.

Matches the reference policy: kaiming-uniform down / zero up init
(`lora_utils.py:60-64`), skip vocal/audio modules (`:193-194`), scale
alpha/rank.
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp


def _is_lora_target(path, leaf, include_vocal: bool) -> bool:
    names = "/".join(str(getattr(k, "key", k)) for k in path)
    if not names.endswith("w"):
        return False
    # 2D plain linear, or 3D [num_layers, d_in, d_out] stacked-scan weights
    if getattr(leaf, "ndim", 0) not in (2, 3):
        return False
    if "blocks" not in names:
        return False
    if not include_vocal and ("vocal" in names or "audio" in names):
        return False
    return True


def create_lora(
    key: jax.Array,
    params,
    rank: int = 128,
    alpha: float = 64.0,
    include_vocal: bool = False,
):
    """Returns a lora pytree with {down, up} at every target leaf (None
    elsewhere), plus static (rank, alpha) carried by the caller."""
    leaves = []

    def build(path, leaf):
        if not _is_lora_target(path, leaf, include_vocal):
            return None
        leaves.append(path)
        return leaf

    targets = jax.tree_util.tree_map_with_path(build, params)
    keys = iter(jax.random.split(key, max(len(leaves), 1)))

    def make(path, leaf):
        if not _is_lora_target(path, leaf, include_vocal):
            return None
        k = next(keys)
        if leaf.ndim == 3:  # stacked per-layer weights [L, d_in, d_out]
            nl, d_in, d_out = leaf.shape
            lim = math.sqrt(3.0) * math.sqrt(2.0) / math.sqrt(d_in)
            down = jax.random.uniform(k, (nl, d_in, rank), jnp.float32, -lim, lim)
            up = jnp.zeros((nl, rank, d_out), jnp.float32)
        else:
            d_in, d_out = leaf.shape
            lim = math.sqrt(3.0) * math.sqrt(2.0) / math.sqrt(d_in)  # kaiming a=sqrt(5)
            down = jax.random.uniform(k, (d_in, rank), jnp.float32, -lim, lim)
            up = jnp.zeros((rank, d_out), jnp.float32)
        return {"down": down, "up": up}

    return jax.tree_util.tree_map_with_path(make, params)


def lora_delta(lora_leaf, rank: int, alpha: float, multiplier: float = 1.0):
    scale = multiplier * alpha / rank
    # @ batches over the leading layer axis for stacked [L, ., .] factors
    return (lora_leaf["down"] @ lora_leaf["up"]) * scale


def merge_lora(params, lora, rank: int, alpha: float, multiplier: float = 1.0):
    """Fold LoRA into the weights (deployment path, `lora_utils.py:336-412`)."""

    flat = {
        "/".join(str(getattr(k, "key", k)) for k in kp): leaf
        for kp, leaf in jax.tree_util.tree_leaves_with_path(
            lora, is_leaf=lambda x: isinstance(x, dict) and "down" in x
        )
    }

    def merge(kp, p):
        name = "/".join(str(getattr(k, "key", k)) for k in kp)
        l = flat.get(name)
        if l is None:
            return p
        return (p.astype(jnp.float32) + lora_delta(l, rank, alpha, multiplier)).astype(p.dtype)

    return jax.tree_util.tree_map_with_path(merge, params)


def unmerge_lora(params, lora, rank: int, alpha: float, multiplier: float = 1.0):
    return merge_lora(params, lora, rank, alpha, -multiplier)


def lora_trainable_mask(params, lora):
    """Masks for optax: freeze base params, train every lora factor."""
    return jax.tree.map(lambda _: False, params), jax.tree.map(lambda _: True, lora)


def save_lora(path: str, lora, rank: int, alpha: float):
    import numpy as np

    flat = {}
    for kp, leaf in jax.tree_util.tree_leaves_with_path(
        lora, is_leaf=lambda x: isinstance(x, dict) and "down" in x
    ):
        if leaf is None:
            continue
        name = "/".join(str(getattr(k, "key", k)) for k in kp)
        flat[f"{name}/down"] = np.asarray(leaf["down"])
        flat[f"{name}/up"] = np.asarray(leaf["up"])
    flat["__rank__"] = np.asarray(rank)
    flat["__alpha__"] = np.asarray(alpha)
    import numpy as _np

    _np.savez(path, **flat)


def load_lora(path: str, params, include_vocal: bool = False):
    import numpy as np

    data = np.load(path)
    rank = int(data["__rank__"])
    alpha = float(data["__alpha__"])

    def rebuild(kp, leaf):
        if not _is_lora_target(kp, leaf, include_vocal):
            return None
        name = "/".join(str(getattr(k, "key", k)) for k in kp)
        if f"{name}/down" not in data:
            return None
        return {
            "down": jnp.asarray(data[f"{name}/down"]),
            "up": jnp.asarray(data[f"{name}/up"]),
        }

    lora = jax.tree_util.tree_map_with_path(rebuild, params)
    return lora, rank, alpha

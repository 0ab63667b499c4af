"""Parameter sharding rules (GSPMD fully-sharded params over 'fsdp').

Replaces DeepSpeed ZeRO-2/3 (`deepspeed_config/zero_stage*.json`) and torch
FSDP (`wan/distributed/fsdp.py:11-33`): each large parameter is sharded on
its largest divisible axis across the 'fsdp' mesh axis; XLA all-gathers
shards just-in-time per layer and shards the optimizer state for free.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# params smaller than this stay replicated (norm scales, biases, modulations)
_MIN_SHARD_SIZE = 2**16


def param_sharding_spec(x, fsdp_size: int) -> P:
    """Pick the largest axis divisible by fsdp_size; replicate if none."""
    if x.ndim == 0 or x.size < _MIN_SHARD_SIZE or fsdp_size <= 1:
        return P()
    order = sorted(range(x.ndim), key=lambda i: -x.shape[i])
    for ax in order:
        if x.shape[ax] % fsdp_size == 0:
            spec = [None] * x.ndim
            spec[ax] = "fsdp"
            return P(*spec)
    return P()


def shard_params(params, mesh: Mesh):
    """Device-put every leaf with its fsdp sharding."""
    fsdp = mesh.shape["fsdp"]

    def place(x):
        spec = param_sharding_spec(x, fsdp)
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(place, params)


def params_shardings(params, mesh: Mesh):
    """The NamedSharding pytree matching `shard_params` (for jit in/out specs)."""
    fsdp = mesh.shape["fsdp"]
    return jax.tree.map(
        lambda x: NamedSharding(mesh, param_sharding_spec(x, fsdp)), params
    )


def replicate(tree, mesh: Optional[Mesh]):
    if mesh is None:
        return tree
    return jax.tree.map(
        lambda x: jax.device_put(jnp.asarray(x), NamedSharding(mesh, P())), tree
    )

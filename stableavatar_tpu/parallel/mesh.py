"""Device mesh + sharding-constraint plumbing.

One `Mesh(('dp', 'fsdp', 'sp'))` replaces the reference's entire distributed
zoo (SURVEY.md §2.2): Accelerate DDP -> 'dp'; DeepSpeed ZeRO / torch FSDP ->
'fsdp' (GSPMD-sharded params, optimizer state sharded for free); xfuser
Ulysses+ring sequence parallelism and the chunk/all-gather token sharding
(`wan/dist/wan_xfuser.py:72-115`, `wan_fantasy_transformer3d_1B.py:1017-1019,
1150-1151`) -> 'sp' sharding constraints whose all-to-alls XLA compiles onto
ICI.  No NCCL analog exists: collectives are compiled into the program.
"""

from __future__ import annotations

import contextlib
import contextvars
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_MESH: contextvars.ContextVar[Optional[Mesh]] = contextvars.ContextVar(
    "stableavatar_mesh", default=None
)


def make_mesh(dp: int = 1, fsdp: int = 1, sp: int = 1, devices=None) -> Mesh:
    """Build the ('dp', 'fsdp', 'sp') mesh.  dp rides DCN (inter-slice) when
    present; fsdp and sp should map to ICI — callers order `devices`
    accordingly (jax.devices() default order does the right thing within a
    slice)."""
    if devices is None:
        devices = jax.devices()
    n = dp * fsdp * sp
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    arr = np.asarray(devices[:n]).reshape(dp, fsdp, sp)
    return Mesh(arr, ("dp", "fsdp", "sp"))


def current_mesh() -> Optional[Mesh]:
    return _MESH.get()


@contextlib.contextmanager
def mesh_context(mesh: Optional[Mesh]):
    """Activate a mesh: model code inside applies its sharding constraints."""
    token = _MESH.set(mesh)
    try:
        if mesh is not None:
            with mesh:
                yield mesh
        else:
            yield None
    finally:
        _MESH.reset(token)


def maybe_constrain(x, *spec):
    """`with_sharding_constraint` when a mesh is active, identity otherwise.
    Axis names not present in the active mesh are dropped to None."""
    mesh = _MESH.get()
    if mesh is None:
        return x
    cleaned = tuple(
        s if (s is None or all(a in mesh.axis_names for a in _as_tuple(s))) else None
        for s in spec
    )
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*cleaned)))


def _as_tuple(s) -> Sequence[str]:
    return s if isinstance(s, tuple) else (s,)

"""Multi-host bootstrap plumbing (parallel/distributed.py) on the virtual
8-device CPU mesh (single process — multi-process placement logic is
exercised via the device-ordering contract)."""

import numpy as np

import jax
import jax.numpy as jnp

from stableavatar_tpu.parallel.distributed import (
    initialize_distributed,
    local_batch_slice,
    make_multihost_mesh,
)


def test_initialize_noop_without_coordinator(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("JAX_AUTO_DISTRIBUTED", raising=False)
    assert initialize_distributed() is False


def test_multihost_mesh_axes_and_placement():
    mesh = make_multihost_mesh(dp=2, fsdp=2, sp=2)
    assert mesh.axis_names == ("dp", "fsdp", "sp")
    assert mesh.devices.shape == (2, 2, 2)
    # consecutive fsdp/sp coordinates are consecutive device ids (intra-host
    # ICI contract); the dp axis strides by fsdp*sp
    ids = np.vectorize(lambda d: d.id)(mesh.devices)
    assert ids[0, 0, 0] + 1 == ids[0, 0, 1]
    assert ids[0, 0, 0] + 2 == ids[0, 1, 0]
    assert ids[1, 0, 0] - ids[0, 0, 0] == 4

    # dp=None fills all devices
    mesh_all = make_multihost_mesh(fsdp=2, sp=2)
    assert mesh_all.devices.shape == (len(jax.devices()) // 4, 2, 2)


def test_multihost_mesh_runs_sharded_computation():
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_multihost_mesh(dp=2, fsdp=2, sp=2)
    x = jnp.arange(2 * 4 * 8, dtype=jnp.float32).reshape(2, 4, 8)
    xs = jax.device_put(x, NamedSharding(mesh, P("dp", "fsdp", "sp")))
    y = jax.jit(lambda a: (a * 2).sum())(xs)
    assert float(y) == float((x * 2).sum())


def test_local_batch_slice_single_process():
    s = local_batch_slice(8)
    assert (s.start, s.stop) == (0, 8)

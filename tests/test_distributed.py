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


def test_true_multiprocess_train_step():
    """VERDICT r3 item 8: 2 ACTUAL OS processes x 4 virtual CPU devices,
    `jax.distributed.initialize` rendezvous, dp-over-processes mesh, per-host
    dp batch slicing, one sharded end-to-end train step.  Both processes
    must agree on the (replicated) loss, and it must equal the same step
    computed single-process on the same global batch."""
    import json
    import os
    import socket
    import subprocess
    import sys

    # free port for the coordinator
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "distributed_worker.py")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("JAX_COORDINATOR_ADDRESS", None)

    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env, cwd=repo,
        )
        for i in range(2)
    ]
    results = {}
    for i, p in enumerate(procs):
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            out, err = p.communicate()
            raise AssertionError(f"worker {i} hung\n{out[-2000:]}\n{err[-2000:]}")
        assert p.returncode == 0, f"worker {i} rc={p.returncode}\n{err[-3000:]}"
        line = [l for l in out.splitlines() if l.startswith("WORKER_RESULT ")]
        assert line, f"worker {i} printed no result\n{out[-2000:]}"
        results[i] = json.loads(line[-1].removeprefix("WORKER_RESULT "))

    for i, r in results.items():
        assert r["process_count"] == 2, r
        assert r["local_devices"] == 4 and r["global_devices"] == 8, r
        assert r["dp_axis_spans_processes"], r
        assert r["head_moved"], r
        assert np.isfinite(r["loss"]) and np.isfinite(r["grad_norm"]), r
    # per-host dp slices partition the batch
    assert results[0]["local_slice"] == [0, 2]
    assert results[1]["local_slice"] == [2, 4]
    # replicated loss agrees across processes
    np.testing.assert_allclose(results[0]["loss"], results[1]["loss"], rtol=1e-6)

    # cross-check vs the SAME step single-process (8 in-process devices)
    import jax.numpy as jnp

    from stableavatar_tpu.models.dit import init_dit
    from stableavatar_tpu.train.trainer import (
        TrainConfig, make_optimizer, make_train_step, train_sigmas,
    )
    from tests.test_train import TINY, _batch

    params = init_dit(jax.random.PRNGKey(0), TINY)
    tc = TrainConfig(remat=False, video_sample_n_frames=9, learning_rate=1e-3)
    tx = make_optimizer(tc)
    opt_state = tx.init(params)
    step = make_train_step(TINY, tc, tx, train_sigmas())
    _, _, metrics = step(
        params, opt_state, _batch(b=4), jax.random.PRNGKey(1), jnp.asarray(0)
    )
    np.testing.assert_allclose(
        results[0]["loss"], float(metrics["loss"]), rtol=5e-4
    )

"""Worker process for tests/test_distributed.py::test_true_multiprocess_*.

Each of 2 OS processes owns 4 virtual CPU devices (XLA_FLAGS set by the
spawning test), joins the cluster via `initialize_distributed`, builds the
multi-host ('dp' over processes) mesh, feeds ONLY its local_batch_slice of
the global batch, and runs one sharded train step — the reference's
multi-machine Accelerate rendezvous analog
(`accelerate_config_machine_1B_multiple.yaml:8-9`).

Prints one JSON line with the loss and topology facts for the parent to
assert on.  Not collected by pytest (no test_ prefix).
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_platforms", "cpu")  # before any backend touch

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    pid = int(sys.argv[1])
    port = sys.argv[2]

    from stableavatar_tpu.parallel.distributed import (
        initialize_distributed,
        local_batch_slice,
        make_multihost_mesh,
    )

    assert initialize_distributed(f"localhost:{port}", 2, pid)
    facts = {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }

    from jax.sharding import NamedSharding, PartitionSpec as P

    from stableavatar_tpu.models.dit import init_dit
    from stableavatar_tpu.train.trainer import (
        TrainConfig, make_optimizer, make_train_step, train_sigmas,
    )
    from tests.test_train import TINY, _batch

    mesh = make_multihost_mesh(dp=2, fsdp=2, sp=2)
    facts["mesh_shape"] = list(mesh.devices.shape)
    # dp axis strides across processes: dp row 0 on process 0, row 1 on 1
    facts["dp_axis_spans_processes"] = (
        mesh.devices[0, 0, 0].process_index != mesh.devices[1, 0, 0].process_index
    )

    def to_global(host_arr, spec):
        """Assemble a global array from replicated host data: each process
        contributes the shards it can address."""
        sharding = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(
            host_arr.shape, sharding, lambda idx: np.asarray(host_arr[idx])
        )

    # every process computes the same global batch (seeded), then feeds only
    # its dp slice — exactly how a real loader shards per host
    gb = 4
    host_batch = _batch(b=gb)
    sl = local_batch_slice(gb)
    facts["local_slice"] = [sl.start, sl.stop]
    assert sl.stop - sl.start == gb // 2

    with mesh:
        batch = {
            k: to_global(np.asarray(v), P("dp"))
            for k, v in host_batch.items()
        }
        params = init_dit(jax.random.PRNGKey(0), TINY)
        params = jax.tree.map(lambda x: to_global(np.asarray(x), P()), params)

        tc = TrainConfig(remat=False, video_sample_n_frames=9,
                         learning_rate=1e-3)
        tx = make_optimizer(tc)
        opt_state = jax.jit(tx.init)(params)
        step = make_train_step(TINY, tc, tx, train_sigmas())
        new_params, opt_state, metrics = step(
            params, opt_state, batch, jax.random.PRNGKey(1), jnp.asarray(0)
        )
        facts["loss"] = float(metrics["loss"])
        facts["grad_norm"] = float(metrics["grad_norm"])
        # params updated (head is zero-init; the step must move it)
        w = new_params["head"]["head"]["w"]
        facts["head_moved"] = bool(
            float(jnp.max(jnp.abs(w))) > 0.0
        )

    print("WORKER_RESULT " + json.dumps(facts))
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Multi-host bootstrap: `jax.distributed.initialize` + process-aware mesh.

The reference trains at 8 machines x 8 GPUs via Accelerate's static
rendezvous (`accelerate_config/accelerate_config_machine_1B_multiple.yaml:
8-9`, MAIN_PROCESS_IP/PORT env).  The TPU-native equivalent is one
`jax.distributed.initialize()` call per process, after which `jax.devices()`
sees the whole pod and GSPMD compiles cross-host collectives onto ICI/DCN.

Usage per process (CLI flags or env):

    python -m stableavatar_tpu.cli.train \
        --coordinator_address 10.0.0.1:1234 --num_processes 8 --process_id $I

or rely on auto-detection: on Cloud TPU pods `initialize()` with no
arguments reads the TPU metadata; on GPU/CPU clusters set
JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID.

Mesh placement: 'dp' spans processes (data parallel rides DCN between
hosts), 'fsdp' and 'sp' stay within each host's local devices (ICI) —
the layout GSPMD needs so parameter all-gathers and sequence all-to-alls
never cross the slower network (`parallel/mesh.py` docstring contract).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def apply_platform_override() -> None:
    """Honor JAX_PLATFORMS for direct CLI runs.

    This image's sitecustomize imports jax and pins the remote-TPU (axon)
    platform BEFORE user env vars are read, so `JAX_PLATFORMS=cpu python -m
    stableavatar_tpu.cli.inference ...` would silently still target the
    tunnel (and hang during an outage).  Re-applying the env var through
    jax.config as the first backend-relevant call restores the documented
    behavior.  Must run before any jax API touches the backend.
    """
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        try:
            jax.config.update("jax_platforms", plat)
        except Exception:  # already-initialized backend: leave it be
            pass


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Call `jax.distributed.initialize` when multi-process info is present.

    Returns True if distributed runtime was initialized.  Safe to call in
    single-process runs (no-op).  Flag values override env
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID); on Cloud
    TPU pods all three may be None (auto-detected from metadata) — set
    JAX_AUTO_DISTRIBUTED=1 to opt in there.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])

    auto_tpu = os.environ.get("JAX_AUTO_DISTRIBUTED") == "1"
    if coordinator_address is None and not auto_tpu:
        return False

    if coordinator_address is None:
        jax.distributed.initialize()
    else:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return True


def make_multihost_mesh(
    dp: Optional[int] = None, fsdp: int = 1, sp: int = 1
) -> Mesh:
    """('dp', 'fsdp', 'sp') mesh with 'dp' major over processes.

    Devices are ordered (process_index, within-process), so consecutive
    fsdp/sp groups are always intra-host (ICI) and the dp axis strides
    across hosts (DCN).  `dp=None` uses every device
    (dp = total // (fsdp * sp)).  Requires fsdp*sp to divide each host's
    local device count (or to span whole hosts evenly).
    """
    devices = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    total = len(devices)
    if dp is None:
        assert total % (fsdp * sp) == 0, (total, fsdp, sp)
        dp = total // (fsdp * sp)
    n = dp * fsdp * sp
    assert n <= total, f"need {n} devices, have {total}"
    if jax.process_count() > 1 and n != total:
        # a partial mesh in a multi-process run can land entirely on a
        # subset of hosts: the excluded processes would own no addressable
        # shard of any mesh-placed array and every collective would
        # deadlock waiting on them — require the whole pod
        raise ValueError(
            f"multi-process mesh must span all {total} devices "
            f"(got dp*fsdp*sp = {n}); size the axes to the pod"
        )
    arr = np.asarray(devices[:n]).reshape(dp, fsdp, sp)
    return Mesh(arr, ("dp", "fsdp", "sp"))


def local_batch_slice(global_batch: int) -> slice:
    """This process's row range of a ['dp'-sharded] global batch: feed each
    host only its slice (jax.make_array_from_process_local_data handles the
    assembly)."""
    pc = jax.process_count()
    per = global_batch // pc
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)

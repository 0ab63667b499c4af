"""Test config: force an 8-device virtual CPU platform before JAX initializes.

Multi-chip sharding tests run on this virtual mesh
(`XLA_FLAGS=--xla_force_host_platform_device_count=8`), mirroring the
driver's `dryrun_multichip` validation path.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# The session sitecustomize imports jax and pins JAX_PLATFORMS to the remote
# TPU tunnel BEFORE conftest runs, so env vars alone don't stick — config
# updates do (they apply until first backend use): force an 8-device CPU
# platform so tests never compile over RPC.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# NO persistent compilation cache for the suite.  XLA:CPU executable
# (de)serialization segfaulted the run four times across rounds 5A/5B
# (rc=139: twice in put_executable_and_time, once in get_ — including on a
# freshly-created cache dir, and at non-deterministic suite positions), and
# AOT results written on one host crash when loaded on a machine with a
# different AVX/AMX feature set (the session migrates hosts).  Cold compiles
# cost a few extra minutes per run; a flaky segfault costs the whole suite.
# fp32 parity with the torch oracles (JAX CPU matmuls default to a reduced
# precision that costs ~3 decimal digits)
jax.config.update("jax_default_matmul_precision", "highest")

"""Test configuration: force an 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding/collective tests run on
virtual CPU devices (the TPU-era analogue of the reference's 2-rank
localhost GLOO test, habitat-lab-dialog/test/test_ddppo_reduce.py:119-126).

The environment's sitecustomize registers the axon TPU backend at
*interpreter start* and that registration pins the JAX platform — setting
JAX_PLATFORMS=cpu afterwards is ignored, and every test compile would route
through the TPU tunnel (minutes instead of seconds). So on the first
pytest_configure we stop pytest's fd capture (to keep the terminal) and
re-exec the whole test process with a scrubbed environment.
"""

import os
import sys

_ALREADY_CLEAN = (
    os.environ.get("AVLEN_TESTS_REEXEC") == "1"
    or not os.environ.get("PALLAS_AXON_POOL_IPS")
)


def mesh_cpu_flags(flags: str, n_devices: int = 8) -> str:
    """XLA_FLAGS for a virtual n-device CPU mesh on this 1-core host.

    Besides forcing the device count, the XLA:CPU stuck-collective watchdog
    (--xla_cpu_collective_call_terminate_timeout_seconds, default ~30s) must
    be raised: with N virtual device threads time-slicing ONE core through a
    heavy shard_map superstep, a device can legitimately sit in a collective
    for minutes, and the watchdog SIGABRTs the process (the round-2/3 mesh
    test aborts). Real multi-chip TPU runs are unaffected — these flags are
    test/dryrun plumbing only."""
    if "xla_force_host_platform_device_count" not in flags:
        flags += f" --xla_force_host_platform_device_count={n_devices}"
    if "collective_call_terminate_timeout" not in flags:
        flags += (
            " --xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
            " --xla_cpu_collective_call_terminate_timeout_seconds=3600"
            " --xla_cpu_collective_timeout_seconds=3600"
        )
    return flags.strip()


if _ALREADY_CLEAN:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    os.environ["XLA_FLAGS"] = mesh_cpu_flags(os.environ.get("XLA_FLAGS", ""))
    os.environ.setdefault("JAX_ENABLE_X64", "0")


def pytest_configure(config):
    if _ALREADY_CLEAN:
        return
    env = dict(os.environ)
    env.update(
        {
            "JAX_PLATFORMS": "cpu",
            "PALLAS_AXON_POOL_IPS": "",
            "PALLAS_AXON_REMOTE_COMPILE": "",
            "AVLEN_TESTS_REEXEC": "1",
        }
    )
    env["XLA_FLAGS"] = mesh_cpu_flags(env.get("XLA_FLAGS", ""))
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        capman.stop_global_capturing()
    sys.stdout.flush()
    sys.stderr.flush()
    os.execve(sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:], env)


import gc

import pytest


@pytest.fixture(autouse=True, scope="module")
def _drop_jax_state_between_modules():
    """Release compiled executables + live buffers after each test module.

    ~150 jit-heavy tests in one process accumulate XLA executables (and
    their thread pools / buffers); on small hosts the CPU client eventually
    aborts. Each module recompiles what it needs anyway, so dropping the
    caches trades a little compile time for a bounded footprint."""
    yield
    import jax

    jax.clear_caches()
    gc.collect()

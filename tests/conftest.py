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

if _ALREADY_CLEAN:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
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
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
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

"""Test configuration: force an 8-device CPU mesh before JAX initializes.

Multi-chip hardware is not available in CI; sharding/collective tests run on
virtual CPU devices (the TPU-era analogue of the reference's 2-rank
localhost GLOO test, habitat-lab-dialog/test/test_ddppo_reduce.py:119-126).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

"""Test configuration: force an 8-device CPU mesh before JAX initializes.

Multi-chip hardware is not available in CI; sharding/collective tests run on
virtual CPU devices (the TPU-era analogue of the reference's 2-rank
localhost GLOO test, habitat-lab-dialog/test/test_ddppo_reduce.py:119-126).

Note: the environment's sitecustomize registers the axon TPU backend at
interpreter start unless PALLAS_AXON_POOL_IPS is cleared, so we must both
clear it and pin JAX_PLATFORMS *here* (conftest imports before jax).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

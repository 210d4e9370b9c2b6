"""Device mesh construction.

Replaces the reference's process-group bring-up (TCPStore rendezvous +
GLOO/NCCL init, ss_baselines/savi/ddppo/algo/ddp_utils.py:129-182) with JAX
mesh construction: collectives ride ICI inside one SPMD program; multi-host
runs use jax.distributed (no parameter server, no master address plumbing).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(axis_names: Sequence[str] = ("data",), shape: Optional[Sequence[int]] = None, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        shape = [-1] + [1] * (len(axis_names) - 1)
    shape = list(shape)
    if -1 in shape:
        fixed = int(np.prod([s for s in shape if s != -1]))
        shape[shape.index(-1)] = max(n // max(fixed, 1), 1)
    total = int(np.prod(shape))
    dev_array = np.asarray(devices[:total]).reshape(shape)
    return Mesh(dev_array, tuple(axis_names))


def init_distributed_if_needed() -> None:
    """Multi-host init (the analogue of init_distrib_slurm): a no-op on a
    single host; on SLURM/multi-host pods call jax.distributed.initialize
    from env vars."""
    import os

    if "JAX_COORDINATOR_ADDRESS" in os.environ and jax.process_count() == 1:
        jax.distributed.initialize()

from avlen_tpu.parallel.mesh import make_mesh
from avlen_tpu.parallel.ddppo import (
    DDPPOStep,
    infer_env_specs,
    make_ddppo_step,
    make_local_superstep,
    make_sharded_superstep,
    shard_pytree,
)

__all__ = [
    "make_mesh",
    "DDPPOStep",
    "infer_env_specs",
    "make_ddppo_step",
    "make_local_superstep",
    "make_sharded_superstep",
    "shard_pytree",
]

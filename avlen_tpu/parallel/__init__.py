from avlen_tpu.parallel.mesh import make_mesh
from avlen_tpu.parallel.ddppo import DDPPOStep, make_ddppo_step

__all__ = ["make_mesh", "DDPPOStep", "make_ddppo_step"]

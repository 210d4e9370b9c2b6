from avlen_tpu.sim.graph import NavGraph, build_scene_tables
from avlen_tpu.sim.scene import SceneBank
from avlen_tpu.sim.env import BatchedAudioNavEnv, EnvState

__all__ = ["NavGraph", "build_scene_tables", "SceneBank", "BatchedAudioNavEnv", "EnvState"]

from avlen_tpu.rl.gae import compute_gae
from avlen_tpu.rl.ppo import PPOConfig, ppo_update
from avlen_tpu.rl.rollout import RolloutBatch, collect_rollout

__all__ = ["compute_gae", "PPOConfig", "ppo_update", "RolloutBatch", "collect_rollout"]

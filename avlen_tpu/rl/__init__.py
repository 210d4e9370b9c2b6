from avlen_tpu.rl.gae import compute_gae
from avlen_tpu.rl.ppo import PPOConfig, make_optimizer, ppo_update
from avlen_tpu.rl.ppo_interactive import dialog_supervised_update, ppo_update_interactive
from avlen_tpu.rl.rollout import CarryState, RolloutBatch, collect_rollout
from avlen_tpu.rl.rollout_smt import (
    SMTCarry,
    batched_ring_eval,
    collect_rollout_smt,
    evaluate_sequence_smt,
    evaluate_sequence_smt_batched,
    reconstruct_memory_views,
)
from avlen_tpu.rl.rollout_interactive import (
    InteractiveCarry,
    InteractiveConfig,
    InteractiveFns,
    collect_rollout_interactive,
)

__all__ = [
    "compute_gae",
    "PPOConfig",
    "make_optimizer",
    "ppo_update",
    "ppo_update_interactive",
    "dialog_supervised_update",
    "RolloutBatch",
    "CarryState",
    "collect_rollout",
    "SMTCarry",
    "collect_rollout_smt",
    "evaluate_sequence_smt",
    "evaluate_sequence_smt_batched",
    "batched_ring_eval",
    "reconstruct_memory_views",
    "InteractiveCarry",
    "InteractiveConfig",
    "InteractiveFns",
    "collect_rollout_interactive",
]

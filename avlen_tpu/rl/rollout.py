"""On-device rollout collection.

The TPU replacement for the reference's per-step Python rollout loop
(`_collect_rollout_step` called num_steps times with env RPCs and GPU
forwards per step — ss_baselines/av_nav/ppo/ppo_trainer.py:150-230,
savi/ppo/ppo_trainer.py:323-897) and its `RolloutStorage` tensors
(common/rollout_storage.py:16-241). Here the whole T-step rollout is ONE
`lax.scan` over the jitted env step + policy step, and the "storage" is just
the scan's stacked outputs — resident in HBM, zero host round-trips.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp


class RolloutBatch(NamedTuple):
    """Stacked trajectory, reference RolloutStorage fields re-expressed."""

    obs: Dict[str, jnp.ndarray]  # (T, B, ...) observation at act time
    actions: jnp.ndarray  # (T, B) i32
    log_probs: jnp.ndarray  # (T, B)
    values: jnp.ndarray  # (T, B)
    rewards: jnp.ndarray  # (T, B)
    masks: jnp.ndarray  # (T, B) mask applied when acting at t (1 - done_{t-1})
    dones: jnp.ndarray  # (T, B)
    metrics: Dict[str, jnp.ndarray]  # (T, B) per-step measures
    initial_hidden: jnp.ndarray  # (B, H*) hidden before step 0
    bootstrap_value: jnp.ndarray  # (B,)


class CarryState(NamedTuple):
    env_state: Any
    obs: Dict[str, jnp.ndarray]
    hidden: jnp.ndarray
    masks: jnp.ndarray  # (B,) mask for next act
    key: jax.Array


def collect_rollout(
    env_step: Callable,  # (env_state, actions) -> (env_state, StepOutput)
    policy_apply: Callable,  # (obs, hidden, masks, key) -> (action, logp, value, hidden, logits)
    value_apply: Callable,  # (obs, hidden, masks) -> value
    carry: CarryState,
    num_steps: int,
) -> Tuple[CarryState, RolloutBatch]:
    """Run T env steps under jit; call under jax.jit with static closures."""

    initial_hidden = carry.hidden

    def step_fn(c: CarryState, _):
        key, sub = jax.random.split(c.key)
        action, logp, value, hidden, _ = policy_apply(c.obs, c.hidden, c.masks, sub)
        env_state, out = env_step(c.env_state, action)
        masks_next = 1.0 - out.done.astype(jnp.float32)
        new_c = CarryState(env_state, out.obs, hidden, masks_next, key)
        store = dict(
            obs=c.obs,
            actions=action,
            log_probs=logp,
            values=value,
            rewards=out.reward,
            masks=c.masks,
            dones=out.done,
            metrics=out.metrics,
        )
        return new_c, store

    carry, traj = jax.lax.scan(step_fn, carry, None, length=num_steps)
    bootstrap = value_apply(carry.obs, carry.hidden, carry.masks)
    batch = RolloutBatch(
        obs=traj["obs"],
        actions=traj["actions"],
        log_probs=traj["log_probs"],
        values=traj["values"],
        rewards=traj["rewards"],
        masks=traj["masks"],
        dones=traj["dones"],
        metrics=traj["metrics"],
        initial_hidden=initial_hidden,
        bootstrap_value=bootstrap,
    )
    return carry, batch

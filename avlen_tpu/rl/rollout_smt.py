"""Rollout collection and PPO re-evaluation for SMT (external-memory) policies.

The reference collects SAVi rollouts step-by-step, keeping `num_copies = T+1`
snapshots of the external memory so each PPO minibatch step can see its own
memory view (savi/models/rollout_storage.py:145-173, 907-960) — O(T·M·B·F)
storage. Here the memory ring buffer lives in the scan carry (O(M·B·F)) and
PPO re-evaluation *replays* the stored step features into a fresh ring while
scanning the sequence — numerically identical views (memory entries are the
collection-time features, held constant across PPO epochs exactly like the
reference's snapshots) at a T-fold memory saving.

The belief predictor refresh (`belief_predictor.update` after each env step,
savi/ppo/ppo_trainer.py:890-894) is fused into the same scan: beliefs are
computed *before* acting, written into the stored observations, and carried
as a BeliefState pytree.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from avlen_tpu.models.belief_predictor import BeliefState
from avlen_tpu.models.memory import SMTMemory, insert, reset_where


class SMTCarry(NamedTuple):
    env_state: Any
    obs: Dict[str, jnp.ndarray]
    prev_action: jnp.ndarray  # (B,) i32
    masks: jnp.ndarray  # (B,) f32 — 0 at episode start
    memory: SMTMemory
    belief: BeliefState
    key: jax.Array


def collect_rollout_smt(
    env_step: Callable,  # (env_state, actions) -> (env_state, StepOutput)
    act_fn: Callable,  # (obs, prev_a, mem_feats, mem_valid, key) -> (a, lp, v, x, logits)
    value_fn: Callable,  # (obs, prev_a, mem_feats, mem_valid) -> v
    belief_fn: Optional[Callable],  # (belief_state, obs, new_episode) -> (state, cat, loc)
    carry: SMTCarry,
    num_steps: int,
):
    """Returns (carry, RolloutBatch) with SMT extras stored in obs under
    reserved keys: __prev_action, __feature."""
    from avlen_tpu.rl.rollout import RolloutBatch

    initial_memory = carry.memory

    def step_fn(c: SMTCarry, _):
        key, sub = jax.random.split(c.key)
        new_ep = c.masks == 0
        memory = reset_where(c.memory, new_ep)
        prev_action = jnp.where(new_ep, 0, c.prev_action)

        obs = dict(c.obs)
        belief_state = c.belief
        if belief_fn is not None:
            belief_state, cat_belief, loc_belief = belief_fn(belief_state, obs, new_ep)
            obs["category_belief"] = cat_belief
            obs["location_belief"] = loc_belief

        action, logp, value, x, _ = act_fn(obs, prev_action, memory.features, memory.valid, sub)
        memory = insert(memory, x)

        env_state, out = env_step(c.env_state, action)
        masks_next = 1.0 - out.done.astype(jnp.float32)
        new_c = SMTCarry(env_state, out.obs, action, masks_next, memory, belief_state, key)
        store = dict(
            obs={**obs, "__prev_action": prev_action, "__feature": jax.lax.stop_gradient(x)},
            actions=action,
            log_probs=logp,
            values=value,
            rewards=out.reward,
            masks=c.masks,
            dones=out.done,
            metrics=out.metrics,
        )
        return new_c, store

    carry2, traj = jax.lax.scan(step_fn, carry, None, length=num_steps)

    # bootstrap value from the post-rollout state
    new_ep = carry2.masks == 0
    memory_b = reset_where(carry2.memory, new_ep)
    prev_a_b = jnp.where(new_ep, 0, carry2.prev_action)
    obs_b = dict(carry2.obs)
    if belief_fn is not None:
        _, cat_b, loc_b = belief_fn(carry2.belief, obs_b, new_ep)
        obs_b["category_belief"] = cat_b
        obs_b["location_belief"] = loc_b
    bootstrap = value_fn(obs_b, prev_a_b, memory_b.features, memory_b.valid)

    batch = RolloutBatch(
        obs=traj["obs"],
        actions=traj["actions"],
        log_probs=traj["log_probs"],
        values=traj["values"],
        rewards=traj["rewards"],
        masks=traj["masks"],
        dones=traj["dones"],
        metrics=traj["metrics"],
        initial_hidden=initial_memory,
        bootstrap_value=bootstrap,
    )
    return carry2, batch


def evaluate_sequence_smt(
    evaluate_step: Callable,  # (obs, prev_a, mem_feats, mem_valid, actions) -> (v, lp, ent, logits, x)
    obs_seq: Dict[str, jnp.ndarray],  # (T, Bm, ...) incl. __prev_action/__feature
    initial_memory: SMTMemory,
    masks_seq: jnp.ndarray,  # (T, Bm)
    actions_seq: jnp.ndarray,  # (T, Bm)
):
    """PPO sequence evaluation replaying stored features into the ring buffer.
    Returns (values, log_probs, entropy, logits), each (T, Bm, ...)."""
    prev_actions = obs_seq["__prev_action"]
    features = obs_seq["__feature"]
    sensor_obs = {k: v for k, v in obs_seq.items() if not k.startswith("__")}

    # rematerialize each step's policy forward in the backward pass: without
    # this the scan would keep every step's CNN/transformer activations live
    # (the reference pays the analogous cost as num_copies memory snapshots)
    evaluate_step = jax.checkpoint(evaluate_step)

    def step(mem, inp):
        obs_t, pa_t, feat_t, m_t, a_t = inp
        mem = reset_where(mem, m_t == 0)
        v, lp, ent, logits, _ = evaluate_step(obs_t, pa_t, mem.features, mem.valid, a_t)
        mem = insert(mem, feat_t)
        return mem, (v, lp, ent, logits)

    _, (v, lp, ent, logits) = jax.lax.scan(
        step, initial_memory, (sensor_obs, prev_actions, features, masks_seq, actions_seq)
    )
    return v, lp, ent, logits

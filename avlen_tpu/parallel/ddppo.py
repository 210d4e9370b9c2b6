"""DD-PPO as one SPMD program over a device mesh.

The reference's decentralized distributed PPO (ss_baselines/savi/ddppo/algo/
ddppo.py:49-100: torch DDP gradient buckets; ddppo_trainer.py:515-1200:
per-GPU processes, TCPStore rollout counters, straggler preemption at
sync_frac=0.6) re-designed for TPUs: every chip runs the SAME jitted
(rollout → GAE → PPO) superstep on its shard of env slots under `shard_map`,
and gradient sync is a `lax.pmean` inside each minibatch step — the moral
equivalent of DDP's bucketed allreduce, but compiled into the XLA program on
ICI. SPMD synchrony makes straggler preemption moot: all chips step the
batched env in lockstep, so there is no slow worker to wait for.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from avlen_tpu.rl.gae import compute_gae
from avlen_tpu.rl.ppo import PPOConfig, ppo_update
from avlen_tpu.rl.rollout import CarryState, collect_rollout


class DDPPOStep(NamedTuple):
    step_fn: Callable  # (params, opt_state, carry, key) -> (params, opt_state, carry, batch, stats)
    mesh: Mesh


def make_ddppo_step(
    env_step: Callable,
    policy_act: Callable,  # (params, obs, h, m, key) -> (a, lp, v, h, logits)
    policy_value: Callable,  # (params, obs, h, m) -> v
    evaluate_actions: Callable,  # (params, obs, h0, masks, actions) -> (v, lp, ent, logits)
    optimizer,
    ppo_cfg: PPOConfig,
    num_steps: int,
    mesh: Mesh,
    axis: str = "data",
) -> DDPPOStep:
    """Build the sharded train superstep. Env state / obs / rollout tensors are
    sharded over ``axis`` on their env dimension; params and optimizer state
    are replicated; grads are pmean'd across the axis each minibatch."""

    def local_step(params, opt_state, carry: CarryState, key):
        # per-shard RNG: decorrelate env-slot exploration across chips, and
        # split the rollout carry key from the PPO-update key so the
        # action-sampling and minibatch-permutation streams are independent
        key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        rollout_key, update_key = jax.random.split(key)
        carry = carry._replace(key=rollout_key)

        def pol(obs, h, m, k):
            return policy_act(params, obs, h, m, k)

        def val(obs, h, m):
            return policy_value(params, obs, h, m)

        carry, batch = collect_rollout(env_step, pol, val, carry, num_steps)
        adv, ret = compute_gae(
            batch.rewards,
            batch.values,
            batch.bootstrap_value,
            1.0 - batch.dones.astype(jnp.float32),
            ppo_cfg.gamma,
            ppo_cfg.tau,
        )
        new_params, new_opt_state, stats = ppo_update(
            params,
            opt_state,
            batch,
            adv,
            ret,
            update_key,
            evaluate_actions,
            optimizer,
            ppo_cfg,
            grad_reduce=lambda g: jax.lax.pmean(g, axis),
        )
        stats = {k: jax.lax.pmean(v, axis) for k, v in stats.items()}
        return new_params, new_opt_state, carry, batch, stats

    # params/opt replicated; carry sharded on its env dim; rollout tensors are
    # (T, B, ...) so their env dim is axis 1
    replicated = P()
    carry_spec = CarryState(
        env_state=P(axis), obs=P(axis), hidden=P(axis), masks=P(axis), key=P()
    )
    from avlen_tpu.rl.rollout import RolloutBatch

    time_major = P(None, axis)
    batch_spec = RolloutBatch(
        obs=time_major,
        actions=time_major,
        log_probs=time_major,
        values=time_major,
        rewards=time_major,
        masks=time_major,
        dones=time_major,
        metrics=time_major,
        initial_hidden=P(axis),
        bootstrap_value=P(axis),
    )

    step = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(replicated, replicated, carry_spec, replicated),
        out_specs=(replicated, replicated, carry_spec, batch_spec, replicated),
        check_vma=False,
    )
    return DDPPOStep(step_fn=jax.jit(step), mesh=mesh)


def shard_carry(carry: CarryState, mesh: Mesh, axis: str = "data") -> CarryState:
    """Place a host-built carry onto the mesh with env-dim sharding."""
    sharding = NamedSharding(mesh, P(axis))

    def put(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            return jax.device_put(x, sharding)
        return x

    # key is per-shard; replicate it (folded inside the step)
    return CarryState(
        env_state=jax.tree.map(put, carry.env_state),
        obs=jax.tree.map(put, carry.obs),
        hidden=put(carry.hidden),
        masks=put(carry.masks),
        key=jax.device_put(carry.key, NamedSharding(mesh, P())),
    )

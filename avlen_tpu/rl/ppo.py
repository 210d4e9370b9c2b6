"""PPO update (clipped surrogate + clipped value loss + entropy bonus).

Semantics of the reference PPO (ss_baselines/av_nav/ppo/ppo.py and
savi/ppo/ppo.py:157-289): per-epoch recurrent minibatches over env slots,
clipped importance-ratio surrogate, clipped value loss (0.5 * max of
clipped/unclipped), entropy bonus, optional advantage normalization, global
grad-norm clipping, Adam(lr, eps). The AVLEN extensions (rl_mask gating, the
auxiliary uncertainty head) live in rl/ppo_interactive.py.

TPU-native: the whole update (epochs × minibatches) compiles into one jit;
minibatches are env-slot slices of fixed size with epoch-fresh permutations
drawn from the update's PRNG key.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from avlen_tpu.rl.rollout import RolloutBatch


@dataclasses.dataclass(frozen=True)
class PPOConfig:
    clip_param: float = 0.2
    ppo_epoch: int = 4
    num_mini_batch: int = 2
    value_loss_coef: float = 0.5
    entropy_coef: float = 0.01
    lr: float = 7e-4
    eps: float = 1e-5
    max_grad_norm: float = 0.5
    gamma: float = 0.99
    tau: float = 0.95
    use_gae: bool = True
    use_normalized_advantage: bool = False
    use_clipped_value_loss: bool = True
    # linear LR decay to 0 over the run (reference: LambdaLR with
    # linear_decay(update, NUM_UPDATES), ppo_trainer.py:1176-1178); the
    # horizon is in OPTIMIZER steps = NUM_UPDATES × ppo_epoch × num_mini_batch
    use_linear_lr_decay: bool = False
    lr_decay_steps: int = 0


def make_optimizer(config: PPOConfig) -> optax.GradientTransformation:
    lr = config.lr
    if config.use_linear_lr_decay and config.lr_decay_steps > 0:
        lr = optax.linear_schedule(config.lr, 0.0, config.lr_decay_steps)
    return optax.chain(
        optax.clip_by_global_norm(config.max_grad_norm),
        optax.adam(lr, eps=config.eps),
    )


def ppo_loss(
    params,
    evaluate_actions: Callable,
    obs,  # (T, Bm, ...)
    actions,
    old_log_probs,
    initial_hidden,
    masks,
    returns,
    advantages,
    old_values,
    config: PPOConfig,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    values, log_probs, entropy, _ = evaluate_actions(params, obs, initial_hidden, masks, actions)

    ratio = jnp.exp(log_probs - old_log_probs)
    surr1 = ratio * advantages
    surr2 = jnp.clip(ratio, 1.0 - config.clip_param, 1.0 + config.clip_param) * advantages
    action_loss = -jnp.minimum(surr1, surr2).mean()

    if config.use_clipped_value_loss:
        value_pred_clipped = old_values + jnp.clip(
            values - old_values, -config.clip_param, config.clip_param
        )
        vl1 = (values - returns) ** 2
        vl2 = (value_pred_clipped - returns) ** 2
        value_loss = 0.5 * jnp.maximum(vl1, vl2).mean()
    else:
        value_loss = 0.5 * ((returns - values) ** 2).mean()

    ent = entropy.mean()
    total = value_loss * config.value_loss_coef + action_loss - ent * config.entropy_coef
    return total, {"value_loss": value_loss, "action_loss": action_loss, "entropy": ent}


def ppo_update(
    params,
    opt_state,
    batch: RolloutBatch,
    advantages: jnp.ndarray,  # (T, B)
    returns: jnp.ndarray,  # (T, B)
    key: jax.Array,
    evaluate_actions: Callable,  # (params, obs(T,Bm,..), h0, masks, actions) -> (v, lp, ent, logits)
    optimizer: optax.GradientTransformation,
    config: PPOConfig,
    grad_reduce: Callable = lambda g: g,  # DD-PPO: lax.pmean over the data axis
):
    """One full PPO update; call under jit with static closures."""
    t, b = batch.actions.shape
    num_mb = min(config.num_mini_batch, b)
    mb_size = b // num_mb

    adv = advantages
    if config.use_normalized_advantage:
        adv = (adv - adv.mean()) / (adv.std() + 1e-5)

    stats0 = {"value_loss": 0.0, "action_loss": 0.0, "entropy": 0.0}
    grad_fn = jax.value_and_grad(ppo_loss, has_aux=True)

    def select_envs(tree, idx):
        return jax.tree.map(lambda v: jnp.take(v, idx, axis=1), tree)

    def select_envs0(tree, idx):
        # initial hidden state: env dim is axis 0 (works for pytree hiddens
        # like the SMT external memory)
        return jax.tree.map(lambda v: jnp.take(v, idx, axis=0), tree)

    carry = (params, opt_state, stats0)
    for e in range(config.ppo_epoch):
        key, sub = jax.random.split(key)
        perm = jax.random.permutation(sub, b)
        for m in range(num_mb):
            idx = jax.lax.dynamic_slice_in_dim(perm, m * mb_size, mb_size)
            params_c, opt_state_c, stats = carry
            (loss, aux), grads = grad_fn(
                params_c,
                evaluate_actions,
                select_envs(batch.obs, idx),
                jnp.take(batch.actions, idx, axis=1),
                jnp.take(batch.log_probs, idx, axis=1),
                select_envs0(batch.initial_hidden, idx),
                jnp.take(batch.masks, idx, axis=1),
                jnp.take(returns, idx, axis=1),
                jnp.take(adv, idx, axis=1),
                jnp.take(batch.values, idx, axis=1),
                config,
            )
            grads = grad_reduce(grads)
            updates, opt_state_c = optimizer.update(grads, opt_state_c, params_c)
            params_c = optax.apply_updates(params_c, updates)
            stats = {k: stats[k] + aux[k] for k in stats}
            carry = (params_c, opt_state_c, stats)

    params, opt_state, stats = carry
    n = config.ppo_epoch * num_mb
    stats = {k: v / n for k, v in stats.items()}
    return params, opt_state, stats

"""Scripted baseline agents + local benchmark harness.

Capability match for ss_baselines/common/simple_agents.py (RandomAgent,
ForwardOnlyAgent, RandomForwardAgent, GoalFollower) and common/benchmark.py
(episode-loop evaluation of an agent) — batched over the device env.
"""

from __future__ import annotations

import collections
from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np

from avlen_tpu.sim.env import BatchedAudioNavEnv, EnvState


class RandomAgent:
    """Uniform over {STOP, FWD, LEFT, RIGHT} (simple_agents.py)."""

    def __init__(self, seed: int = 0):
        self.key = jax.random.key(seed)

    def act(self, env: BatchedAudioNavEnv, state: EnvState, obs) -> jnp.ndarray:
        self.key, sub = jax.random.split(self.key)
        return jax.random.randint(sub, (env.num_envs,), 0, 4)


class ForwardOnlyAgent:
    def act(self, env, state, obs) -> jnp.ndarray:
        return jnp.ones((env.num_envs,), jnp.int32)


class RandomForwardAgent:
    """80% forward, else random turn."""

    def __init__(self, seed: int = 0):
        self.key = jax.random.key(seed)

    def act(self, env, state, obs) -> jnp.ndarray:
        self.key, k1, k2 = jax.random.split(self.key, 3)
        fwd = jax.random.uniform(k1, (env.num_envs,)) < 0.8
        turn = jax.random.randint(k2, (env.num_envs,), 2, 4)
        return jnp.where(fwd, 1, turn)


class GoalFollower:
    """Follows oracle actions (GoalFollower in simple_agents.py)."""

    def act(self, env, state, obs) -> jnp.ndarray:
        return env.oracle_action(state)


def benchmark_agent(env: BatchedAudioNavEnv, agent, num_episodes: int = 50, max_steps: int = 2000) -> Dict[str, float]:
    """Local Benchmark.evaluate equivalent (common/benchmark.py:26-107)."""
    state, obs = env.reset()
    stats = collections.defaultdict(list)
    episodes = 0
    steps = 0
    while episodes < num_episodes and steps < max_steps:
        actions = agent.act(env, state, obs)
        state, out = env.step(state, actions)
        obs = out.obs
        dones = np.asarray(out.done)
        metrics = {k: np.asarray(v) for k, v in out.metrics.items()}
        for b in np.nonzero(dones)[0]:
            if episodes >= num_episodes:
                break
            for k in metrics:
                stats[k].append(metrics[k][b])
            episodes += 1
        steps += 1
    return {k: float(np.mean(v)) for k, v in stats.items()}

"""Generalized advantage estimation as a reverse scan.

Semantics of RolloutStorage.compute_returns with use_gae=True
(ss_baselines/common/rollout_storage.py:160-180; savi variant
savi/models/rollout_storage.py:394-412): masks gate value bootstrap and
advantage propagation at episode boundaries.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


@jax.jit
def compute_gae(
    rewards: jnp.ndarray,  # (T, B)
    values: jnp.ndarray,  # (T, B)
    bootstrap_value: jnp.ndarray,  # (B,)
    next_masks: jnp.ndarray,  # (T, B) 1 - done_t: whether t+1 continues the episode
    gamma: float = 0.99,
    tau: float = 0.95,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (advantages, returns), each (T, B)."""

    def step(carry, inp):
        gae, next_value = carry
        r, v, m = inp
        delta = r + gamma * next_value * m - v
        gae = delta + gamma * tau * m * gae
        return (gae, v), gae

    (_, _), adv_rev = jax.lax.scan(
        step,
        (jnp.zeros_like(bootstrap_value), bootstrap_value),
        (rewards[::-1], values[::-1], next_masks[::-1]),
    )
    advantages = adv_rev[::-1]
    returns = advantages + values
    return advantages, returns

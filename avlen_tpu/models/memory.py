"""External scene-memory ring buffer (device-resident).

Capability match for `ExternalMemory` (ss_baselines/savi/models/
rollout_storage.py:907-960): a per-env ring of the last `capacity`
step-features with validity masking. The reference keeps `num_copies = T+1`
snapshots of the whole buffer so PPO re-evaluation can see each step's
memory view; here a single buffer lives in the rollout carry and re-eval
reconstructs per-step views by replaying the stored features (see
rl/rollout_smt.py) — O(M) memory instead of O(T·M).

All ops are pure (B, ...) array functions usable inside `lax.scan`.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class SMTMemory(NamedTuple):
    features: jnp.ndarray  # (B, M, F)
    valid: jnp.ndarray  # (B, M) f32 1 = valid
    idx: jnp.ndarray  # (B,) i32 next write slot


def init_memory(batch: int, capacity: int, feature_dim: int) -> SMTMemory:
    return SMTMemory(
        features=jnp.zeros((batch, capacity, feature_dim), jnp.float32),
        valid=jnp.zeros((batch, capacity), jnp.float32),
        idx=jnp.zeros((batch,), jnp.int32),
    )


def reset_where(memory: SMTMemory, done: jnp.ndarray) -> SMTMemory:
    """Clear envs whose episode ended (reference: memory masks reset at
    episode boundaries via masks=0)."""
    keep = (~done).astype(memory.valid.dtype)
    return SMTMemory(
        features=memory.features * keep[:, None, None],
        valid=memory.valid * keep[:, None],
        idx=jnp.where(done, 0, memory.idx),
    )


def insert(memory: SMTMemory, feature: jnp.ndarray) -> SMTMemory:
    """Write `feature` (B, F) at the ring position (stop-gradient: memory
    entries are constants for PPO like the reference's stored snapshots)."""
    feature = jax.lax.stop_gradient(feature)
    b, m, _ = memory.features.shape
    onehot = jax.nn.one_hot(memory.idx, m, dtype=memory.features.dtype)  # (B, M)
    features = memory.features * (1 - onehot)[..., None] + onehot[..., None] * feature[:, None, :]
    valid = jnp.maximum(memory.valid, onehot)
    return SMTMemory(features=features, valid=valid, idx=(memory.idx + 1) % m)

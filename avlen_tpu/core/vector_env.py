"""VectorEnv-compatible facade over the batched device environment.

Migration-surface parity with habitat's `VectorEnv`/`SyncVectorEnv`
(habitat-lab-dialog/habitat/core/vector_env.py:136-712; ss_baselines/common/
sync_vector_env.py:75-586 incl. the AVLEN extensions agent_state /
is_new_episode / compute_oracle_actions): the same call surface —
``reset() -> [obs]``, ``step(actions) -> [(obs, reward, done, info)]``,
``pause_at`` / ``resume_all``, ``async_step`` / ``wait_step`` — implemented
over ONE device-batched env instead of worker processes. ``pause_at`` masks
a slot (its actions are replaced by no-ops and its outputs withheld) rather
than shrinking the batch: fixed shapes keep the jitted step compiled once.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from avlen_tpu.sim.env import BatchedAudioNavEnv, EnvState, TURN_LEFT


class VectorEnv:
    def __init__(self, env: BatchedAudioNavEnv):
        self._env = env
        self._state: Optional[EnvState] = None
        self._obs = None
        self._paused: set = set()
        self._pending = None

    @property
    def num_envs(self) -> int:
        return self._env.num_envs - len(self._paused)

    # -- lifecycle --------------------------------------------------------
    def reset(self) -> List[Dict[str, np.ndarray]]:
        self._state, obs = self._env.reset()
        self._obs = obs
        return self._split_obs(obs)

    def step(self, actions: Sequence[int]):
        self.async_step(actions)
        return self.wait_step()

    def async_step(self, actions: Sequence[int]) -> None:
        full = np.full((self._env.num_envs,), TURN_LEFT, np.int32)
        alive = [i for i in range(self._env.num_envs) if i not in self._paused]
        for slot, a in zip(alive, actions):
            full[slot] = int(a)
        # paused slots hold position: rotating in place twice returns... use a
        # no-op by stepping TURN_LEFT then ignoring output; state drift for
        # paused slots is acceptable only if they are resumed via reset —
        # instead freeze them by restoring their state after the step.
        prev_state = self._state
        state, out = self._env.step(self._state, jnp.asarray(full))
        if self._paused:
            keep = np.zeros((self._env.num_envs,), bool)
            for i in self._paused:
                keep[i] = True
            keepj = jnp.asarray(keep)
            state = type(state)(*[
                jnp.where(keepj.reshape((-1,) + (1,) * (new.ndim - 1)), old, new)
                for new, old in zip(state, prev_state)
            ])
        self._state = state
        self._pending = out

    def wait_step(self):
        out = self._pending
        self._pending = None
        self._obs = out.obs
        obs_list = self._split_obs(out.obs)
        rewards = np.asarray(out.reward)
        dones = np.asarray(out.done)
        infos = self._split_obs(out.metrics)
        alive = [i for i in range(self._env.num_envs) if i not in self._paused]
        # obs_list/infos are already alive-filtered; rewards/dones are full-batch
        return [
            (obs_list[j], float(rewards[i]), bool(dones[i]), infos[j])
            for j, i in enumerate(alive)
        ]

    # -- pause/resume (vector_env.py:588-612) ------------------------------
    def pause_at(self, index: int) -> None:
        alive = [i for i in range(self._env.num_envs) if i not in self._paused]
        self._paused.add(alive[index])

    def resume_all(self) -> None:
        self._paused.clear()

    # -- AVLEN RPC surface (sync_vector_env.py:54-57, 340-350) -------------
    def agent_state(self):
        st = self._env.agent_state_host(self._state)
        alive = [i for i in range(self._env.num_envs) if i not in self._paused]
        return [
            {k: v[i] for k, v in st.items()} for i in alive
        ]

    def is_new_episode(self) -> List[bool]:
        flags = np.asarray(self._state.new_episode)
        alive = [i for i in range(self._env.num_envs) if i not in self._paused]
        return [bool(flags[i]) for i in alive]

    def compute_oracle_actions(self) -> List[int]:
        acts = np.asarray(self._env.oracle_action(self._state))
        alive = [i for i in range(self._env.num_envs) if i not in self._paused]
        return [int(acts[i]) for i in alive]

    def call(self, function_names: Sequence[str], function_args_list=None) -> List[Any]:
        """`call` RPC equivalent (vector_env.py:613-633): dispatch a method
        name per env slot on this facade."""
        results = []
        for name in function_names:
            fn = getattr(self, name)
            results.append(fn())
        return results

    def close(self) -> None:
        pass

    # ----------------------------------------------------------------------
    def _split_obs(self, obs: Dict[str, jnp.ndarray]) -> List[Dict[str, np.ndarray]]:
        host = {k: np.asarray(v) for k, v in obs.items()}
        alive = [i for i in range(self._env.num_envs) if i not in self._paused]
        return [{k: v[i] for k, v in host.items()} for i in alive]


SyncVectorEnv = VectorEnv  # in-process variant is the same thing here
ThreadedVectorEnv = VectorEnv

"""Hierarchical MapNav env tests: high-level waypoint steps plan and execute
low-level actions, maps accumulate, STOP waypoint ends the episode."""

import numpy as np
import pytest

import jax.numpy as jnp

from avlen_tpu.core.episodes import pack_episodes
from avlen_tpu.sim.env import BatchedAudioNavEnv, EnvConfig
from avlen_tpu.sim.mapnav import BatchedMapNavEnv, MapNavConfig
from avlen_tpu.sim.synthetic import make_episodes, make_scene_bank


@pytest.fixture(scope="module")
def mapnav():
    bank, tables = make_scene_bank(
        np.random.RandomState(0), num_scenes=1, side=5, rir_length=300,
        sampling_rate=2000, frame_res=32,
    )
    eps = make_episodes(np.random.RandomState(1), tables, 8, min_hops=2, max_hops=6)
    packed = pack_episodes(eps, num_envs=2)
    base = BatchedAudioNavEnv(
        bank, packed, EnvConfig(max_episode_steps=40, sensors=("spectrogram", "depth", "pose"))
    )
    return BatchedMapNavEnv(base, MapNavConfig(
        internal_map_size=40, action_map_size=5, gm_size=9, am_size=9,
        ego_map_size=7, prediction_interval=4, bfs_iters=24,
    ))


def test_reset_provides_map_observations(mapnav):
    state, obs = mapnav.reset()
    assert obs["gm"].shape == (2, 9, 9, 2)
    assert obs["am"].shape == (2, 9, 9, 1)
    assert obs["action_map"].shape == (2, 5, 5, 1)
    mask = np.asarray(mapnav.action_mask(obs))
    assert mask.shape == (2, 25)
    assert mask[:, 12].all()  # center (stop) always allowed


def test_waypoint_step_moves_agent(mapnav):
    state, obs = mapnav.reset()
    env_state, mapper = state
    start_nodes = np.asarray(env_state.node).copy()
    # waypoint 2 cells ahead (egocentric up): row 0, col 2 → index 2
    wp = jnp.full((2,), 2, jnp.int32)
    state2, obs2, reward, done, metrics = mapnav.step(state, wp)
    env_state2, mapper2 = state2
    # the inner planner executed low-level steps; at least one env moved or
    # turned (map pose updated)
    moved = (np.asarray(mapper2.row) != np.asarray(mapper.row)) | (
        np.asarray(mapper2.col) != np.asarray(mapper.col)
    ) | (np.asarray(mapper2.orientation) != np.asarray(mapper.orientation))
    assert moved.any()
    assert reward.shape == (2,)
    # maps accumulated explored cells
    assert float(np.asarray(mapper2.geometric)[..., 1].sum()) > 0


def test_stop_waypoint_ends_episode(mapnav):
    state, obs = mapnav.reset()
    center = jnp.full((2,), 12, jnp.int32)  # 5x5 center
    state2, obs2, reward, done, metrics = mapnav.step(state, center)
    assert np.asarray(done).all()
    assert "success" in metrics

"""VectorEnv facade tests: habitat-compatible call surface over the batched
device env (reset/step tuples, pause/resume, AVLEN RPCs)."""

import numpy as np

from avlen_tpu.core.episodes import pack_episodes
from avlen_tpu.core.vector_env import VectorEnv
from avlen_tpu.sim.env import BatchedAudioNavEnv, EnvConfig
from avlen_tpu.sim.synthetic import make_episodes, make_scene_bank


def _make(num_envs=3):
    bank, tables = make_scene_bank(
        np.random.RandomState(0), num_scenes=1, side=5, rir_length=300,
        sampling_rate=2000, with_frames=False,
    )
    eps = make_episodes(np.random.RandomState(1), tables, 9, min_hops=2, max_hops=6)
    packed = pack_episodes(eps, num_envs=num_envs)
    env = BatchedAudioNavEnv(bank, packed, EnvConfig(max_episode_steps=20, sensors=("spectrogram", "pose")))
    return VectorEnv(env)


def test_reset_and_step_tuples():
    venv = _make()
    obs = venv.reset()
    assert len(obs) == 3
    assert "spectrogram" in obs[0]
    results = venv.step([2, 2, 2])
    assert len(results) == 3
    o, r, d, info = results[0]
    assert isinstance(r, float) and isinstance(d, bool)
    assert "spl" in info


def test_async_step_wait_step():
    venv = _make()
    venv.reset()
    venv.async_step([1, 1, 1])
    results = venv.wait_step()
    assert len(results) == 3


def test_pause_resume_freezes_slot():
    venv = _make()
    venv.reset()
    state_before = venv.agent_state()
    venv.pause_at(1)
    assert venv.num_envs == 2
    results = venv.step([1, 1])  # only two alive slots
    assert len(results) == 2
    # paused slot's state unchanged
    st = np.asarray(venv._state.node)
    full_before = state_before[1]["node"]
    assert st[1] == full_before
    venv.resume_all()
    assert venv.num_envs == 3
    assert len(venv.step([2, 2, 2])) == 3


def test_avlen_rpcs():
    venv = _make()
    venv.reset()
    assert venv.is_new_episode() == [True, True, True]
    acts = venv.compute_oracle_actions()
    assert len(acts) == 3 and all(0 <= a <= 3 for a in acts)
    states = venv.agent_state()
    assert "distance_to_goal" in states[0]
    venv.step([1, 1, 1])
    assert venv.is_new_episode() == [False, False, False]

"""Round-2 semantic-parity tests: exactly-once eval, episode sound offset,
distance-sampled query reward, and forced scene switches."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avlen_tpu.core.episodes import Episode, EpisodeIterator, pack_episodes
from avlen_tpu.sim.env import BatchedAudioNavEnv, EnvConfig, QueryInfo, RewardConfig
from avlen_tpu.sim.synthetic import make_episodes, make_scene_bank


@pytest.fixture(scope="module")
def world():
    bank, tables = make_scene_bank(
        np.random.RandomState(0), num_scenes=1, side=4, rir_length=200,
        sampling_rate=2000, frame_res=16, num_sounds=2, sound_secs=3,
    )
    return bank, tables


def _env(bank, episodes, num_envs=2, **cfg_kw):
    packed = pack_episodes(episodes, num_envs=num_envs)
    cfg = EnvConfig(
        max_episode_steps=8,
        sensors=("spectrogram", "pose", "category"),
        **cfg_kw,
    )
    return BatchedAudioNavEnv(bank, packed, cfg)


def _episode(tables, offset=0, sound=0, duration=500):
    t = tables[0]
    return Episode(
        episode_id="0", scene_id=0, start_node=0, start_rot_idx=0,
        goal_node=t.num_nodes - 1, sound_id=sound, offset=offset,
        duration=duration, geodesic_distance=1.0, num_action=3,
    )


# ---------------------------------------------------------------------------
def test_offset_shifts_the_audio_window(world):
    """episode.offset starts the sound that many seconds into the clip
    (multi-second-sound semantics; the reference parses AGENT_0.OFFSET at
    reconfigure, simulator.py:350-354)."""
    bank, tables = world
    e0 = _env(bank, [_episode(tables, offset=0)])
    e1 = _env(bank, [_episode(tables, offset=1)])
    e3 = _env(bank, [_episode(tables, offset=3)])  # secs=3 -> wraps to 0
    _, o0 = e0.reset()
    _, o1 = e1.reset()
    _, o3 = e3.reset()
    s0 = np.asarray(o0["spectrogram"][0])
    s1 = np.asarray(o1["spectrogram"][0])
    s3 = np.asarray(o3["spectrogram"][0])
    assert np.abs(s0 - s1).max() > 1e-6  # different second of the source clip
    np.testing.assert_allclose(s3, s0, rtol=1e-5, atol=1e-7)  # modulo wrap

    # stepping advances the window from the offset: offset=1 after one
    # TURN_LEFT (rot 1, audio index 2) equals offset=2 at reset with the same
    # start rotation (rot 1, audio index 2)
    import dataclasses

    ep2 = dataclasses.replace(_episode(tables, offset=2), start_rot_idx=1)
    e2 = _env(bank, [ep2])
    st1, _ = e1.reset()
    st1, out1 = e1.step(st1, jnp.array([2], jnp.int32))  # TURN_LEFT: node static
    _, o2 = e2.reset()
    np.testing.assert_allclose(
        np.asarray(out1.obs["spectrogram"][0]),
        np.asarray(o2["spectrogram"][0]),
        rtol=1e-4, atol=1e-6,
    )


# ---------------------------------------------------------------------------
def test_distance_sampled_query_reward(world):
    """WITH_DISTANCE_CONSTRAINT: queried steps gain QUERY_REWARD_DISTANCE when
    dtg * sample <= 3 (environments.py:126-133)."""
    bank, tables = world
    reward = RewardConfig(
        with_time_penalty=False, with_distance_reward=False,
        with_distance_constraint=True, query_reward_distance=-7.0,
    )
    env = _env(bank, [_episode(tables)], num_envs=1, reward=reward)
    state, _ = env.reset()
    actions = jnp.array([2], jnp.int32)  # TURN_LEFT, no movement

    def step(sample, queried=True):
        q = QueryInfo(
            is_queried=jnp.array([queried]),
            query_num=jnp.array([1], jnp.int32),
            cons_reward=jnp.zeros((1,)),
            dist_sample=jnp.array([sample], jnp.float32),
        )
        _, out = env._step_impl(state, actions, q)
        return float(out.reward[0])

    assert step(0.0) == pytest.approx(-7.0)  # dtg*0 <= 3 -> penalty
    assert step(1e6) == pytest.approx(0.0)  # dtg*1e6 > 3 -> no penalty
    assert step(0.0, queried=False) == pytest.approx(0.0)  # only when queried


# ---------------------------------------------------------------------------
def test_max_scene_repeat_forces_scene_switch():
    """Same-scene runs never exceed max_scene_repeat_episodes while another
    scene still has episodes (habitat dataset.py:310-356 semantics)."""
    episodes = []
    for s in range(2):
        for i in range(6):
            episodes.append(
                Episode(episode_id=f"{s}_{i}", scene_id=s, start_node=0,
                        start_rot_idx=0, goal_node=1)
            )
    it = EpisodeIterator(
        episodes, cycle=False, shuffle=True, group_by_scene=True,
        max_scene_repeat_episodes=2, seed=3,
    )
    order = [e.scene_id for e in it]
    assert len(order) == 12 and set(order) == {0, 1}
    run, longest = 1, 1
    for a, b in zip(order, order[1:]):
        run = run + 1 if a == b else 1
        longest = max(longest, run)
    assert longest <= 2, order


# ---------------------------------------------------------------------------
def test_avnav_eval_exactly_once(tmp_path):
    """Eval consumes every episode of the split exactly once: ids evaluated ==
    dataset ids, no repeats (reference pause-on-done protocol,
    base_trainer.py:185-289)."""
    import avlen_tpu.rl.trainers  # noqa: F401
    from avlen_tpu.config import get_config
    from avlen_tpu.core.registry import registry
    from avlen_tpu.utils.tb import TensorboardWriter

    cfg = get_config(
        opts=[
            "TRAINER_NAME", "AVNavTrainer",
            "TASK_CONFIG.DATASET.SYNTHETIC.SIDE", "4",
            "TASK_CONFIG.DATASET.SYNTHETIC.RIR_LENGTH", "200",
            "TASK_CONFIG.DATASET.SYNTHETIC.NUM_EPISODES", "11",
            "TASK_CONFIG.DATASET.SYNTHETIC.MAX_HOPS", "8",
            "TASK_CONFIG.DATASET.SYNTHETIC.FRAME_RES", "16",
            "TASK_CONFIG.SIMULATOR.AUDIO.RIR_SAMPLING_RATE", "2000",
            "TASK_CONFIG.ENVIRONMENT.MAX_EPISODE_STEPS", "6",
            "NUM_PROCESSES", "4",
            "NUM_UPDATES", "1",
            "RL.PPO.num_steps", "6",
            "RL.PPO.num_mini_batch", "1",
            "RL.PPO.ppo_epoch", "1",
            "RL.PPO.hidden_size", "32",
            "TEST_EPISODE_COUNT", "11",
            "LOG_INTERVAL", "100",
            "CHECKPOINT_INTERVAL", "1",
            "VIDEO_OPTION", "[]",
        ],
        model_dir=str(tmp_path),
    )
    trainer = registry.get_trainer("AVNavTrainer")(cfg)
    trainer.train()
    ckpts = [f for f in os.listdir(cfg.CHECKPOINT_FOLDER) if f.startswith("ckpt")]
    assert ckpts
    with TensorboardWriter(cfg.TENSORBOARD_DIR) as writer:
        means = trainer._eval_checkpoint(
            os.path.join(cfg.CHECKPOINT_FOLDER, sorted(ckpts)[-1]), writer, 0
        )
    # 11 distinct episodes over 4 slots: every id exactly once
    assert trainer._last_eval_episode_ids == list(range(11))
    assert "success" in means and "spl" in means
    assert "episode" not in means

"""Batched env behavior tests: movement, collision, rewards, measures,
auto-reset, oracle actions — checked against a step-by-step host reference
implementing the semantics of SoundSpacesSim.step (simulator.py:476-592),
AudioNavRLEnv.get_reward (environments.py:98-135), and the habitat measures."""

import numpy as np
import pytest

import jax.numpy as jnp

from avlen_tpu.core.episodes import pack_episodes
from avlen_tpu.sim.env import (
    MOVE_FORWARD,
    STOP,
    TURN_LEFT,
    TURN_RIGHT,
    BatchedAudioNavEnv,
    EnvConfig,
    QueryInfo,
    RewardConfig,
)
from avlen_tpu.sim.synthetic import make_episodes, make_scene_bank

RNG = np.random.RandomState(3)


@pytest.fixture(scope="module")
def setup():
    bank, tables = make_scene_bank(
        np.random.RandomState(0), num_scenes=2, side=6, rir_length=500,
        sampling_rate=4000, frame_res=32,
    )
    eps = make_episodes(np.random.RandomState(1), tables, 20, min_hops=2, max_hops=8)
    packed = pack_episodes(eps, num_envs=4)
    cfg = EnvConfig(max_episode_steps=30, grid_size=1.0)
    env = BatchedAudioNavEnv(bank, packed, cfg)
    return env, tables, eps, packed


def test_reset_shapes(setup):
    env, tables, eps, packed = setup
    state, obs = env.reset()
    assert obs["spectrogram"].shape[0] == 4
    assert obs["spectrogram"].shape[-1] == 2
    assert obs["depth"].shape == (4, 32, 32, 1)
    assert obs["pose"].shape == (4, 4)
    np.testing.assert_array_equal(np.asarray(obs["pose"]), 0.0)  # at origin
    assert bool(state.new_episode.all())


def test_turns_change_rotation_only(setup):
    env, *_ = setup
    state, _ = env.reset()
    n0, r0 = np.asarray(state.node), np.asarray(state.rot)
    state2, out = env.step(state, jnp.full((4,), TURN_LEFT))
    np.testing.assert_array_equal(np.asarray(state2.node), n0)
    np.testing.assert_array_equal(np.asarray(state2.rot), (r0 + 1) % 4)
    state3, _ = env.step(state2, jnp.full((4,), TURN_RIGHT))
    np.testing.assert_array_equal(np.asarray(state3.rot), r0)


def test_forward_follows_fwd_table_or_collides(setup):
    env, tables, *_ = setup
    state, _ = env.reset()
    scene, node, rot = (np.asarray(x) for x in (state.scene, state.node, state.rot))
    state2, out = env.step(state, jnp.full((4,), MOVE_FORWARD))
    fwd_next = np.asarray(env.bank.tables["fwd_next"])
    for i in range(4):
        orient = (3 - rot[i]) % 4
        target = fwd_next[scene[i], node[i], orient]
        if target < 0:
            assert np.asarray(state2.node)[i] == node[i]
            assert np.asarray(state2.collided)[i]
        else:
            assert np.asarray(state2.node)[i] == target
            assert not np.asarray(state2.collided)[i]


def test_oracle_rollout_reaches_goal_in_num_action_steps(setup):
    """Following oracle actions reaches the goal and matches episode num_action."""
    env, tables, eps, packed = setup
    state, obs = env.reset()
    order = packed["order"]
    for env_i in range(4):
        ep = eps[order[env_i, 0]]
        steps = 0
        st = state
        while True:
            a_all = np.asarray(env.oracle_action(st))
            action = a_all[env_i]
            acts = np.full((4,), TURN_LEFT)  # keep others busy without moving
            acts[env_i] = action
            st, out = env.step(st, jnp.asarray(acts))
            steps += 1
            if action == STOP:
                assert np.asarray(out.metrics["success"])[env_i] == 1.0
                assert np.asarray(out.metrics["spl"])[env_i] == pytest.approx(1.0, abs=1e-5)
                assert steps == ep.num_action
                break
            assert steps < 100
        state, obs = env.reset()


def test_reward_semantics(setup):
    env, *_ = setup
    state, _ = env.reset()
    prev_dtg = np.asarray(state.prev_dtg)
    # take oracle action; when it is FORWARD toward goal, distance reward = +1*scale
    acts = env.oracle_action(state)
    state2, out = env.step(state, acts)
    r = np.asarray(out.reward)
    dtg2 = np.asarray(env._dtg_goal(state2.scene, state2.node, state2.goal_node))
    a = np.asarray(acts)
    for i in range(4):
        if a[i] == MOVE_FORWARD:
            expect = -0.01 + (prev_dtg[i] - dtg2[i])
            assert r[i] == pytest.approx(expect, abs=1e-5)
        elif a[i] in (TURN_LEFT, TURN_RIGHT):
            assert r[i] == pytest.approx(-0.01, abs=1e-5)


def test_stop_at_goal_gives_success_reward(setup):
    env, tables, eps, packed = setup
    state, _ = env.reset()
    # drive env 0 to goal with oracle
    for _ in range(60):
        acts = np.array(env.oracle_action(state))
        if acts[0] == STOP:
            break
        acts[acts == STOP] = TURN_LEFT  # don't let others stop
        state, out = env.step(state, jnp.asarray(acts))
    state, out = env.step(state, jnp.asarray([STOP, TURN_LEFT, TURN_LEFT, TURN_LEFT]))
    assert np.asarray(out.reward)[0] >= 10.0 - 0.02
    assert np.asarray(out.done)[0]
    # auto-reset: new episode begins
    assert np.asarray(state.new_episode)[0]
    assert np.asarray(state.step_count)[0] == 0


def test_stop_away_from_goal_fails(setup):
    env, *_ = setup
    state, _ = env.reset()
    state, out = env.step(state, jnp.full((4,), STOP))
    assert np.asarray(out.done).all()
    np.testing.assert_array_equal(np.asarray(out.metrics["success"]), 0.0)


def test_timeout_ends_episode(setup):
    env, *_ = setup
    state, _ = env.reset()
    done_seen = np.zeros(4, bool)
    for _ in range(30):
        state, out = env.step(state, jnp.full((4,), TURN_LEFT))
        done_seen |= np.asarray(out.done)
    assert done_seen.all()


def test_query_reward_shaping():
    bank, tables = make_scene_bank(
        np.random.RandomState(0), num_scenes=1, side=5, rir_length=400, sampling_rate=4000,
        with_frames=False,
    )
    eps = make_episodes(np.random.RandomState(1), tables, 8, min_hops=2, max_hops=6)
    packed = pack_episodes(eps, num_envs=2)
    rw = RewardConfig(
        with_query_constraint=True,
        soft_query_reward=True,
        num_total_query=5,
        query_reward=-0.2,
        consecutive_constraint_reward=True,
    )
    cfg = EnvConfig(max_episode_steps=20, sensors=("spectrogram", "pose"), reward=rw)
    env = BatchedAudioNavEnv(bank, packed, cfg)
    state, _ = env.reset()
    q = QueryInfo(
        is_queried=jnp.asarray([True, False]),
        query_num=jnp.asarray([2, 0], jnp.int32),
        cons_reward=jnp.asarray([-0.25, 0.0], jnp.float32),
    )
    _, out0 = env.step(state, jnp.full((2,), TURN_LEFT))
    _, out1 = env.step(state, jnp.full((2,), TURN_LEFT), q)
    r0, r1 = np.asarray(out0.reward), np.asarray(out1.reward)
    soft = (2 / 5) * (np.exp(-5) + -0.2)
    assert r1[0] - r0[0] == pytest.approx(soft + -0.25, abs=1e-5)
    assert r1[1] == pytest.approx(r0[1], abs=1e-6)
    # over-budget query takes the hard penalty
    q2 = QueryInfo(
        is_queried=jnp.asarray([True, False]),
        query_num=jnp.asarray([6, 0], jnp.int32),
        cons_reward=jnp.zeros((2,), jnp.float32),
    )
    _, out2 = env.step(state, jnp.full((2,), TURN_LEFT), q2)
    hard = np.exp(-6.0) + -0.2
    assert np.asarray(out2.reward)[0] - r0[0] == pytest.approx(hard, abs=1e-5)


def test_spectrogram_matches_standalone_ops(setup):
    """Env audio path == direct ops call with the same RIR/sound/window."""
    from avlen_tpu.ops.audio import render_audiogoal

    env, *_ = setup
    state, obs = env.reset()
    az = (4 - state.rot) % 4
    rir = env.bank.rir.gather(state.scene, az, state.node, state.goal_node)
    audio, spec = render_audiogoal(
        env.bank.sounds_padded[state.sound],
        state.step_count % jnp.maximum(env.bank.sound_secs[state.sound], 1),
        rir,
        state.step_count <= state.duration,
        env.bank.sampling_rate,
        config=env.spec_config,
    )
    np.testing.assert_allclose(np.asarray(obs["spectrogram"]), np.asarray(spec), rtol=1e-5, atol=1e-5)


def test_pose_sensor_frame(setup):
    env, *_ = setup
    state, _ = env.reset()
    # forward success case: pose x grows along facing direction
    st = state
    for _ in range(3):
        st, out = env.step(st, jnp.full((4,), MOVE_FORWARD))
    pose = np.asarray(out.obs["pose"])
    node = np.asarray(st.node)
    start = np.asarray(st.start_node)
    moved = node != start
    # x' (first component) is distance along initial heading; heading unchanged
    assert np.allclose(pose[:, 2], 0.0)
    for i in range(4):
        if moved[i] and not np.asarray(st.new_episode)[i]:
            assert pose[i, 0] > 0

"""RL core tests: GAE vs naive loop, rollout collection, PPO update smoke,
and an end-to-end learning check on a trivially solvable task."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from avlen_tpu.core.episodes import pack_episodes
from avlen_tpu.models.policy import AudioNavBaselineNet, Policy
from avlen_tpu.rl.gae import compute_gae
from avlen_tpu.rl.ppo import PPOConfig, make_optimizer, ppo_update
from avlen_tpu.rl.rollout import CarryState, collect_rollout
from avlen_tpu.sim.env import BatchedAudioNavEnv, EnvConfig
from avlen_tpu.sim.synthetic import make_episodes, make_scene_bank


def test_gae_matches_reference_loop():
    """GAE vs the reference recurrence (common/rollout_storage.py:160-180)."""
    t, b = 9, 3
    rng = np.random.RandomState(0)
    rewards = rng.randn(t, b).astype(np.float32)
    values = rng.randn(t, b).astype(np.float32)
    bootstrap = rng.randn(b).astype(np.float32)
    masks = (rng.rand(t, b) > 0.2).astype(np.float32)
    gamma, tau = 0.99, 0.95

    adv, ret = compute_gae(
        jnp.asarray(rewards), jnp.asarray(values), jnp.asarray(bootstrap), jnp.asarray(masks), gamma, tau
    )

    v_ext = np.concatenate([values, bootstrap[None]], 0)
    gae = np.zeros(b, np.float32)
    want = np.zeros((t, b), np.float32)
    for i in reversed(range(t)):
        delta = rewards[i] + gamma * v_ext[i + 1] * masks[i] - v_ext[i]
        gae = delta + gamma * tau * masks[i] * gae
        want[i] = gae
    np.testing.assert_allclose(np.asarray(adv), want, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ret), want + values, rtol=1e-4, atol=1e-5)


@pytest.fixture(scope="module")
def small_world():
    bank, tables = make_scene_bank(
        np.random.RandomState(0), num_scenes=1, side=5, rir_length=400,
        sampling_rate=4000, frame_res=32,
    )
    eps = make_episodes(np.random.RandomState(1), tables, 16, min_hops=1, max_hops=4)
    packed = pack_episodes(eps, num_envs=4)
    cfg = EnvConfig(max_episode_steps=20, sensors=("spectrogram", "depth", "pose", "oracle_action"))
    env = BatchedAudioNavEnv(bank, packed, cfg)

    policy = Policy(
        net=AudioNavBaselineNet(hidden_size=64, spectrogram_hw=env.spec_config.out_shape[:2]),
        num_actions=4,
    )
    state, obs = env.reset()
    hidden = jnp.zeros((4, 64))
    key = jax.random.key(0)
    params = policy.init(key, obs, hidden, jnp.ones((4,)), key, method=Policy.act)
    carry = CarryState(state, obs, hidden, jnp.zeros((4,)), key)
    return env, policy, params, carry


def _make_fns(env, policy, num_steps):
    def collect(params, carry):
        def pol(obs, h, m, key):
            return policy.apply(params, obs, h, m, key, method=Policy.act)

        def val(obs, h, m):
            return policy.apply(params, obs, h, m, method=Policy.get_value)

        return collect_rollout(env._step_impl_noquery, pol, val, carry, num_steps)

    return jax.jit(collect)


def test_rollout_shapes_and_mask_alignment(small_world):
    env, policy, params, carry = small_world
    collect = _make_fns(env, policy, 12)
    carry2, batch = collect(params, carry)
    assert batch.actions.shape == (12, 4)
    assert batch.obs["spectrogram"].shape[0] == 12
    dones = np.asarray(batch.dones)
    masks = np.asarray(batch.masks)
    # mask at t+1 == 1 - done at t
    np.testing.assert_array_equal(masks[1:], 1.0 - dones[:-1])
    # initial masks were zeros (episode start)
    np.testing.assert_array_equal(masks[0], 0.0)


def test_ppo_update_runs_and_changes_params(small_world):
    env, policy, params, carry = small_world
    collect = _make_fns(env, policy, 8)
    carry, batch = collect(params, carry)
    cfg = PPOConfig(ppo_epoch=2, num_mini_batch=2, lr=1e-3)
    opt = make_optimizer(cfg)
    opt_state = opt.init(params)

    adv, ret = compute_gae(
        batch.rewards, batch.values, batch.bootstrap_value,
        1.0 - batch.dones.astype(jnp.float32),
    )

    def evaluate_actions(p, obs, h0, masks, actions):
        return policy.apply(p, obs, h0, masks, actions, method=Policy.evaluate_actions)

    new_params, _, stats = ppo_update(
        params, opt_state, batch, adv, ret, jax.random.key(1), evaluate_actions, opt, cfg
    )
    assert np.isfinite(float(stats["value_loss"]))
    assert np.isfinite(float(stats["action_loss"]))
    leaves_old = jax.tree.leaves(params)
    leaves_new = jax.tree.leaves(new_params)
    assert any(not np.allclose(a, b) for a, b in zip(leaves_old, leaves_new))

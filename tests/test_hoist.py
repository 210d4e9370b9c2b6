"""Constant-hoisting regression guards (utils/hoist.py): asset banks must
enter jitted programs as runtime arguments, never as embedded HLO literals —
a closure regression silently reinflates compile payloads by 100+ MB and
breaks the remote-compile path on large worlds."""

import numpy as np
import pytest

from avlen_tpu.core.episodes import pack_episodes
from avlen_tpu.sim.env import BatchedAudioNavEnv, EnvConfig, QueryInfo
from avlen_tpu.sim.scene import SceneBank, precompute_spectrogram_bank
from avlen_tpu.sim.synthetic import make_episodes, make_scene_bank
from avlen_tpu.utils.hoist import ConstBinder

# an env with a spectrogram bank + frames holds tens of MB of assets; the
# lowered step must stay orders of magnitude below that
MAX_HLO_BYTES = 3_000_000


def _build_env(num_envs=4):
    bank, tables = make_scene_bank(
        np.random.RandomState(0), num_scenes=1, side=5, rir_length=800,
        sampling_rate=4000, frame_res=32,
    )
    bank.spec_bank = precompute_spectrogram_bank(bank, batch=64)
    eps = make_episodes(np.random.RandomState(1), tables, 16, min_hops=1, max_hops=5)
    env = BatchedAudioNavEnv(
        bank, pack_episodes(eps, num_envs=num_envs),
        EnvConfig(max_episode_steps=10,
                  sensors=("spectrogram", "rgb", "depth", "pose", "category",
                           "category_belief", "location_belief")),
    )
    return env


def test_env_step_lowers_without_bank_literals():
    import jax.numpy as jnp

    env = _build_env()
    state, obs = env.reset()
    q = QueryInfo(
        is_queried=jnp.zeros((4,), bool),
        query_num=jnp.zeros((4,), jnp.int32),
        cons_reward=jnp.zeros((4,), jnp.float32),
    )
    txt = env._step.lower(env.binder.arrays, state, jnp.ones((4,), jnp.int32), q).as_text()
    assert len(txt) < MAX_HLO_BYTES, f"env step HLO is {len(txt)/1e6:.1f} MB — bank leaked into literals"
    txt2 = env._observe_jit.lower(env.binder.arrays, state).as_text()
    assert len(txt2) < MAX_HLO_BYTES


def test_scene_bank_is_a_pytree():
    import jax

    env = _build_env()
    leaves = jax.tree.leaves(env.bank)
    assert len(leaves) >= 5  # tables + sounds + frames + spec bank ...
    total = sum(np.asarray(l).nbytes for l in leaves)
    assert total > 1_000_000  # the assets really are in the pytree

    # round-trips through flatten/unflatten preserving structure
    flat, treedef = jax.tree.flatten(env.bank)
    bank2 = jax.tree.unflatten(treedef, flat)
    assert isinstance(bank2, SceneBank)
    assert bank2.sampling_rate == env.bank.sampling_rate


def test_binder_bind_scopes_values():
    binder = ConstBinder()
    binder.add("x", np.zeros((3,)))
    assert not binder.is_bound
    with binder.bind({"x": np.ones((3,))}):
        assert binder.is_bound
        np.testing.assert_array_equal(binder.get("x"), 1.0)
        with binder.bind({"x": np.full((3,), 2.0)}):
            np.testing.assert_array_equal(binder.get("x"), 2.0)
        np.testing.assert_array_equal(binder.get("x"), 1.0)  # nesting restores
    np.testing.assert_array_equal(binder.get("x"), 0.0)


def test_superstep_lowers_without_bank_literals():
    """The trainer-level superstep (collect+update) stays literal-free too."""
    import jax
    import jax.numpy as jnp

    from avlen_tpu.models.memory import init_memory
    from avlen_tpu.models.smt_policy import AudioNavSMTNet, SMTPolicy
    from avlen_tpu.parallel.ddppo import make_local_superstep
    from avlen_tpu.rl.gae import compute_gae
    from avlen_tpu.rl.ppo import PPOConfig, make_optimizer, ppo_update
    from avlen_tpu.rl.rollout_smt import SMTCarry, collect_rollout_smt, evaluate_sequence_smt
    from avlen_tpu.models.belief_predictor import init_belief_state

    env = _build_env()
    policy = SMTPolicy(net=AudioNavSMTNet(
        spectrogram_hw=env.spec_config.out_shape[:2], d_model=32, nhead=4,
        use_rgb=True, use_depth=True,
    ))
    state, obs = env.reset()
    mem = init_memory(4, 3, policy.net.feature_size)
    prev_a = jnp.zeros((4,), jnp.int32)
    key = jax.random.key(0)
    params = policy.init(key, obs, prev_a, mem.features, mem.valid, key, method=SMTPolicy.act)
    ppo_cfg = PPOConfig(ppo_epoch=1, num_mini_batch=1)
    optimizer = make_optimizer(ppo_cfg)
    opt_state = optimizer.init(params)

    def collect(ts, carry):
        params, _ = ts

        def act(o, pa, mf, mv, k):
            return policy.apply(params, o, pa, mf, mv, k, method=SMTPolicy.act)

        def val(o, pa, mf, mv):
            return policy.apply(params, o, pa, mf, mv, method=SMTPolicy.get_value)

        return collect_rollout_smt(env._step_impl_noquery, act, val, None, carry, 4)

    def update(ts, batch, key, grad_reduce):
        params, opt_state = ts
        adv, ret = compute_gae(
            batch.rewards, batch.values, batch.bootstrap_value,
            1.0 - batch.dones.astype(jnp.float32), ppo_cfg.gamma, ppo_cfg.tau,
        )

        def evaluate_actions(p, o, init_mem, masks, actions):
            def eval_step(oo, pa, mf, mv, a):
                return policy.apply(p, oo, pa, mf, mv, a, method=SMTPolicy.evaluate_step)

            return evaluate_sequence_smt(eval_step, o, init_mem, masks, actions)

        params, opt_state, stats = ppo_update(
            params, opt_state, batch, adv, ret, key, evaluate_actions, optimizer, ppo_cfg,
            grad_reduce=grad_reduce,
        )
        return (params, opt_state), stats

    step = make_local_superstep(collect, update, binder=env.binder)
    carry = SMTCarry(
        env_state=state, obs=obs, prev_action=prev_a,
        masks=jnp.zeros((4,), jnp.float32), memory=mem,
        belief=init_belief_state(4), key=jax.random.key(1),
    )
    # the superstep is wrapped by _stable_call (placement-committed args);
    # AOT lowering goes through its ._jitted handle, as bench.py does
    txt = step._jitted.lower((params, opt_state), carry, jax.random.key(2), env.binder.arrays).as_text()
    assert len(txt) < 25_000_000, f"superstep HLO {len(txt)/1e6:.1f} MB"
    # and it runs
    ts, carry2, batch, stats = step((params, opt_state), carry, jax.random.key(2), env.binder.arrays)
    assert np.isfinite(float(stats["value_loss"]))

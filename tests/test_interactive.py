"""Interactive (AVLEN) rollout semantics tests.

Uses stub policies with deterministic behavior to check the scanned query
bookkeeping against a step-by-step python reference implementing the
reference trainer's tracking logic (ppo_trainer.py:323-897): query triggers,
rl_mask, dialog windows (NUM_DIALOG_STEPS), masks_vln, consecutive-query
shaping, instruction gathers, and the action mux.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from avlen_tpu.core.episodes import pack_episodes
from avlen_tpu.models.memory import init_memory
from avlen_tpu.rl.rollout_interactive import (
    InteractiveCarry,
    InteractiveConfig,
    InteractiveFns,
    collect_rollout_interactive,
    init_query_track,
    sinusoidal_pe,
)
from avlen_tpu.models.belief_predictor import init_belief_state
from avlen_tpu.sim.env import BatchedAudioNavEnv, EnvConfig, RewardConfig
from avlen_tpu.sim.synthetic import make_episodes, make_scene_bank

B = 2
FEAT = 8
QC = 16
NUM_DIALOG_STEPS = 3
QUERY_STEPS = {2, 7}  # episode steps at which the stub option policy queries


@pytest.fixture(scope="module")
def world():
    bank, tables = make_scene_bank(
        np.random.RandomState(0), num_scenes=1, side=6, rir_length=200,
        sampling_rate=2000, with_frames=False,
    )
    eps = make_episodes(np.random.RandomState(1), tables, 8, min_hops=6, max_hops=20)
    packed = pack_episodes(eps, num_envs=B)
    cfg = EnvConfig(
        max_episode_steps=50,
        sensors=("spectrogram", "pose"),
        reward=RewardConfig(with_query_constraint=True, num_total_query=5, query_reward=-0.2),
    )
    env = BatchedAudioNavEnv(bank, packed, cfg)
    return env, tables


def make_stub_fns(env):
    """Stub policies: option queries when pose-t ∈ QUERY_STEPS; π_g turns
    left; π_l moves forward. Features encode markers for inspection."""

    def act_option(obs, pa, mf, mv, qs, lqi, key):
        t = obs["pose"][:, 3].astype(jnp.int32)
        want = jnp.zeros_like(t, bool)
        for q in QUERY_STEPS:
            want = want | (t == q)
        a = want.astype(jnp.int32)
        b = t.shape[0]
        x_mem = jnp.zeros((b, FEAT + QC))
        return a, jnp.zeros((b,)), jnp.zeros((b,)), x_mem, jnp.zeros((b, 2)), jnp.zeros((b, 2))

    def act_goal(obs, pa, mf, mv, key):
        b = obs["pose"].shape[0]
        # goal policy always TURN_LEFT; logits make top-2 gap small for env 0
        logits = jnp.tile(jnp.asarray([[0.0, 0.05, 1.0, 0.0]]), (b, 1))
        return (
            jnp.full((b,), 2, jnp.int32),
            jnp.zeros((b,)),
            jnp.zeros((b,)),
            jnp.zeros((b, FEAT)),
            logits,
        )

    def act_dialog(obs, pa, mf, mv, smf, smv, dialog, step, key):
        b = obs["pose"].shape[0]
        return (
            jnp.full((b,), 1, jnp.int32),
            jnp.zeros((b,)),
            jnp.zeros((b,)),
            jnp.zeros((b, FEAT)),
            jnp.zeros((b, FEAT)),  # x_att_dialog → vln state memory entries
            jnp.zeros((b, 4)),
        )

    def value_option(obs, pa, mf, mv, qs, lqi):
        return jnp.zeros((obs["pose"].shape[0],))

    return InteractiveFns(
        act_option=act_option,
        act_goal=act_goal,
        act_dialog=act_dialog,
        value_option=value_option,
        oracle_action=env.oracle_action,
        env_step=env._step_impl,
        belief_fn=None,
    )


def collect(env, tables, cfg, t_steps=14):
    fns = make_stub_fns(env)
    n = tables[0].num_nodes
    instr_bank = jnp.arange(1 * n * 4 * n).reshape(1, n, 4, n, 1).astype(jnp.int32)
    instr_bank = jnp.tile(instr_bank, (1, 1, 1, 1, 77))
    pe = jnp.asarray(sinusoidal_pe(151, QC))
    state, obs = env.reset()
    carry = InteractiveCarry(
        env_state=state, obs=obs,
        prev_action=jnp.zeros((B,), jnp.int32),
        masks=jnp.zeros((B,), jnp.float32),
        masks_vln=jnp.zeros((B,), jnp.float32),
        mem_goal=init_memory(B, 4, FEAT),
        mem_option=init_memory(B, 4, FEAT + QC),
        mem_vln=init_memory(B, NUM_DIALOG_STEPS, FEAT),
        mem_vln_dialog=init_memory(B, NUM_DIALOG_STEPS, FEAT),
        belief=init_belief_state(B),
        track=init_query_track(B),
        key=jax.random.key(0),
    )
    run = jax.jit(lambda c: collect_rollout_interactive(fns, c, instr_bank, pe, cfg, t_steps))
    return run(carry)


def test_query_windows_and_masks(world):
    env, tables = world
    cfg = InteractiveConfig(num_dialog_steps=NUM_DIALOG_STEPS, oracle_when_queried=False)
    carry, traj = collect(env, tables, cfg)

    queried = np.asarray(traj["queried"])  # (T, B)
    rl_mask = np.asarray(traj["rl_mask"])
    masks_vln = np.asarray(traj["masks_vln"])
    agent_step = np.asarray(traj["agent_step"])
    dones = np.asarray(traj["dones"])

    for b in range(B):
        # no early episode end in the first 14 steps given min_hops=6
        if dones[:10, b].any():
            continue
        # steps 0-1: not queried, rl_mask 1
        assert not queried[0, b] and not queried[1, b]
        assert rl_mask[0, b] == 1 and rl_mask[1, b] == 1
        # query at step 2 → window covers steps 2,3,4; rl_mask 1 only at start
        assert queried[2, b] and queried[3, b] and queried[4, b]
        assert rl_mask[2, b] == 1 and rl_mask[3, b] == 0 and rl_mask[4, b] == 0
        assert not queried[5, b]
        assert rl_mask[5, b] == 1
        # agent dialog-window step counts 0,1,2 within the window
        np.testing.assert_array_equal(agent_step[2:5, b], [0, 1, 2])
        # masks_vln: 0 at episode start, persists through the window, and
        # resets on the step AFTER the window closes (reference sets
        # masks_vln=0 when the window completes, ppo_trainer.py:765-767)
        assert masks_vln[0, b] == 0
        assert masks_vln[2, b] == 1 and masks_vln[3, b] == 1 and masks_vln[4, b] == 1
        assert masks_vln[5, b] == 0  # reset after the window closed
        assert masks_vln[6, b] == 1
        # second query at step 7
        assert queried[7, b] and queried[8, b] and queried[9, b]
        assert rl_mask[7, b] == 1


def test_instruction_gather_and_dialog_persistence(world):
    env, tables = world
    cfg = InteractiveConfig(num_dialog_steps=NUM_DIALOG_STEPS)
    carry, traj = collect(env, tables, cfg)
    dialog = np.asarray(traj["dialog"])  # (T, B, 77)
    dones = np.asarray(traj["dones"])
    for b in range(B):
        if dones[:6, b].any():
            continue
        assert (dialog[1, b] == 0).all()  # before query: empty
        q = dialog[2, b]
        assert (q != 0).any()
        # same tokens persist through the window
        np.testing.assert_array_equal(dialog[3, b], q)
        np.testing.assert_array_equal(dialog[4, b], q)
        assert (dialog[5, b] == 0).all()  # cleared after window


def test_action_mux_oracle_vs_dialog(world):
    env, tables = world
    # ORACLE_WHEN_QUERIED=True: during windows (oracle not STOP) executed
    # action == oracle action
    cfg = InteractiveConfig(num_dialog_steps=NUM_DIALOG_STEPS, oracle_when_queried=True)
    carry, traj = collect(env, tables, cfg)
    actions = np.asarray(traj["actions"])
    o_action = np.asarray(traj["o_action"])
    queried = np.asarray(traj["queried"])
    dones = np.asarray(traj["dones"])
    for b in range(B):
        if dones[:6, b].any():
            continue
        for t in (2, 3, 4):
            if o_action[t, b] != 0:
                assert actions[t, b] == o_action[t, b]
        # non-queried: goal policy (TURN_LEFT=2)
        assert actions[0, b] == 2 and actions[1, b] == 2

    # ORACLE_WHEN_QUERIED=False: dialog policy (FWD=1) unless oracle is STOP
    cfg2 = InteractiveConfig(num_dialog_steps=NUM_DIALOG_STEPS, oracle_when_queried=False)
    carry2, traj2 = collect(env, tables, cfg2)
    actions2 = np.asarray(traj2["actions"])
    o2 = np.asarray(traj2["o_action"])
    q2 = np.asarray(traj2["queried"])
    d2 = np.asarray(traj2["dones"])
    for b in range(B):
        if d2[:6, b].any():
            continue
        for t in (2, 3, 4):
            expect = o2[t, b] if o2[t, b] == 0 else 1
            assert actions2[t, b] == expect


def test_query_state_encodings(world):
    env, tables = world
    cfg = InteractiveConfig(num_dialog_steps=NUM_DIALOG_STEPS)
    carry, traj = collect(env, tables, cfg)
    pe = sinusoidal_pe(151, QC)
    qs = np.asarray(traj["query_state"])
    qcount = np.asarray(traj["query_count"])
    dones = np.asarray(traj["dones"])
    for b in range(B):
        if dones[:10, b].any():
            continue
        # before first query, query_state == pe[0]; after, pe[count]
        np.testing.assert_allclose(qs[1, b], pe[0], atol=1e-6)
        np.testing.assert_allclose(qs[3, b], pe[1], atol=1e-6)
        assert qcount[2, b] == 1 and qcount[7, b] == 2


def test_ucnt_gt_from_goal_prob_gap(world):
    env, tables = world
    cfg = InteractiveConfig(num_dialog_steps=NUM_DIALOG_STEPS)
    carry, traj = collect(env, tables, cfg)
    # stub goal logits: top-2 gap = softmax(1.0) vs softmax(0.05) ≈ 0.37 > 0.1
    ucnt = np.asarray(traj["ucnt_gt"])
    assert (ucnt == 0).all()

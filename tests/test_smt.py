"""SMT stack tests: relative pose math, memory ring buffer, SMT encoder,
collection/evaluation consistency (the ring-replay must reproduce
collection-time memory views), and belief predictor EMA semantics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from avlen_tpu.models.belief_predictor import (
    BeliefState,
    base_to_odom,
    init_belief_state,
    odom_to_base,
)
from avlen_tpu.models.memory import init_memory, insert, reset_where
from avlen_tpu.models.smt import SMTStateEncoder, compute_relative_pose, format_pose
from avlen_tpu.models.smt_policy import AudioNavSMTNet, SMTPolicy
from avlen_tpu.rl.rollout_smt import evaluate_sequence_smt


def test_relative_pose_identity():
    pose = jnp.asarray([[1.0, 2.0, 0.5]])
    rel = compute_relative_pose(pose, pose)
    np.testing.assert_allclose(np.asarray(rel), 0.0, atol=1e-6)


def test_relative_pose_translation():
    # agent at origin facing x (heading 0); target 2m ahead, 1m to the right
    # convention: heading measured from x to -y (reference smt_state_encoder.py:245)
    a = jnp.asarray([[0.0, 0.0, 0.0]])
    b = jnp.asarray([[2.0, 1.0, 0.0]])
    rel = np.asarray(compute_relative_pose(a, b))[0]
    np.testing.assert_allclose(rel, [2.0, 1.0, 0.0], atol=1e-6)


def test_relative_pose_rotation_invariance():
    """Rotating both poses by the same global angle leaves the relative pose
    unchanged."""
    rng = np.random.RandomState(0)
    a = rng.randn(3).astype(np.float32)
    b = rng.randn(3).astype(np.float32)
    base = np.asarray(compute_relative_pose(jnp.asarray(a)[None], jnp.asarray(b)[None]))[0]
    # global rotation: the reference's heading is from x to -y, i.e. standard
    # angle is -heading. Rotate positions by phi and add -phi to headings.
    phi = 0.7
    rot = np.array([[np.cos(phi), -np.sin(phi)], [np.sin(phi), np.cos(phi)]])
    a2 = np.concatenate([rot @ a[:2], [a[2] - phi]]).astype(np.float32)
    b2 = np.concatenate([rot @ b[:2], [b[2] - phi]]).astype(np.float32)
    got = np.asarray(compute_relative_pose(jnp.asarray(a2)[None], jnp.asarray(b2)[None]))[0]
    np.testing.assert_allclose(got, base, atol=1e-5)


def test_format_pose():
    pose = jnp.asarray([[1.0, -2.0, np.pi / 2, 3.0]])
    f = np.asarray(format_pose(pose))[0]
    np.testing.assert_allclose(f, [1.0, -2.0, 0.0, 1.0, np.exp(-3.0)], atol=1e-6)


def test_memory_ring_insert_and_reset():
    mem = init_memory(2, 3, 4)
    f1 = jnp.ones((2, 4))
    mem = insert(mem, f1)
    assert np.asarray(mem.valid)[0, 0] == 1.0
    assert np.asarray(mem.idx)[0] == 1
    for _ in range(3):
        mem = insert(mem, f1 * 2)
    # ring wrapped: all slots valid, idx back to 1
    np.testing.assert_array_equal(np.asarray(mem.valid), 1.0)
    assert np.asarray(mem.idx)[0] == 1
    mem = reset_where(mem, jnp.asarray([True, False]))
    assert np.asarray(mem.valid)[0].sum() == 0
    assert np.asarray(mem.valid)[1].sum() == 3
    assert np.asarray(mem.idx)[0] == 0


def test_smt_encoder_masks_memory():
    """Invalid memory entries must not affect the output."""
    b, m, f, d = 2, 4, 12, 32
    enc = SMTStateEncoder(input_size=f, d_model=d, nhead=4, pose_indices=(8, 12))
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, f).astype(np.float32))
    memory = jnp.asarray(rng.randn(b, m, f).astype(np.float32))
    masks = jnp.zeros((b, m))
    params = enc.init(jax.random.key(0), x, memory, masks)

    out1 = enc.apply(params, x, memory, masks)
    out2 = enc.apply(params, x, jnp.asarray(rng.randn(b, m, f), jnp.float32), masks)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)

    # with valid entries, changing memory changes the output
    masks1 = jnp.ones((b, m))
    out3 = enc.apply(params, x, memory, masks1)
    out4 = enc.apply(params, x, memory * 2.0, masks1)
    assert not np.allclose(np.asarray(out3), np.asarray(out4), atol=1e-5)


def test_smt_pretraining_ignores_memory():
    b, m, f, d = 2, 4, 12, 32
    enc = SMTStateEncoder(input_size=f, d_model=d, nhead=4, pretraining=True)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, f).astype(np.float32))
    memory = jnp.asarray(rng.randn(b, m, f).astype(np.float32))
    params = enc.init(jax.random.key(0), x, memory, jnp.ones((b, m)))
    o1 = enc.apply(params, x, memory, jnp.ones((b, m)))
    o2 = enc.apply(params, x, memory * 3.0, jnp.ones((b, m)))
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-5)


def _tiny_smt_policy(b=2):
    net = AudioNavSMTNet(
        spectrogram_hw=(16, 4), d_model=32, nhead=4, use_rgb=False, use_depth=True,
        use_belief_as_goal=True,
    )
    policy = SMTPolicy(net=net)
    obs = {
        "spectrogram": jnp.zeros((b, 16, 4, 2)),
        "depth": jnp.zeros((b, 24, 24, 1)),
        "pose": jnp.zeros((b, 4)),
        "category_belief": jnp.zeros((b, 21)),
        "location_belief": jnp.zeros((b, 2)),
    }
    mem = init_memory(b, 5, net.feature_size)
    key = jax.random.key(0)
    params = policy.init(key, obs, jnp.zeros((b,), jnp.int32), mem.features, mem.valid, key, method=SMTPolicy.act)
    return policy, params, obs, mem


def test_smt_policy_act_shapes():
    policy, params, obs, mem = _tiny_smt_policy()
    key = jax.random.key(1)
    a, lp, v, x, logits = policy.apply(
        params, obs, jnp.zeros((2,), jnp.int32), mem.features, mem.valid, key, method=SMTPolicy.act
    )
    assert a.shape == (2,)
    assert x.shape == (2, policy.net.feature_size)
    assert logits.shape == (2, 4)


def test_evaluate_sequence_replays_collection_views():
    """Stepping manually (insert into ring) and evaluate_sequence_smt must
    produce identical log-probs — the num_copies-free replay is exact."""
    policy, params, obs0, mem0 = _tiny_smt_policy()
    b, t = 2, 6
    rng = np.random.RandomState(0)
    key = jax.random.key(2)

    obs_seq = {
        "spectrogram": jnp.asarray(rng.randn(t, b, 16, 4, 2).astype(np.float32)),
        "depth": jnp.asarray(rng.rand(t, b, 24, 24, 1).astype(np.float32)),
        "pose": jnp.asarray(rng.randn(t, b, 4).astype(np.float32)),
        "category_belief": jnp.zeros((t, b, 21)),
        "location_belief": jnp.zeros((t, b, 2)),
    }
    masks = np.ones((t, b), np.float32)
    masks[0] = 0.0
    masks[3, 1] = 0.0  # episode boundary mid-sequence for env 1
    actions = jnp.asarray(rng.randint(0, 4, (t, b)).astype(np.int32))
    prev_actions = jnp.concatenate([jnp.zeros((1, b), jnp.int32), actions[:-1]], 0)

    # manual collection-time pass
    mem = mem0
    lps, feats, pas = [], [], []
    for i in range(t):
        new_ep = jnp.asarray(masks[i] == 0)
        mem = reset_where(mem, new_ep)
        pa = jnp.where(new_ep, 0, prev_actions[i])
        obs_t = {k: v[i] for k, v in obs_seq.items()}
        v_, lp, ent, logits, x = policy.apply(
            params, obs_t, pa, mem.features, mem.valid, actions[i], method=SMTPolicy.evaluate_step
        )
        mem = insert(mem, x)
        lps.append(np.asarray(lp))
        feats.append(np.asarray(x))
        pas.append(np.asarray(pa))

    obs_with_extras = dict(obs_seq)
    obs_with_extras["__prev_action"] = jnp.asarray(np.stack(pas))
    obs_with_extras["__feature"] = jnp.asarray(np.stack(feats))

    def eval_step(o, pa, mf, mv, a):
        return policy.apply(params, o, pa, mf, mv, a, method=SMTPolicy.evaluate_step)

    v, lp, ent, logits = evaluate_sequence_smt(
        eval_step, obs_with_extras, mem0, jnp.asarray(masks), actions
    )
    np.testing.assert_allclose(np.asarray(lp), np.stack(lps), rtol=1e-5, atol=1e-5)


def test_belief_frame_transforms_roundtrip():
    rng = np.random.RandomState(0)
    pg = jnp.asarray(rng.randn(4, 2).astype(np.float32))
    pose = jnp.asarray(rng.randn(4, 4).astype(np.float32))
    odom = base_to_odom(pg, pose)
    back = odom_to_base(odom, pose)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pg), rtol=1e-4, atol=1e-4)

"""Batched (T-parallel) SMT PPO re-evaluation vs the sequential scan.

The batched path (rl/rollout_smt.py:reconstruct_memory_views +
evaluate_sequence_smt_batched) must reproduce the scan's per-step ring
memory views exactly and its (values, log_probs, entropy, logits) outputs
numerically — it is the same math on MXU-sized batches.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avlen_tpu.models.memory import SMTMemory, init_memory, insert, reset_where
from avlen_tpu.rl.rollout_smt import (
    evaluate_sequence_smt,
    evaluate_sequence_smt_batched,
    reconstruct_memory_views,
)


def _random_initial_memory(rng, b, m, f, warm_steps):
    """A realistic pre-rollout ring: insert `warm_steps[i]` features into
    env i's fresh ring (wraps when > m)."""
    mem = init_memory(b, m, f)
    for s in range(max(warm_steps)):
        feat = jnp.asarray(rng.randn(b, f).astype(np.float32))
        write = jnp.asarray([s < w for w in warm_steps])
        new = insert(mem, feat)
        mem = SMTMemory(
            features=jnp.where(write[:, None, None], new.features, mem.features),
            valid=jnp.where(write[:, None], new.valid, mem.valid),
            idx=jnp.where(write, new.idx, mem.idx),
        )
    return mem


@pytest.mark.parametrize("m,t_len,warm", [(4, 11, (0, 2, 4, 7)), (6, 13, (6, 1, 0, 3))])
def test_memory_view_reconstruction_exact(m, t_len, warm):
    """content_idx/valid gathers rebuild the scan's memory views bit-for-bit
    across resets, ring wraps, and live pre-rollout rings."""
    rng = np.random.RandomState(0)
    b, f = len(warm), 5
    mem0 = _random_initial_memory(rng, b, m, f, warm)
    feats = jnp.asarray(rng.randn(t_len, b, f).astype(np.float32))
    masks = jnp.asarray((rng.rand(t_len, b) > 0.25).astype(np.float32))

    # sequential ground truth: the view evaluate_step saw at each t
    views = []
    mem = mem0
    for t in range(t_len):
        mem = reset_where(mem, masks[t] == 0)
        views.append((mem.features, mem.valid))
        mem = insert(mem, feats[t])
    want_feats = jnp.stack([v[0] for v in views])  # (T, B, M, F)
    want_valid = jnp.stack([v[1] for v in views])

    content_idx, valid = reconstruct_memory_views(mem0, feats, masks)
    pool = jnp.concatenate(
        [feats, jnp.swapaxes(mem0.features, 0, 1), jnp.zeros((1, b, f))], axis=0
    )
    got_feats = jnp.swapaxes(pool, 0, 1)[  # (B, T+M+1, F)
        jnp.arange(b)[None, :, None], content_idx
    ]
    np.testing.assert_array_equal(np.asarray(valid), np.asarray(want_valid))
    np.testing.assert_array_equal(np.asarray(got_feats), np.asarray(want_feats))


def test_batched_eval_matches_scan_on_smt_policy():
    """evaluate_sequence_smt_batched == evaluate_sequence_smt on a real
    SMTPolicy (values/log_probs/entropy/logits allclose, grads allclose)."""
    from avlen_tpu.models.smt_policy import AudioNavSMTNet, SMTPolicy

    rng = np.random.RandomState(1)
    b, t_len, m = 3, 10, 4
    net = AudioNavSMTNet(
        spectrogram_hw=(9, 6), d_model=32, nhead=2, use_rgb=False, use_depth=False,
    )
    policy = SMTPolicy(net=net)
    f = net.feature_size

    obs = {
        "spectrogram": jnp.asarray(rng.randn(t_len, b, 9, 6, 2).astype(np.float32)),
        "pose": jnp.asarray(rng.randn(t_len, b, 4).astype(np.float32)),
        "category_belief": jnp.asarray(rng.rand(t_len, b, 21).astype(np.float32)),
        "location_belief": jnp.asarray(rng.randn(t_len, b, 2).astype(np.float32)),
        "__prev_action": jnp.asarray(rng.randint(0, 4, (t_len, b)), dtype=jnp.int32),
        "__feature": jnp.asarray(rng.randn(t_len, b, f).astype(np.float32)),
    }
    masks = jnp.asarray((rng.rand(t_len, b) > 0.3).astype(np.float32))
    actions = jnp.asarray(rng.randint(0, 4, (t_len, b)), dtype=jnp.int32)
    mem0 = _random_initial_memory(rng, b, m, f, (2, 0, 5))

    obs0 = jax.tree.map(lambda x: x[0], obs)
    params = policy.init(
        jax.random.key(0),
        {k: v for k, v in obs0.items() if not k.startswith("__")},
        obs0["__prev_action"], mem0.features, mem0.valid, actions[0],
        method=SMTPolicy.evaluate_step,
    )

    def run(eval_fn, p):
        def eval_step(o, pa, mf, mv, a):
            return policy.apply(p, o, pa, mf, mv, a, method=SMTPolicy.evaluate_step)

        return eval_fn(eval_step, obs, mem0, masks, actions)

    v_s, lp_s, ent_s, lg_s = jax.jit(lambda p: run(evaluate_sequence_smt, p))(params)
    v_b, lp_b, ent_b, lg_b = jax.jit(
        lambda p: run(lambda *a: evaluate_sequence_smt_batched(*a, chunk=5), p)
    )(params)

    np.testing.assert_allclose(np.asarray(v_b), np.asarray(v_s), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(lp_b), np.asarray(lp_s), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(ent_b), np.asarray(ent_s), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(lg_b), np.asarray(lg_s), rtol=2e-5, atol=2e-4)

    # gradients agree too (the PPO loss differentiates through evaluate)
    def loss(p, eval_fn):
        v, lp, ent, _ = run(eval_fn, p)
        return (v.sum() + lp.sum()) * 1e-2 + ent.mean()

    g_s = jax.grad(lambda p: loss(p, evaluate_sequence_smt))(params)
    g_b = jax.grad(
        lambda p: loss(p, lambda *a: evaluate_sequence_smt_batched(*a, chunk=5))
    )(params)
    for ga, gb in zip(jax.tree.leaves(g_s), jax.tree.leaves(g_b)):
        np.testing.assert_allclose(np.asarray(gb), np.asarray(ga), rtol=5e-4, atol=5e-5)


def test_batched_option_and_dialog_eval_match_scan():
    """The interactive π_q / π_l batched evaluators reproduce their scans
    (fake deterministic policies that mix every input incl. memory views)."""
    from avlen_tpu.rl.ppo_interactive import (
        evaluate_dialog_sequence,
        evaluate_dialog_sequence_batched,
        evaluate_option_sequence,
        evaluate_option_sequence_batched,
    )

    rng = np.random.RandomState(2)
    t_len, b, m, f = 12, 3, 4, 5
    obs = {
        "pose": jnp.asarray(rng.randn(t_len, b, 4).astype(np.float32)),
        "__prev_action": jnp.asarray(rng.randint(0, 4, (t_len, b)), dtype=jnp.int32),
    }
    masks = jnp.asarray((rng.rand(t_len, b) > 0.3).astype(np.float32))
    feat = jnp.asarray(rng.randn(t_len, b, f).astype(np.float32))
    qs = jnp.asarray(rng.randn(t_len, b, 8).astype(np.float32))
    lqi = jnp.asarray(rng.randn(t_len, b, 8).astype(np.float32))
    actions = jnp.asarray(rng.randint(0, 4, (t_len, b)), dtype=jnp.int32)
    mem0 = _random_initial_memory(rng, b, m, f, (2, 0, 5))

    def opt_eval(o, pa, mf, mv, q, l, a):
        mix = (mf * mv[..., None]).sum((1, 2)) + o["pose"].sum(-1) + q.sum(-1)
        v = mix + pa
        lp = mix * 0.1 + l.sum(-1)
        ent = mix * 0.01 + a
        unct = jnp.stack([mix, -mix], -1)
        return v, lp, ent, None, unct, None

    want = evaluate_option_sequence(opt_eval, obs, feat, qs, lqi, masks, actions, mem0)
    got = evaluate_option_sequence_batched(
        opt_eval, obs, feat, qs, lqi, masks, actions, mem0, chunk=4
    )
    for w, g in zip(want, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=1e-5, atol=1e-5)

    # dialog: two ring memories reset by masks_vln
    feat2 = jnp.asarray(rng.randn(t_len, b, f).astype(np.float32))
    dialog = jnp.asarray(rng.randint(0, 9, (t_len, b, 7)), dtype=jnp.int32)
    astep = jnp.asarray(rng.randint(0, 3, (t_len, b)), dtype=jnp.int32)
    mem0b = _random_initial_memory(rng, b, m, f, (1, 3, 0))

    def dlg_eval(o, pa, mf, mv, smf, smv, d, st, a):
        mix = (mf * mv[..., None]).sum((1, 2)) - (smf * smv[..., None]).sum((1, 2))
        logits = jnp.stack([mix, mix + d.sum(-1), mix * 0.5 + st, mix + a + pa], -1)
        return None, None, None, logits, None, None

    want_lg = evaluate_dialog_sequence(
        dlg_eval, obs, feat, feat2, dialog, astep, masks, actions, mem0, mem0b
    )
    got_lg = evaluate_dialog_sequence_batched(
        dlg_eval, obs, feat, feat2, dialog, astep, masks, actions, mem0, mem0b, chunk=6
    )
    np.testing.assert_allclose(np.asarray(got_lg), np.asarray(want_lg), rtol=1e-5, atol=1e-5)


def test_batched_eval_chunk_not_dividing_t():
    """chunk falls back to the largest divisor of T (static shapes)."""
    from avlen_tpu.rl.rollout_smt import evaluate_sequence_smt_batched as be

    calls = []

    def eval_step(o, pa, mf, mv, a):
        calls.append(pa.shape[0])
        z = jnp.zeros(pa.shape[0])
        return z, z, z, jnp.zeros((pa.shape[0], 4)), None

    t_len, b, m, f = 9, 2, 3, 4
    obs = {
        "__prev_action": jnp.zeros((t_len, b), jnp.int32),
        "__feature": jnp.zeros((t_len, b, f)),
        "pose": jnp.zeros((t_len, b, 4)),
    }
    v, lp, ent, lg = be(
        eval_step, obs, init_memory(b, m, f), jnp.ones((t_len, b)),
        jnp.zeros((t_len, b), jnp.int32), chunk=6,
    )
    assert v.shape == (t_len, b) and lg.shape == (t_len, b, 4)
    assert calls[0] == 3 * b  # 9 % 6 != 0 → chunk 3


def test_frozen_eval_matches_recompute_and_freezes_encoders():
    """evaluate_step_frozen (SCENE_MEMORY_TRANSFORMER.freeze_encoders) must
    reproduce evaluate_step exactly when __feature holds the true tower
    outputs, and its gradients must not touch the frozen towers — the
    reference's requires_grad=False split (policy.py:646-656)."""
    from avlen_tpu.models.smt_policy import AudioNavSMTNet, SMTPolicy

    rng = np.random.RandomState(7)
    b, t_len, m = 3, 8, 4
    net = AudioNavSMTNet(
        spectrogram_hw=(9, 6), d_model=32, nhead=2, use_rgb=False, use_depth=False,
    )
    policy = SMTPolicy(net=net)
    f = net.feature_size

    obs = {
        "spectrogram": jnp.asarray(rng.randn(t_len, b, 9, 6, 2).astype(np.float32)),
        "pose": jnp.asarray(rng.randn(t_len, b, 4).astype(np.float32)),
        "category_belief": jnp.asarray(rng.rand(t_len, b, 21).astype(np.float32)),
        "location_belief": jnp.asarray(rng.randn(t_len, b, 2).astype(np.float32)),
        "__prev_action": jnp.asarray(rng.randint(0, 4, (t_len, b)), dtype=jnp.int32),
    }
    masks = jnp.asarray((rng.rand(t_len, b) > 0.3).astype(np.float32))
    actions = jnp.asarray(rng.randint(0, 4, (t_len, b)), dtype=jnp.int32)
    mem0 = _random_initial_memory(rng, b, m, f, (2, 0, 5))

    obs0 = jax.tree.map(lambda x: x[0], obs)
    params = policy.init(
        jax.random.key(0),
        {k: v for k, v in obs0.items() if not k.startswith("__")},
        obs0["__prev_action"], mem0.features, mem0.valid, actions[0],
        method=SMTPolicy.evaluate_step,
    )

    # the TRUE tower outputs as the stored rollout features
    flat = lambda x: x.reshape((t_len * b,) + x.shape[2:])
    feats = policy.apply(
        params,
        {k: flat(v) for k, v in obs.items() if not k.startswith("__")},
        flat(obs["__prev_action"]),
        method=lambda self, o, pa: self.net.get_features(o, pa),
    )
    obs["__feature"] = feats.reshape(t_len, b, f)

    def run(p, method):
        def eval_step(o, pa, mf, mv, a):
            return policy.apply(p, o, pa, mf, mv, a, method=method)

        return evaluate_sequence_smt_batched(
            eval_step, obs, mem0, masks, actions, chunk=4
        )

    v_r, lp_r, ent_r, lg_r = jax.jit(lambda p: run(p, SMTPolicy.evaluate_step))(params)
    v_f, lp_f, ent_f, lg_f = jax.jit(
        lambda p: run(p, SMTPolicy.evaluate_step_frozen)
    )(params)
    np.testing.assert_allclose(np.asarray(v_f), np.asarray(v_r), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(lp_f), np.asarray(lp_r), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(ent_f), np.asarray(ent_r), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(lg_f), np.asarray(lg_r), rtol=2e-5, atol=2e-4)

    def loss(p):
        v, lp, ent, _ = run(p, SMTPolicy.evaluate_step_frozen)
        return (v.sum() + lp.sum()) * 1e-2 + ent.mean()

    grads = jax.grad(loss)(params)["params"]
    frozen_leaves = jax.tree.leaves(
        {k: v for k, v in grads["net"].items()
         if k.startswith(("goal_encoder", "action_encoder", "visual_encoder"))}
    )
    assert frozen_leaves, "expected encoder grad entries"
    for g in frozen_leaves:
        np.testing.assert_array_equal(np.asarray(g), 0.0)
    live = jax.tree.leaves(grads["net"]["smt"]) + jax.tree.leaves(grads["action_head"])
    assert any(np.abs(np.asarray(g)).max() > 0 for g in live)

"""π_q PPO update and π_l supervised update smoke tests with stub evaluate
closures (loss semantics of savi/ppo/ppo.py:99-289)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from avlen_tpu.models.memory import init_memory
from avlen_tpu.rl.gae import compute_gae
from avlen_tpu.rl.ppo import PPOConfig, make_optimizer
from avlen_tpu.rl.ppo_interactive import dialog_supervised_update, ppo_update_interactive

T, B, F, QC, D = 6, 4, 8, 16, 12


def _traj(rng):
    params = {"w": jnp.asarray(rng.randn(F + QC, 2).astype(np.float32)),
              "v": jnp.asarray(rng.randn(F + QC).astype(np.float32)),
              "u": jnp.asarray(rng.randn(F + QC, 2).astype(np.float32))}
    obs = {
        "x": jnp.asarray(rng.randn(T, B, F).astype(np.float32)),
        "__prev_action": jnp.zeros((T, B), jnp.int32),
    }
    traj = {
        "obs": obs,
        "feat_option": jnp.asarray(rng.randn(T, B, F + QC).astype(np.float32)),
        "query_state": jnp.asarray(rng.randn(T, B, QC).astype(np.float32)),
        "last_query_info": jnp.asarray(rng.randn(T, B, QC).astype(np.float32)),
        "masks": jnp.ones((T, B)).at[0].set(0.0),
        "actions_option": jnp.asarray(rng.randint(0, 2, (T, B)).astype(np.int32)),
        "log_probs_option": jnp.asarray(-np.abs(rng.randn(T, B)).astype(np.float32)),
        "values_option": jnp.asarray(rng.randn(T, B).astype(np.float32)),
        "rewards": jnp.asarray(rng.randn(T, B).astype(np.float32)),
        "dones": jnp.zeros((T, B), bool),
        "bootstrap_value": jnp.zeros((B,)),
        "rl_mask": jnp.asarray((rng.rand(T, B) > 0.3).astype(np.float32)),
        "ucnt_gt": jnp.asarray(rng.randint(0, 2, (T, B)).astype(np.int32)),
        "initial_memories": (
            init_memory(B, 4, F),
            init_memory(B, 4, F + QC),
            init_memory(B, 3, F),
            init_memory(B, 3, D),
        ),
    }
    return params, traj


def test_ppo_update_interactive_runs():
    rng = np.random.RandomState(0)
    params, traj = _traj(rng)

    def evaluate_step(p, obs, pa, mf, mv, qs, lqi, actions):
        feat = jnp.concatenate([obs["x"], qs], -1)
        logits = feat @ p["w"]
        v = feat @ p["v"]
        unct = feat @ p["u"]
        logp = jax.nn.log_softmax(logits)
        lp = jnp.take_along_axis(logp, actions[:, None], 1)[:, 0]
        ent = -(jnp.exp(logp) * logp).sum(-1)
        return v, lp, ent, logits, unct, feat

    cfg = PPOConfig(ppo_epoch=2, num_mini_batch=2, lr=1e-2)
    opt = make_optimizer(cfg)
    opt_state = opt.init(params)
    adv, ret = compute_gae(traj["rewards"], traj["values_option"], traj["bootstrap_value"],
                           1.0 - traj["dones"].astype(jnp.float32))
    p2, _, stats = jax.jit(
        lambda p, o, t, k: ppo_update_interactive(p, o, t, adv, ret, k, evaluate_step, opt, cfg)
    )(params, opt_state, traj, jax.random.key(0))
    assert np.isfinite(float(stats["value_loss"]))
    assert np.isfinite(float(stats["unct_loss"]))
    assert not np.allclose(np.asarray(p2["w"]), np.asarray(params["w"]))


def test_rl_mask_zero_blocks_policy_gradient():
    """With rl_mask all zero, the surrogate contributes nothing; only value/
    entropy/uncertainty losses drive updates — the actor head (w) should
    receive gradient only via entropy. With entropy_coef=0, w must not move."""
    rng = np.random.RandomState(1)
    params, traj = _traj(rng)
    traj["rl_mask"] = jnp.zeros((T, B))

    def evaluate_step(p, obs, pa, mf, mv, qs, lqi, actions):
        feat = jnp.concatenate([obs["x"], qs], -1)
        logits = feat @ p["w"]
        v = feat @ jax.lax.stop_gradient(p["v"])  # value path not through w
        unct = feat @ p["u"]
        logp = jax.nn.log_softmax(logits)
        lp = jnp.take_along_axis(logp, actions[:, None], 1)[:, 0]
        ent = -(jnp.exp(logp) * logp).sum(-1)
        return v, lp, ent, logits, unct, feat

    cfg = PPOConfig(ppo_epoch=1, num_mini_batch=1, lr=1e-2, entropy_coef=0.0)
    opt = optax.sgd(1e-2)
    opt_state = opt.init(params)
    adv, ret = compute_gae(traj["rewards"], traj["values_option"], traj["bootstrap_value"],
                           1.0 - traj["dones"].astype(jnp.float32))
    p2, _, stats = ppo_update_interactive(
        params, opt_state, traj, adv, ret, jax.random.key(0), evaluate_step, opt, cfg, unct_coef=0.0
    )
    np.testing.assert_allclose(np.asarray(p2["w"]), np.asarray(params["w"]), atol=1e-7)


def test_dialog_supervised_update_decreases_loss():
    rng = np.random.RandomState(2)
    traj = {
        "obs": {
            "x": jnp.asarray(rng.randn(T, B, F).astype(np.float32)),
            "__prev_action": jnp.zeros((T, B), jnp.int32),
        },
        "feat_vln": jnp.asarray(rng.randn(T, B, F).astype(np.float32)),
        "feat_vln_dialog": jnp.asarray(rng.randn(T, B, D).astype(np.float32)),
        "dialog": jnp.zeros((T, B, 77), jnp.int32),
        "agent_step": jnp.zeros((T, B), jnp.int32),
        "masks_vln": jnp.ones((T, B)).at[0].set(0.0),
        "o_action": jnp.asarray(rng.randint(1, 4, (T, B)).astype(np.int32)),
        "o_mask": jnp.ones((T, B)),
        "queried": jnp.ones((T, B), bool),
        "initial_memories": (
            init_memory(B, 4, F), init_memory(B, 4, F + QC),
            init_memory(B, 3, F), init_memory(B, 3, D),
        ),
    }
    params = {"w": jnp.zeros((F, 4))}

    def evaluate_step(p, obs, pa, mf, mv, smf, smv, dialog, step, actions):
        logits = obs["x"] @ p["w"]
        v = logits[:, 0]
        lp = jnp.zeros_like(v)
        ent = jnp.zeros_like(v)
        return v, lp, ent, logits, obs["x"], jnp.zeros((obs["x"].shape[0], D))

    opt = optax.adam(5e-2)
    opt_state = opt.init(params)
    p, o, loss0 = dialog_supervised_update(params, opt_state, traj, evaluate_step, opt, replay_only=True)
    for _ in range(20):
        p, o, loss = dialog_supervised_update(p, o, traj, evaluate_step, opt, replay_only=True)
    assert float(loss) < float(loss0)

"""Data-parallel trainer tests on the virtual 8-device CPU mesh.

The TPU analogue of the reference's 2-rank localhost GLOO test
(habitat-lab-dialog/test/test_ddppo_reduce.py:119-126): gradient sync over
the mesh must equal hand-averaged full-batch gradients, and the trainers
must train end-to-end through `run.py` with the mesh engaged.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from avlen_tpu.parallel.ddppo import (
    infer_env_specs,
    make_local_superstep,
    make_sharded_superstep,
    shard_pytree,
)
from avlen_tpu.parallel.mesh import make_mesh
from tests.isolation import isolated

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


@pytest.fixture(autouse=True)
def _clear_caches_each_test():
    """Mesh trainer tests each compile multi-device shard_map programs; on
    this 1-core host the CPU client aborts if several accumulate in-process,
    so drop executables after every test in this module. The heavy trainer
    tests additionally run fork-per-test (tests/isolation.py)."""
    yield
    import gc

    jax.clear_caches()
    gc.collect()


def tiny_opts(**overrides):
    base = {
        "TASK_CONFIG.DATASET.SYNTHETIC.SIDE": "5",
        "TASK_CONFIG.DATASET.SYNTHETIC.RIR_LENGTH": "400",
        "TASK_CONFIG.DATASET.SYNTHETIC.FRAME_RES": "32",
        "TASK_CONFIG.SIMULATOR.AUDIO.RIR_SAMPLING_RATE": "4000",
        "TASK_CONFIG.ENVIRONMENT.MAX_EPISODE_STEPS": "10",
        "NUM_PROCESSES": "8",
        "LOG_INTERVAL": "1",
        "NUM_UPDATES": "2",
        "RL.PPO.num_steps": "4",
        "RL.PPO.num_mini_batch": "2",
        "RL.PPO.ppo_epoch": "1",
        "RL.PPO.SCENE_MEMORY_TRANSFORMER.hidden_size": "32",
        "RL.PPO.CLIP_WIDTH": "32",
        "RL.PPO.CLIP_LAYERS": "1",
        "NUM_DIALOG_STEPS": "3",
        "CHECKPOINT_INTERVAL": "1000000",
    }
    base.update({k: str(v) for k, v in overrides.items()})
    opts = []
    for k, v in base.items():
        opts += [k, v]
    return opts


# ---------------------------------------------------------------------------
def test_pmean_grads_equal_hand_averaged():
    """lax.pmean of per-shard grads == grads of the full-batch mean loss
    (the DDP-reduce equivalence, test_ddppo_reduce.py:119-126)."""
    mesh = make_mesh(("data",), (2,), jax.devices()[:2])
    b, d = 8, 5
    rng = np.random.RandomState(0)
    params = {"w": jnp.asarray(rng.randn(d, 3), jnp.float32),
              "b": jnp.zeros((3,), jnp.float32)}
    obs = jnp.asarray(rng.randn(b, d), jnp.float32)
    actions = jnp.asarray(rng.randint(0, 3, size=(b,)), jnp.int32)
    adv = jnp.asarray(rng.randn(b), jnp.float32)

    def loss_fn(p, o, a, ad):
        logits = o @ p["w"] + p["b"]
        lp = jax.nn.log_softmax(logits)[jnp.arange(o.shape[0]), a]
        return -(lp * ad).mean()

    full_grads = jax.grad(loss_fn)(params, obs, actions, adv)

    def shard_grads(p, o, a, ad):
        g = jax.grad(loss_fn)(p, o, a, ad)
        return jax.tree.map(lambda x: jax.lax.pmean(x, "data"), g)

    # check_vma=False matches parallel/ddppo.py: with VMA tracking on,
    # jax.grad inside shard_map auto-psums cotangents of replicated params
    # (grads arrive pre-summed and pmean would double-count); with it off the
    # explicit pmean is the one and only gradient sync.
    reduced = jax.jit(
        jax.shard_map(
            shard_grads, mesh=mesh,
            in_specs=(P(), P("data"), P("data"), P("data")),
            out_specs=P(),
            check_vma=False,
        )
    )(params, obs, actions, adv)

    for k in full_grads:
        np.testing.assert_allclose(
            np.asarray(reduced[k]), np.asarray(full_grads[k]), rtol=1e-6, atol=1e-6
        )


# ---------------------------------------------------------------------------
def _make_savi_trainer(tmp_path, **overrides):
    import avlen_tpu.rl.trainers  # noqa: F401
    from avlen_tpu.config import get_config
    from avlen_tpu.core.registry import registry

    cfg = get_config(
        opts=tiny_opts(**{"TRAINER_NAME": "savi", **overrides}),
        model_dir=str(tmp_path),
    )
    return registry.get_trainer("savi")(cfg)


@isolated(__file__)
def test_savi_trainer_uses_mesh_and_trains(tmp_path):
    trainer = _make_savi_trainer(tmp_path)
    trainer.ensure_setup()
    assert trainer.mesh is not None and trainer.mesh.devices.size == 8
    p0 = jax.tree.map(np.asarray, trainer.params)
    trainer.train()
    assert trainer.num_updates_done == 2
    # params actually moved and stayed finite
    moved = jax.tree.leaves(
        jax.tree.map(lambda a, b: float(np.abs(np.asarray(b) - a).max()), p0, trainer.params)
    )
    assert max(moved) > 0.0
    for leaf in jax.tree.leaves(trainer.params):
        assert np.isfinite(np.asarray(leaf)).all()


@isolated(__file__)
def test_superstep_sharded_matches_local_single_minibatch(tmp_path):
    """With one minibatch and one epoch the minibatch permutation is the
    identity set, per-shard GAE is per-env, and pmean'd grads equal the
    full-batch grads — so the sharded superstep must reproduce the local
    superstep's updated params bit-for-bit up to float tolerance."""
    trainer = _make_savi_trainer(
        tmp_path, **{"RL.PPO.num_mini_batch": "1", "RL.PPO.ppo_epoch": "1"}
    )
    trainer.ensure_setup()
    assert trainer.mesh is not None

    # two independent copies of the carry (the supersteps donate their input)
    carry_local = jax.tree.map(jnp.copy, trainer.carry)
    carry_copy = jax.tree.map(jnp.copy, trainer.carry)

    mesh2 = make_mesh(("data",), (2,), jax.devices()[:2])

    policy = trainer.policy
    from avlen_tpu.models.smt_policy import SMTPolicy
    from avlen_tpu.rl.gae import compute_gae
    from avlen_tpu.rl.ppo import ppo_update
    from avlen_tpu.rl.rollout_smt import collect_rollout_smt, evaluate_sequence_smt

    env = trainer.env
    ppo_cfg = trainer.ppo_cfg
    optimizer = trainer.optimizer

    def collect(train_state, carry):
        params, _ = train_state

        def act(obs, pa, mf, mv, key):
            # deterministic: decorrelated per-shard keys must not change the
            # rollout, so sharded and local runs see identical trajectories
            return policy.apply(params, obs, pa, mf, mv, key, True, method=SMTPolicy.act)

        def val(obs, pa, mf, mv):
            return policy.apply(params, obs, pa, mf, mv, method=SMTPolicy.get_value)

        return collect_rollout_smt(env._step_impl_noquery, act, val, None, carry, 4)

    def update(train_state, batch, key, grad_reduce):
        params, opt_state = train_state
        adv, ret = compute_gae(
            batch.rewards, batch.values, batch.bootstrap_value,
            1.0 - batch.dones.astype(jnp.float32), ppo_cfg.gamma, ppo_cfg.tau,
        )

        def evaluate_actions(p, obs, init_mem, masks, actions):
            def eval_step(o, pa, mf, mv, a):
                return policy.apply(p, o, pa, mf, mv, a, method=SMTPolicy.evaluate_step)

            return evaluate_sequence_smt(eval_step, obs, init_mem, masks, actions)

        # fixed key: minibatch permutation is irrelevant at num_mini_batch=1
        params, opt_state, stats = ppo_update(
            params, opt_state, batch, adv, ret, jax.random.key(0),
            evaluate_actions, optimizer,
            ppo_cfg, grad_reduce=grad_reduce,
        )
        return (params, opt_state), stats

    ts = (trainer.params, trainer.opt_state)
    key = jax.random.key(7)

    local_step = make_local_superstep(collect, update)
    ts_local, _, _, stats_local = local_step(ts, carry_local, key)

    sharded_step, carry_spec = make_sharded_superstep(
        collect, update, ts, carry_local, mesh2, 4
    )
    carry_sharded = shard_pytree(carry_copy, carry_spec, mesh2)
    ts_sharded, _, _, stats_sharded = sharded_step(ts, carry_sharded, key)

    for a, b in zip(
        jax.tree.leaves(ts_local[0]), jax.tree.leaves(ts_sharded[0])
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(
        float(stats_local["value_loss"]), float(stats_sharded["value_loss"]), rtol=1e-4
    )


# ---------------------------------------------------------------------------
@isolated(__file__)
def test_run_cli_trains_interactive_on_mesh(tmp_path):
    """`python -m avlen_tpu.run --run-type train` end-to-end with the full
    AVLEN interactive stack on the 8-device mesh."""
    from avlen_tpu import run as run_mod

    argv = [
        "--run-type", "train", "--model-dir", str(tmp_path),
    ] + tiny_opts(**{
        "TRAINER_NAME": "ddppo",
        "RL.PPO.policy_type": "interactive",
        "RL.PPO.SCENE_MEMORY_TRANSFORMER.memory_size": "2",
        "RL.PPO.SCENE_MEMORY_TRANSFORMER.nhead": "2",
        "REPLAY_STORE": "True",
        "NUM_UPDATES": "1",
        "NUM_DIALOG_STEPS": "2",
        "RL.PPO.num_steps": "3",
        "RL.PPO.num_mini_batch": "1",
        "TASK_CONFIG.DATASET.SYNTHETIC.SIDE": "4",
        "TASK_CONFIG.DATASET.SYNTHETIC.RIR_LENGTH": "200",
        "TASK_CONFIG.DATASET.SYNTHETIC.FRAME_RES": "16",
        "TASK_CONFIG.SIMULATOR.AUDIO.RIR_SAMPLING_RATE": "2000",
    })
    run_mod.main(argv)
    # a checkpoint was written by the final-update save
    ckpts = [f for f in os.listdir(os.path.join(str(tmp_path), "data")) if f.startswith("ckpt")]
    assert ckpts


def test_infer_env_specs_rules():
    tree = {
        "state": jnp.zeros((8, 3)),        # env-leading
        "traj": jnp.zeros((4, 8, 2)),      # time-major
        "scalar": jnp.zeros(()),            # replicated
        "const": jnp.zeros((5, 5)),         # replicated
    }
    specs = infer_env_specs(tree, num_envs=8, axis="data", num_steps=4)
    assert specs["state"] == P("data")
    assert specs["traj"] == P(None, "data")
    assert specs["scalar"] == P()
    assert specs["const"] == P()


# ---------------------------------------------------------------------------
@isolated(__file__)
def test_avwan_trainer_uses_mesh_and_trains(tmp_path):
    """The waypoint (AV-WAN) stack trains data-parallel through the same
    sharded superstep as every other stack (round-3 parity sweep)."""
    import avlen_tpu.rl.trainers  # noqa: F401
    from avlen_tpu.config import get_config
    from avlen_tpu.core.registry import registry

    cfg = get_config(
        opts=tiny_opts(**{
            "TRAINER_NAME": "AVWanTrainer",
            "PREDICTION_INTERVAL": "3",
            "RL.PPO.num_steps": "3",
            "TASK_CONFIG.TASK.GEOMETRIC_MAP.INTERNAL_MAP_SIZE": "300",
            "TASK_CONFIG.TASK.ACTION_MAP.MAP_SIZE": "5",
            "TASK_CONFIG.TASK.GEOMETRIC_MAP.MAP_SIZE": "90",
            "TASK_CONFIG.TASK.ACOUSTIC_MAP.MAP_SIZE": "9",
        }),
        model_dir=str(tmp_path),
    )
    trainer = registry.get_trainer("AVWanTrainer")(cfg)
    trainer.ensure_setup()
    assert trainer.mesh is not None and trainer.mesh.devices.size == 8
    p0 = jax.tree.map(np.asarray, trainer.params)
    trainer.train()
    assert trainer.num_updates_done == 2
    moved = jax.tree.leaves(
        jax.tree.map(lambda a, b: float(np.abs(np.asarray(b) - a).max()), p0, trainer.params)
    )
    assert max(moved) > 0.0
    for leaf in jax.tree.leaves(trainer.params):
        assert np.isfinite(np.asarray(leaf)).all()


@isolated(__file__)
def test_avnav_trainer_uses_mesh_and_trains(tmp_path):
    """The GRU (AV-Nav) stack trains data-parallel through make_ddppo_step
    when TPU.MESH_SHAPE spans the virtual mesh."""
    import avlen_tpu.rl.trainers  # noqa: F401
    from avlen_tpu.config import get_config
    from avlen_tpu.core.registry import registry

    cfg = get_config(
        opts=tiny_opts(**{"TRAINER_NAME": "AVNavTrainer"}), model_dir=str(tmp_path)
    )
    trainer = registry.get_trainer("AVNavTrainer")(cfg)
    trainer.ensure_setup()
    assert trainer.mesh is not None and trainer.mesh.devices.size == 8
    assert trainer._ddppo is not None
    p0 = jax.tree.map(np.asarray, trainer.params)
    trainer.train()
    moved = jax.tree.leaves(
        jax.tree.map(lambda a, b: float(np.abs(np.asarray(b) - a).max()), p0, trainer.params)
    )
    assert max(moved) > 0.0
    for leaf in jax.tree.leaves(trainer.params):
        assert np.isfinite(np.asarray(leaf)).all()

"""Heard/unheard sound protocol (VERDICT r2 #8).

Reference behavior: the paper evaluates on heard (train) vs unheard
(held-out) sounds; the repo's eval switch overrides the agent's SOUND_ID at
episode load (soundspaces/tasks/semantic_audionav_task.py:222-224). Here the
split is config-driven (DATASET.HELD_OUT_SOUNDS): training episodes are
sanitized off the held-out sounds, and eval binds remapped episode tables
through `env.eval_consts(SOUND_TYPE)`.
"""

import os

import jax.numpy as jnp
import numpy as np


def _cfg(tmp_path, **over):
    from avlen_tpu.config import get_config

    base = {
        "TRAINER_NAME": "AVNavTrainer",
        "TASK_CONFIG.DATASET.SYNTHETIC.SIDE": "4",
        "TASK_CONFIG.DATASET.SYNTHETIC.RIR_LENGTH": "200",
        "TASK_CONFIG.DATASET.SYNTHETIC.NUM_EPISODES": "12",
        "TASK_CONFIG.DATASET.SYNTHETIC.NUM_SOUNDS": "4",
        "TASK_CONFIG.DATASET.SYNTHETIC.MAX_HOPS": "6",
        "TASK_CONFIG.DATASET.SYNTHETIC.FRAME_RES": "16",
        "TASK_CONFIG.SIMULATOR.AUDIO.RIR_SAMPLING_RATE": "2000",
        "TASK_CONFIG.ENVIRONMENT.MAX_EPISODE_STEPS": "6",
        "TASK_CONFIG.DATASET.HELD_OUT_SOUNDS": "[3]",
        "NUM_PROCESSES": "2",
        "NUM_UPDATES": "1",
        "RL.PPO.num_steps": "4",
        "RL.PPO.num_mini_batch": "1",
        "RL.PPO.ppo_epoch": "1",
        "RL.PPO.hidden_size": "32",
        "TEST_EPISODE_COUNT": "6",
        "LOG_INTERVAL": "100",
        "CHECKPOINT_INTERVAL": "1",
        "VIDEO_OPTION": "[]",
    }
    base.update({k: str(v) for k, v in over.items()})
    opts = []
    for k, v in base.items():
        opts += [k, v]
    return get_config(opts=opts, model_dir=str(tmp_path))


def test_train_split_never_contains_held_out_sounds(tmp_path):
    from avlen_tpu.sim.builder import construct_batched_env

    cfg = _cfg(tmp_path)
    env = construct_batched_env(cfg, with_depth=False)
    assert env.sound_split == ([0, 1, 2], [3])
    # the packed train episode table has no held-out sound
    sounds = np.asarray(env.eps["sound"])
    assert not np.isin(sounds, [3]).any()
    for ep in env.episodes:
        assert ep.sound_id != 3


def test_eval_consts_remap_heard_and_unheard(tmp_path):
    from avlen_tpu.sim.builder import construct_batched_env

    cfg = _cfg(tmp_path)
    env = construct_batched_env(cfg, with_depth=False)
    unheard = env.eval_consts("unheard")
    assert (np.asarray(unheard["eps"]["sound"]) == 3).all()
    heard = env.eval_consts("heard")
    assert np.isin(np.asarray(heard["eps"]["sound"]), [0, 1, 2]).all()
    # no split → untouched
    assert env.eval_consts("") is env.consts


def test_eval_runs_on_sounds_never_trained_on(tmp_path):
    """End-to-end: train then eval with SOUND_TYPE=unheard; the eval pass
    must consume episodes whose sounds are disjoint from every sound any
    training episode used — including the first episode of each slot."""
    import avlen_tpu.rl.trainers  # noqa: F401
    from avlen_tpu.core.registry import registry
    from avlen_tpu.utils.tb import TensorboardWriter

    cfg = _cfg(tmp_path, SOUND_TYPE="unheard")
    trainer = registry.get_trainer("AVNavTrainer")(cfg)
    trainer.train()
    train_sounds = set(np.asarray(trainer.env.eps["sound"]).tolist())
    assert train_sounds <= {0, 1, 2}

    # spy: capture the sound table the eval rollouts actually bind
    bound_sounds = []
    orig_collect = trainer._collect

    def spy_collect(consts, *a, **kw):
        bound_sounds.append(np.asarray(consts["eps"]["sound"]))
        return orig_collect(consts, *a, **kw)

    trainer._collect = spy_collect
    ckpts = sorted(
        f for f in os.listdir(cfg.CHECKPOINT_FOLDER) if f.startswith("ckpt")
    )
    with TensorboardWriter(cfg.TENSORBOARD_DIR) as writer:
        trainer._eval_checkpoint(os.path.join(cfg.CHECKPOINT_FOLDER, ckpts[-1]), writer, 0)
    assert bound_sounds, "eval must run rollouts"
    for arr in bound_sounds:
        assert (arr == 3).all(), "every eval episode must use a held-out sound"
    assert not (set(np.unique(bound_sounds[0]).tolist()) & train_sounds)

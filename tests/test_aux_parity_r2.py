"""Round-2 aux-parity tests: data-only checkpoints carrying optimizer state
(bit-continued Adam on resume) and interactive-eval video generation."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avlen_tpu.utils.checkpoint import list_checkpoints, load_checkpoint, restore_into


def _avnav_cfg(tmp_path, **over):
    import avlen_tpu.rl.trainers  # noqa: F401
    from avlen_tpu.config import get_config

    base = {
        "TRAINER_NAME": "AVNavTrainer",
        "TASK_CONFIG.DATASET.SYNTHETIC.SIDE": "4",
        "TASK_CONFIG.DATASET.SYNTHETIC.RIR_LENGTH": "200",
        "TASK_CONFIG.DATASET.SYNTHETIC.NUM_EPISODES": "8",
        "TASK_CONFIG.DATASET.SYNTHETIC.MAX_HOPS": "8",
        "TASK_CONFIG.DATASET.SYNTHETIC.FRAME_RES": "16",
        "TASK_CONFIG.SIMULATOR.AUDIO.RIR_SAMPLING_RATE": "2000",
        "TASK_CONFIG.ENVIRONMENT.MAX_EPISODE_STEPS": "6",
        "NUM_PROCESSES": "4",
        "NUM_UPDATES": "2",
        "RL.PPO.num_steps": "5",
        "RL.PPO.num_mini_batch": "1",
        "RL.PPO.ppo_epoch": "1",
        "RL.PPO.hidden_size": "32",
        "TEST_EPISODE_COUNT": "4",
        "LOG_INTERVAL": "100",
        "CHECKPOINT_INTERVAL": "1",
        "VIDEO_OPTION": "[]",
    }
    base.update({k: str(v) for k, v in over.items()})
    opts = []
    for k, v in base.items():
        opts += [k, v]
    return get_config(opts=opts, model_dir=str(tmp_path))


def test_checkpoint_carries_bit_exact_adam_state(tmp_path):
    """Checkpoints are data-only msgpack holding the optimizer state; the
    restored Adam moments equal the live ones bit-for-bit (the reference's
    interrupted-state payload keeps optim state, ddp_utils.py:70-122)."""
    from avlen_tpu.core.registry import registry

    cfg = _avnav_cfg(tmp_path)
    trainer = registry.get_trainer("AVNavTrainer")(cfg)
    trainer.train()
    ckpts = list_checkpoints(cfg.CHECKPOINT_FOLDER)
    assert len(ckpts) == 2  # CHECKPOINT_INTERVAL=1 -> one per update

    ckpt = load_checkpoint(ckpts[-1])
    assert isinstance(ckpt, dict) and "opt_state" in ckpt
    target = trainer.optimizer.init(trainer.params)
    restored = restore_into(target, ckpt["opt_state"])
    for a, b in zip(jax.tree.leaves(restored), jax.tree.leaves(trainer.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # Adam count advanced: ppo_epoch * num_mini_batch * NUM_UPDATES = 2
    counts = [
        int(np.asarray(x))
        for x in jax.tree.leaves(restored)
        if getattr(x, "shape", None) == () and np.issubdtype(np.asarray(x).dtype, np.integer)
    ]
    assert 2 in counts

    # resume restores step counters and continues checkpoint numbering
    cfg2 = _avnav_cfg(tmp_path, RESUME_CHECKPOINT="True", NUM_UPDATES="3")
    trainer2 = registry.get_trainer("AVNavTrainer")(cfg2)
    trainer2.train()
    assert trainer2.num_steps_done > trainer.num_steps_done
    assert len(list_checkpoints(cfg.CHECKPOINT_FOLDER)) > 2


def test_checkpoint_is_not_pickle(tmp_path):
    """Loads must not execute code: the file is msgpack, not a pickle."""
    import pickle

    from avlen_tpu.utils.checkpoint import save_checkpoint

    p = save_checkpoint(str(tmp_path), "ckpt.0.pth", {"a": jnp.ones(3)})
    with open(p, "rb") as f:
        head = f.read(2)
    with pytest.raises(Exception):
        with open(p, "rb") as f:
            pickle.load(f)
    assert head[:1] != b"\x80"  # not a pickle protocol header


def test_interactive_eval_writes_video(tmp_path):
    """VIDEO_OPTION=["disk"] during interactive eval produces a video file
    (reference eval videos, ppo_trainer.py:1824-1860)."""
    from avlen_tpu.core.registry import registry
    from avlen_tpu.utils.tb import TensorboardWriter

    cfg = _avnav_cfg(
        tmp_path,
        **{
            "TRAINER_NAME": "ddppo",
            "RL.PPO.policy_type": "interactive",
            "RL.PPO.SCENE_MEMORY_TRANSFORMER.memory_size": "2",
            "RL.PPO.SCENE_MEMORY_TRANSFORMER.hidden_size": "32",
            "RL.PPO.CLIP_WIDTH": "32",
            "RL.PPO.CLIP_LAYERS": "1",
            "NUM_DIALOG_STEPS": "2",
            "NUM_UPDATES": "1",
            "NUM_PROCESSES": "2",
            "VIDEO_OPTION": '["disk"]',
        },
    )
    trainer = registry.get_trainer("ddppo")(cfg)
    trainer.train()
    ckpts = list_checkpoints(cfg.CHECKPOINT_FOLDER)
    assert ckpts
    with TensorboardWriter(cfg.TENSORBOARD_DIR) as writer:
        trainer._eval_checkpoint(ckpts[-1], writer, 0)
    videos = os.listdir(cfg.VIDEO_DIR) if os.path.isdir(cfg.VIDEO_DIR) else []
    assert videos, "interactive eval produced no video files"

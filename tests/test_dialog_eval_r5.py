"""π_l dialog-policy eval protocol (VERDICT r4 #4): a ``vln/ckpt.N.pth``
dialog checkpoint evaluated through ``run.py --run-type eval`` under a
DIALOG_TRAINING config must load into the DIALOG params (not π_q), roll the
oracle-window val episodes exactly once, and report action accuracy/CE
against the oracle plus the split's nav metrics.

Reference protocol: the dialog policy's own val split
(ss_baselines/savi/config/default.py:348-362, ddppo_trainer.py:181-298).
"""

import glob
import os

import numpy as np
import pytest

TINY = [
    "TRAINER_NAME", "ddppo",
    "DIALOG_TRAINING", "True",
    "RL.PPO.policy_type", "dialog",
    "TASK_CONFIG.DATASET.SYNTHETIC.SIDE", "4",
    "TASK_CONFIG.DATASET.SYNTHETIC.RIR_LENGTH", "200",
    "TASK_CONFIG.DATASET.SYNTHETIC.FRAME_RES", "16",
    "TASK_CONFIG.DATASET.SYNTHETIC.NUM_EPISODES", "12",
    "TASK_CONFIG.SIMULATOR.AUDIO.RIR_SAMPLING_RATE", "2000",
    "TASK_CONFIG.ENVIRONMENT.MAX_EPISODE_STEPS", "8",
    "NUM_PROCESSES", "2",
    "NUM_UPDATES_DIALOG", "1",
    "CHECKPOINT_INTERVAL_DIALOG", "1",
    "LOG_INTERVAL", "100",
    "CHECKPOINT_INTERVAL", "1000000",
    "RL.PPO.num_steps", "4",
    "RL.PPO.hidden_size", "32",
    "RL.PPO.CLIP_WIDTH", "32",
    "RL.PPO.CLIP_LAYERS", "1",
    "RL.PPO.SCENE_MEMORY_TRANSFORMER.hidden_size", "32",
    "RL.PPO.SCENE_MEMORY_TRANSFORMER.memory_size", "2",
    "RL.PPO.SCENE_MEMORY_TRANSFORMER.nhead", "2",
    "RL.PPO.use_belief_predictor", "False",
    "NUM_DIALOG_STEPS", "2",
    "TEST_EPISODE_COUNT", "6",
]


def _train_dialog(tmp_path):
    import avlen_tpu.rl.trainers  # noqa: F401
    from avlen_tpu.config import get_config
    from avlen_tpu.core.registry import registry

    cfg = get_config(opts=TINY, model_dir=str(tmp_path))
    trainer = registry.get_trainer("ddppo")(cfg)
    trainer.train()
    ckpts = sorted(glob.glob(os.path.join(cfg.CHECKPOINT_FOLDER, "vln", "ckpt.*.pth")))
    assert ckpts, "dialog training produced no vln checkpoint"
    return ckpts[-1]


def test_dialog_ckpt_evals_through_run_eval(tmp_path):
    """run.py --run-type eval semantics on a DIALOG_TRAINING config: the
    vln checkpoint loads as π_l and the dialog protocol reports imitation
    accuracy/CE + nav metrics with exactly-once episode accounting."""
    import avlen_tpu.rl.trainers  # noqa: F401
    from avlen_tpu.config import get_config
    from avlen_tpu.core.registry import registry
    from avlen_tpu.utils.tb import TensorboardWriter

    ckpt_path = _train_dialog(tmp_path)
    cfg = get_config(
        opts=TINY + ["EVAL_CKPT_PATH_DIR", ckpt_path], model_dir=str(tmp_path)
    )
    trainer = registry.get_trainer("ddppo")(cfg)
    trainer.ensure_setup()
    with TensorboardWriter(None) as writer:
        means = trainer._eval_checkpoint(ckpt_path, writer, 0)
    assert "action_accuracy" in means and "action_ce" in means
    assert 0.0 <= means["action_accuracy"] <= 1.0
    assert np.isfinite(means["action_ce"]) and means["action_ce"] > 0.0
    # oracle drives the env, so the evaluated episodes actually navigate
    assert means["episodes_evaluated"] == 6
    assert "success" in means and "spl" in means
    # eval() dispatches by run-type exactly like run.py
    trainer2 = registry.get_trainer("ddppo")(cfg)
    trainer2.eval()  # must not raise / mis-load the ckpt as pi_q


def test_dialog_ckpt_not_misloaded_as_interactive(tmp_path):
    """The failure the VERDICT called out: before r5, a vln ckpt evaluated
    under DIALOG_TRAINING was loaded via ckpt['state_dict'] into π_q. The
    dispatch must route to the dialog protocol, whose loaded params are the
    DIALOG tree (seq2seq attention keys), not the option head."""
    import avlen_tpu.rl.trainers  # noqa: F401
    import jax

    from avlen_tpu.config import get_config
    from avlen_tpu.core.registry import registry
    from avlen_tpu.utils.checkpoint import load_checkpoint

    ckpt_path = _train_dialog(tmp_path)
    ckpt = load_checkpoint(ckpt_path)
    cfg = get_config(opts=TINY, model_dir=str(tmp_path))
    trainer = registry.get_trainer("ddppo")(cfg)
    trainer.ensure_setup()
    ckpt_leaves = {
        tuple(str(k) for k in path): leaf.shape
        for path, leaf in jax.tree_util.tree_flatten_with_path(ckpt["state_dict"])[0]
    }
    dlg_leaves = {
        tuple(str(k) for k in path): np.asarray(leaf).shape
        for path, leaf in jax.tree_util.tree_flatten_with_path(trainer.params_dialog)[0]
    }
    assert set(ckpt_leaves) == set(dlg_leaves)
    assert all(tuple(ckpt_leaves[k]) == tuple(dlg_leaves[k]) for k in ckpt_leaves)

"""Neural speaker as the production diet (VERDICT r3 #2).

The reference always loads its pretrained speaker snapshot and invokes it on
every query (speaker_pipeline.py:27, ppo_trainer.py:549-562). Round 3 built
the machinery but shipped template-speaker configs; these tests pin the
round-4 contract: the shipped interactive yamls declare the neural speaker,
a missing snapshot fails loudly (no silent template fallback), and the
recipe's speaker stage chains into the interactive stage.
"""

import os

import numpy as np
import pytest

YAML_1ST = "configs/semantic_audionav/savi/savi_interactive_1st_stage.yaml"
YAML_2ND = "configs/semantic_audionav/savi/savi_interactive_2nd_stage.yaml"

TINY = [
    "TASK_CONFIG.DATASET.SYNTHETIC.SIDE", "4",
    "TASK_CONFIG.DATASET.SYNTHETIC.RIR_LENGTH", "200",
    "TASK_CONFIG.DATASET.SYNTHETIC.FRAME_RES", "16",
    "TASK_CONFIG.SIMULATOR.AUDIO.RIR_SAMPLING_RATE", "2000",
    "TASK_CONFIG.ENVIRONMENT.MAX_EPISODE_STEPS", "8",
    "NUM_PROCESSES", "2",
    "NUM_UPDATES", "1",
    "LOG_INTERVAL", "100",
    "CHECKPOINT_INTERVAL", "1000000",
    "RL.PPO.num_steps", "4",
    "RL.PPO.num_mini_batch", "1",
    "RL.PPO.ppo_epoch", "1",
    "RL.PPO.hidden_size", "32",
    "RL.PPO.CLIP_WIDTH", "32",
    "RL.PPO.CLIP_LAYERS", "1",
    "RL.PPO.SCENE_MEMORY_TRANSFORMER.hidden_size", "32",
    "RL.PPO.SCENE_MEMORY_TRANSFORMER.memory_size", "2",
    "RL.PPO.SCENE_MEMORY_TRANSFORMER.nhead", "2",
    "RL.PPO.use_belief_predictor", "False",
]


def _train_tiny_speaker(tmp_path, cfg):
    from avlen_tpu.dialog.speaker.train_speaker import train_speaker
    from avlen_tpu.sim.builder import build_world_from_config

    _, tables, _ = build_world_from_config(cfg, with_rgb=False, with_depth=False)
    train_speaker(
        tables, num_steps=40, batch=8, hidden_size=32,
        checkpoint_dir=str(tmp_path / "speaker"), num_pairs=64,
    )
    return str(tmp_path / "speaker" / "speaker.pth")


def test_shipped_interactive_yamls_declare_neural_speaker():
    """Both shipped AVLEN stage configs must run the trained speaker — the
    template backend is a test/dev convenience, not the production diet."""
    from avlen_tpu.config import get_config

    for path in (YAML_1ST, YAML_2ND):
        cfg = get_config(path)
        assert cfg.SPEAKER.BACKEND == "neural", path
        assert cfg.SPEAKER.CKPT_PATH.endswith("speaker.pth"), path


def test_missing_speaker_snapshot_fails_loudly(tmp_path):
    """A neural-speaker config whose snapshot is absent must raise at setup,
    exactly like the reference's torch.load on a missing snapshot — never
    silently fall back to the template channel."""
    import avlen_tpu.rl.trainers  # noqa: F401
    from avlen_tpu.config import get_config
    from avlen_tpu.core.registry import registry

    cfg = get_config(
        YAML_1ST,
        opts=TINY + ["SPEAKER.CKPT_PATH", str(tmp_path / "nope.pth")],
        model_dir=str(tmp_path),
    )
    trainer = registry.get_trainer("ddppo")(cfg)
    with pytest.raises(FileNotFoundError, match="speaker checkpoint"):
        trainer.ensure_setup()


def test_interactive_stage_trains_with_shipped_yaml_and_trained_speaker(tmp_path):
    """Checkpoint chaining: train_speaker output → SPEAKER.CKPT_PATH of the
    shipped 1st-stage yaml → one interactive update trains end-to-end with
    the neural speaker serving the instruction bank."""
    import jax

    import avlen_tpu.rl.trainers  # noqa: F401
    from avlen_tpu.config import get_config
    from avlen_tpu.core.registry import registry

    cfg0 = get_config(YAML_1ST, opts=TINY, model_dir=str(tmp_path))
    ckpt = _train_tiny_speaker(tmp_path, cfg0)
    cfg = get_config(
        YAML_1ST, opts=TINY + ["SPEAKER.CKPT_PATH", ckpt], model_dir=str(tmp_path)
    )
    assert cfg.SPEAKER.BACKEND == "neural"  # from the shipped yaml, not opts
    trainer = registry.get_trainer("ddppo")(cfg)

    # spy on the instruction-source resolution to prove the neural speaker
    # (not the template) built the bank the rollout gathers from
    from avlen_tpu.dialog import instruction_source as src_mod

    built = {}
    orig = src_mod.speaker_from_config

    def spy(cfg_, tables, rgb_bank=None):
        sp = orig(cfg_, tables, rgb_bank=rgb_bank)
        built["backend"] = sp.backend
        built["has_params"] = sp.neural_params is not None
        return sp

    src_mod.speaker_from_config = spy
    try:
        trainer.train()
    finally:
        src_mod.speaker_from_config = orig
    assert built == {"backend": "neural", "has_params": True}
    assert trainer.num_updates_done == 1
    for leaf in jax.tree.leaves(trainer.params_option):
        assert np.isfinite(np.asarray(leaf)).all()

"""Full AVLEN recipe integration smoke: all six training stages chained.

Mirrors the reference's staged training chain (SURVEY.md §2.8): belief
pretraining → SAVi SMT pretraining (memory 1) → SAVi finetune (memory 150)
→ π_l dialog pretraining → speaker training → AVLEN interactive (loading the
pretrained goal + dialog checkpoints AND the neural speaker, which serves
the instruction channel exactly as the reference's pretrained snapshot does
— speaker_pipeline.py:27, ppo_trainer.py:549-562). Tiny settings; validates
cross-stage checkpoint compatibility end-to-end.

Usage: python scripts/run_recipe_smoke.py [--workdir /tmp/recipe]
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default="/tmp/avlen_recipe")
    args = p.parse_args()
    w = args.workdir

    from avlen_tpu.config import get_config
    from avlen_tpu.core.registry import registry
    import avlen_tpu.rl.trainers  # noqa: F401
    from avlen_tpu.pretraining.audiogoal_predictor import train_audiogoal_predictor
    from avlen_tpu.sim.synthetic import make_scene_bank

    tiny_task = [
        "TASK_CONFIG.DATASET.SYNTHETIC.SIDE", "5",
        "TASK_CONFIG.DATASET.SYNTHETIC.RIR_LENGTH", "400",
        "TASK_CONFIG.DATASET.SYNTHETIC.FRAME_RES", "32",
        "TASK_CONFIG.SIMULATOR.AUDIO.RIR_SAMPLING_RATE", "4000",
        "TASK_CONFIG.ENVIRONMENT.MAX_EPISODE_STEPS", "20",
        "NUM_PROCESSES", "4",
        "LOG_INTERVAL", "1",
        "RL.PPO.num_steps", "8",
        "RL.PPO.num_mini_batch", "2",
        "RL.PPO.ppo_epoch", "1",
        "RL.PPO.hidden_size", "64",
        "RL.PPO.CLIP_WIDTH", "64",
        "RL.PPO.CLIP_LAYERS", "2",
        "RL.PPO.SCENE_MEMORY_TRANSFORMER.hidden_size", "64",
        "NUM_DIALOG_STEPS", "3",
        "CHECKPOINT_INTERVAL", "8",
    ]

    # stage 0: offline belief pretraining (audiogoal predictor)
    bank, _ = make_scene_bank(np.random.RandomState(0), num_scenes=1, side=5,
                              rir_length=400, sampling_rate=4000, with_frames=False)
    train_audiogoal_predictor(bank, num_steps=20, batch=16,
                              checkpoint_dir=os.path.join(w, "belief"), log_interval=100)
    print("stage 0 (belief pretrain) ok")

    # stage 1: SAVi SMT pretraining (memory 1)
    cfg = get_config(opts=tiny_task + [
        "TRAINER_NAME", "savi", "NUM_UPDATES", "2",
        "RL.PPO.SCENE_MEMORY_TRANSFORMER.memory_size", "1",
        "RL.PPO.SCENE_MEMORY_TRANSFORMER.pretraining", "True",
    ], model_dir=os.path.join(w, "savi_pre"))
    registry.get_trainer("savi")(cfg).train()
    print("stage 1 (savi pretraining) ok")

    # stage 2: SAVi finetune (memory 6 here) with belief predictor
    cfg = get_config(opts=tiny_task + [
        "TRAINER_NAME", "savi", "NUM_UPDATES", "2",
        "RL.PPO.SCENE_MEMORY_TRANSFORMER.memory_size", "6",
        "RL.PPO.use_belief_predictor", "True",
        "RL.PPO.BELIEF_PREDICTOR.online_training", "True",
    ], model_dir=os.path.join(w, "savi"))
    registry.get_trainer("savi")(cfg).train()
    goal_ckpt = sorted(glob.glob(os.path.join(w, "savi", "data", "ckpt.*.pth")))[-1]
    print("stage 2 (savi finetune) ok:", goal_ckpt)

    # stage 3: dialog (π_l) pretraining
    cfg = get_config(opts=tiny_task + [
        "TRAINER_NAME", "ddppo", "DIALOG_TRAINING", "True",
        "RL.PPO.policy_type", "dialog", "NUM_UPDATES_DIALOG", "2",
        "CHECKPOINT_INTERVAL_DIALOG", "2",
        "RL.PPO.SCENE_MEMORY_TRANSFORMER.memory_size", "3",
    ], model_dir=os.path.join(w, "vln"))
    registry.get_trainer("ddppo")(cfg).train()
    vln_ckpt = sorted(glob.glob(os.path.join(w, "vln", "data", "vln", "ckpt.*.pth")))[-1]
    print("stage 3 (dialog pretraining) ok:", vln_ckpt)

    # stage 4: speaker training on the same world (train_speaker output is
    # the snapshot the interactive stage's instruction channel loads)
    from avlen_tpu.dialog.speaker.train_speaker import train_speaker
    from avlen_tpu.sim.builder import build_world_from_config

    cfg = get_config(opts=tiny_task + ["TRAINER_NAME", "ddppo"],
                     model_dir=os.path.join(w, "speaker"))
    _, tables, _ = build_world_from_config(cfg, with_rgb=False, with_depth=False)
    train_speaker(tables, num_steps=60, batch=16, hidden_size=32,
                  checkpoint_dir=os.path.join(w, "speaker"))
    speaker_ckpt = os.path.join(w, "speaker", "speaker.pth")
    print("stage 4 (speaker) ok:", speaker_ckpt)

    # stage 5: AVLEN interactive, loading stage-2/3 checkpoints and the
    # stage-4 neural speaker (the shipped savi_interactive_*_stage.yaml
    # configs declare the same SPEAKER.BACKEND/CKPT_PATH wiring)
    cfg = get_config(opts=tiny_task + [
        "TRAINER_NAME", "ddppo", "NUM_UPDATES", "2",
        "RL.PPO.policy_type", "interactive",
        "RL.PPO.SCENE_MEMORY_TRANSFORMER.memory_size", "6",
        "RL.PPO.use_belief_predictor", "True",
        "REPLAY_STORE", "True",
        "GOAL_CKPT_PATH", goal_ckpt,
        "VLN_CKPT_PATH", vln_ckpt,
        "SPEAKER.BACKEND", "neural",
        "SPEAKER.CKPT_PATH", speaker_ckpt,
    ], model_dir=os.path.join(w, "avlen"))
    registry.get_trainer("ddppo")(cfg).train()
    print("stage 5 (interactive, neural speaker) ok")
    print("FULL RECIPE SMOKE OK")


if __name__ == "__main__":
    main()

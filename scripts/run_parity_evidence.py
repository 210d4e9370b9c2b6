"""Seeded SPL-parity evidence run (VERDICT r1 item 9).

Runs the full staged AVLEN recipe (SURVEY.md §2.8) at medium scale on a
FIXED synthetic world with a FIXED seed, scrapes the training curves
(Metrics/success, Metrics/spl, Metrics/reward, query stats, policy losses)
out of the TensorBoard event files, and commits them as
``runs/parity_r2/curves.npz`` + ``summary.json`` so later rounds can compare
semantics changes against a pinned baseline.

The reference recipe's own budget is 3000 updates × 6 envs × 150 steps per
stage on 4 GPUs (savi_interactive_1st_stage.yaml:7-9); this evidence run
uses the same staged structure at reduced update counts sized for a single
chip. Usage:

    python scripts/run_parity_evidence.py [--workdir runs/parity_r2]
        [--scale 1.0]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def scrape_tb(event_dir: str):
    """{tag: (steps, values)} from a TB event dir."""
    from tensorboard.backend.event_processing.event_accumulator import EventAccumulator

    acc = EventAccumulator(event_dir, size_guidance={"scalars": 0})
    acc.Reload()
    out = {}
    for tag in acc.Tags().get("scalars", []):
        ev = acc.Scalars(tag)
        out[tag] = (
            np.asarray([e.step for e in ev], np.int64),
            np.asarray([e.value for e in ev], np.float32),
        )
    return out


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default="runs/parity_r2")
    p.add_argument("--scale", type=float, default=1.0, help="update-count multiplier")
    p.add_argument("--seed", type=int, default=7)
    args = p.parse_args()
    w = args.workdir
    os.makedirs(w, exist_ok=True)

    from avlen_tpu.config import get_config
    from avlen_tpu.core.registry import registry
    from avlen_tpu.run import _enable_compile_cache
    import avlen_tpu.rl.trainers  # noqa: F401

    _enable_compile_cache()

    def n(x):
        return str(max(2, int(round(x * args.scale))))

    world = [
        "SEED", str(args.seed),
        "TASK_CONFIG.DATASET.SYNTHETIC.NUM_SCENES", "1",
        "TASK_CONFIG.DATASET.SYNTHETIC.SIDE", "5",
        "TASK_CONFIG.DATASET.SYNTHETIC.SEED", "0",
        "TASK_CONFIG.DATASET.SYNTHETIC.RIR_LENGTH", "2000",
        "TASK_CONFIG.DATASET.SYNTHETIC.FRAME_RES", "64",
        "TASK_CONFIG.DATASET.SYNTHETIC.NUM_EPISODES", "300",
        "TASK_CONFIG.DATASET.SYNTHETIC.MIN_HOPS", "1",
        "TASK_CONFIG.DATASET.SYNTHETIC.MAX_HOPS", "8",
        "TASK_CONFIG.SIMULATOR.AUDIO.RIR_SAMPLING_RATE", "8000",
        "TASK_CONFIG.ENVIRONMENT.MAX_EPISODE_STEPS", "40",
        "NUM_PROCESSES", "32",
        "LOG_INTERVAL", "10",
        "RL.PPO.num_steps", "40",
        "RL.PPO.num_mini_batch", "2",
        "RL.PPO.ppo_epoch", "2",
        "RL.PPO.hidden_size", "128",
        "RL.PPO.CLIP_WIDTH", "128",
        "RL.PPO.CLIP_LAYERS", "4",
        "RL.PPO.SCENE_MEMORY_TRANSFORMER.hidden_size", "128",
        "NUM_DIALOG_STEPS", "4",
        "CHECKPOINT_INTERVAL", "100",
    ]
    curves = {}

    def run(stage, trainer_name, extra, model_dir):
        cfg = get_config(opts=world + extra, model_dir=model_dir)
        registry.get_trainer(trainer_name)(cfg).train()
        for tag, (steps, vals) in scrape_tb(cfg.TENSORBOARD_DIR).items():
            curves[f"{stage}/{tag}"] = (steps, vals)
        print(f"[parity] stage {stage} done")

    # stage 0: offline belief (audiogoal predictor) pretraining on the
    # SAME world bank (the recipe's pretraining stage, SURVEY.md §2.8)
    from avlen_tpu.pretraining.audiogoal_predictor import train_audiogoal_predictor
    from avlen_tpu.sim.builder import build_world_from_config

    cfg0 = get_config(opts=world, model_dir=os.path.join(w, "belief"))
    bank0, _, _ = build_world_from_config(cfg0, with_rgb=False, with_depth=False)
    train_audiogoal_predictor(
        bank0, num_steps=int(300 * args.scale), batch=64,
        checkpoint_dir=os.path.join(w, "belief"), log_interval=100,
    )
    belief_ckpt = os.path.join(w, "belief", "label_predictor.pth")
    print("[parity] stage belief_pretrain done")

    # stage 1: SAVi SMT pretraining (memory 1)
    run("savi_pretrain", "savi", [
        "NUM_UPDATES", n(300),
        "RL.PPO.SCENE_MEMORY_TRANSFORMER.memory_size", "1",
        "RL.PPO.SCENE_MEMORY_TRANSFORMER.pretraining", "True",
    ], os.path.join(w, "savi_pre"))

    pre_ckpt = sorted(glob.glob(os.path.join(w, "savi_pre", "data", "ckpt.*.pth")))[-1]

    # stage 2: SAVi finetune (memory 30) + online belief predictor
    run("savi_finetune", "savi", [
        "NUM_UPDATES", n(400),
        "RL.PPO.SCENE_MEMORY_TRANSFORMER.memory_size", "30",
        "RL.PPO.use_belief_predictor", "True",
        "RL.PPO.BELIEF_PREDICTOR.online_training", "True",
        "RL.PPO.BELIEF_PREDICTOR.pretrained_path", belief_ckpt,
        "RL.DDPPO.pretrained", "True",
        "RL.DDPPO.pretrained_weights", pre_ckpt,
    ], os.path.join(w, "savi"))
    goal_ckpt = sorted(glob.glob(os.path.join(w, "savi", "data", "ckpt.*.pth")))[-1]

    # stage 3: pi_l dialog pretraining
    run("dialog_pretrain", "ddppo", [
        "DIALOG_TRAINING", "True",
        "RL.PPO.policy_type", "dialog",
        "NUM_UPDATES_DIALOG", n(150),
        "CHECKPOINT_INTERVAL_DIALOG", "40",
        "RL.PPO.SCENE_MEMORY_TRANSFORMER.memory_size", "30",
    ], os.path.join(w, "vln"))
    vln_ckpt = sorted(glob.glob(os.path.join(w, "vln", "data", "vln", "ckpt.*.pth")))[-1]

    # stage 4: AVLEN interactive (pi_q PPO + pi_l replay)
    run("interactive", "ddppo", [
        "NUM_UPDATES", n(200),
        "RL.PPO.policy_type", "interactive",
        "RL.PPO.SCENE_MEMORY_TRANSFORMER.memory_size", "30",
        "RL.PPO.use_belief_predictor", "True",
        "RL.PPO.BELIEF_PREDICTOR.pretrained_path", belief_ckpt,
        "REPLAY_STORE", "True",
        "GOAL_CKPT_PATH", goal_ckpt,
        "VLN_CKPT_PATH", vln_ckpt,
    ], os.path.join(w, "avlen"))

    # persist curves + summary
    npz = {}
    for tag, (steps, vals) in curves.items():
        safe = tag.replace("/", "__")
        npz[safe + "__steps"] = steps
        npz[safe + "__values"] = vals
    np.savez_compressed(os.path.join(w, "curves.npz"), **npz)

    def final(stage, tag, k=5):
        key = f"{stage}/{tag}"
        if key not in curves or len(curves[key][1]) == 0:
            return None
        return float(np.mean(curves[key][1][-k:]))

    summary = {
        "seed": args.seed,
        "scale": args.scale,
        "savi_finetune": {
            "success": final("savi_finetune", "Metrics/success"),
            "spl": final("savi_finetune", "Metrics/spl"),
            "reward": final("savi_finetune", "Metrics/reward"),
        },
        "interactive": {
            "success": final("interactive", "Metrics/success"),
            "spl": final("interactive", "Metrics/spl"),
            "reward": final("interactive", "Metrics/reward"),
        },
    }
    with open(os.path.join(w, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print("[parity] summary:", json.dumps(summary))


if __name__ == "__main__":
    main()

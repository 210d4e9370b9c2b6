"""Seeded parity-evidence run: the full staged AVLEN recipe + the paper's
qualitative table (VERDICT r3 #5; originally r1 item 9).

Runs the staged recipe (SURVEY.md §2.8) at medium scale on a FIXED synthetic
world with a FIXED seed — belief pretraining → SAVi SMT pretrain (memory 1)
→ SAVi finetune (memory 30, online belief) → π_l dialog pretraining →
**neural speaker training** → AVLEN interactive (neural speaker serving the
instruction channel, as the reference's pretrained snapshot does,
speaker_pipeline.py:27) — then reproduces the paper's Table-1-shaped
protocol on the final checkpoints:

* heard/unheard sound splits (DATASET.HELD_OUT_SOUNDS + env.eval_consts,
  semantic_audionav_task.py:222-224),
* the query-strategy comparison ours/random/uniform/jask
  (ppo_trainer.py:1333-1356) with SR/SPL/SNA/mean-queries per cell,
* a goal-only (SAVi, no-query) row for the interactive-beats-goal-only
  comparison.

Training curves are scraped from the TB event files into ``curves.npz``;
the table and stage finals go to ``summary.json``.

Usage:
    python scripts/run_parity_evidence.py [--workdir runs/parity_r3]
        [--scale 1.0] [--seed 7]
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
    p.add_argument("--workdir", default="runs/parity_r3")
    p.add_argument("--scale", type=float, default=1.0, help="update-count multiplier")
    p.add_argument("--seed", type=int, default=7)
    p.add_argument("--eval-count", type=int, default=100,
                   help="episodes per eval-table cell (reference protocol: "
                   "full split, savi/config/default.py:348-362)")
    p.add_argument("--eval-only", action="store_true",
                   help="skip all training stages; reuse the workdir's saved "
                   "checkpoints and only (re)run checkpoint picking + the "
                   "eval table")
    p.add_argument("--retrain-interactive", action="store_true",
                   help="reuse stages 0-4 but retrain stage 5 (AVLEN "
                   "interactive) against the freshly-picked goal checkpoint, "
                   "then rebuild the eval table")
    args = p.parse_args()
    if args.retrain_interactive:
        args.eval_only = True  # stages 0-4 reuse the workdir artifacts
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
        "TASK_CONFIG.DATASET.SYNTHETIC.NUM_SOUNDS", "4",
        # heard/unheard protocol: sound 3 never trains; unheard evals remap
        # every episode onto it via env.eval_consts (sim/env.py:290-306)
        "TASK_CONFIG.DATASET.HELD_OUT_SOUNDS", "[3]",
        "TASK_CONFIG.SIMULATOR.AUDIO.RIR_SAMPLING_RATE", "8000",
        # full recipe sensor suite (semantic_audiogoal.yaml TASK.SENSORS):
        # online belief training needs the pointgoal sensor for the
        # location-head regression target (savi.py _belief_location_target)
        "TASK_CONFIG.TASK.SENSORS",
        "['SPECTROGRAM_SENSOR','CATEGORY','CATEGORY_BELIEF','LOCATION_BELIEF',"
        "'POSE_SENSOR','COLLISION','ORACLE_ACTION_SENSOR',"
        "'POINTGOAL_WITH_GPS_COMPASS_SENSOR']",
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
        "CHECKPOINT_INTERVAL", "50",
        # the RECIPE hyperparameters (savi_pretraining.yaml:21-28 — the
        # config-default lr 7e-4 / entropy 0.01 / grad-norm 0.5 oscillated
        # hard at this 32-env × 40-step batch and collapsed late runs)
        "RL.PPO.lr", "2.5e-4",
        "RL.PPO.entropy_coef", "0.05",
        "RL.PPO.max_grad_norm", "0.2",
        # linear LR decay (the reference's LambdaLR mechanism,
        # ppo_trainer.py:1176-1178) as extra late-run stability
        "RL.PPO.use_linear_lr_decay", "True",
    ]
    curves = {}

    def run(stage, trainer_name, extra, model_dir):
        cfg = get_config(opts=world + extra, model_dir=model_dir)
        if not args.eval_only:
            registry.get_trainer(trainer_name)(cfg).train()
        for tag, (steps, vals) in scrape_tb(cfg.TENSORBOARD_DIR).items():
            curves[f"{stage}/{tag}"] = (steps, vals)
        print(f"[parity] stage {stage} done", flush=True)

    from avlen_tpu.utils.tb import TensorboardWriter

    def pick_best_ckpt(stage, trainer_name, extra, ckpts, n_eval=60):
        """The reference's eval-best protocol (run.py --run-type eval +
        find_best_ckpt_idx over val scalars): evaluate every saved checkpoint
        on the val protocol and hand the winner to the next stage — PPO's
        last update is not its best (base_trainer polling + run.py:22)."""
        if len(ckpts) == 1:
            return ckpts[0], {}
        cfg = get_config(
            opts=world + extra + [
                "NUM_UPDATES", "1",
                "TEST_EPISODE_COUNT", str(n_eval),
                "VIDEO_OPTION", "[]",
            ],
            model_dir=os.path.join(w, "eval", f"pick_{stage}"),
        )
        trainer = registry.get_trainer(trainer_name)(cfg)
        trainer.ensure_setup()
        scores = {}
        for ck in ckpts:
            with TensorboardWriter(None) as writer:
                means = trainer._eval_checkpoint(ck, writer, 0)
            scores[ck] = (
                float(means.get("success") or 0.0),
                float(means.get("spl") or 0.0),
            )
            print(f"[parity] pick {stage}: {os.path.basename(ck)} -> "
                  f"SR {scores[ck][0]:.3f} SPL {scores[ck][1]:.3f}", flush=True)
        best = max(ckpts, key=lambda c: scores[c])
        print(f"[parity] pick {stage}: best = {os.path.basename(best)}", flush=True)
        return best, {os.path.basename(k): v for k, v in scores.items()}

    # stage 0: offline belief (audiogoal predictor) pretraining on the
    # SAME world bank (the recipe's pretraining stage, SURVEY.md §2.8)
    from avlen_tpu.pretraining.audiogoal_predictor import train_audiogoal_predictor
    from avlen_tpu.sim.builder import build_world_from_config

    belief_ckpt = os.path.join(w, "belief", "label_predictor.pth")
    if not args.eval_only:
        cfg0 = get_config(opts=world, model_dir=os.path.join(w, "belief"))
        bank0, tables0, _ = build_world_from_config(cfg0, with_rgb=False, with_depth=False)
        train_audiogoal_predictor(
            bank0, num_steps=int(300 * args.scale), batch=64,
            checkpoint_dir=os.path.join(w, "belief"), log_interval=100,
        )
        print("[parity] stage belief_pretrain done", flush=True)

    def ckpts_of(*parts):
        # numeric sort: ckpt.10.pth must follow ckpt.9.pth
        found = glob.glob(os.path.join(w, *parts, "ckpt.*.pth"))
        return sorted(found, key=lambda p: int(p.rsplit(".", 2)[-2]))

    # stage 1: SAVi SMT pretraining (memory 1). The reference pretrains WITH
    # the belief predictor running online (savi_pretraining.yaml:41,55-56):
    # the category/location beliefs ARE the goal descriptor, so a
    # belief-free pretrain leaves the policy goal-blind (a zero decoder
    # query) — its deterministic eval stays at chance.
    pretrain_opts = [
        "RL.PPO.SCENE_MEMORY_TRANSFORMER.memory_size", "1",
        "RL.PPO.SCENE_MEMORY_TRANSFORMER.pretraining", "True",
        "RL.PPO.use_belief_predictor", "True",
        "RL.PPO.BELIEF_PREDICTOR.online_training", "True",
        "RL.PPO.BELIEF_PREDICTOR.pretrained_path", belief_ckpt,
    ]
    run("savi_pretrain", "savi", pretrain_opts + ["NUM_UPDATES", n(300)],
        os.path.join(w, "savi_pre"))
    pre_ckpt, _ = pick_best_ckpt(
        "savi_pretrain", "savi", pretrain_opts, ckpts_of("savi_pre", "data")
    )

    # stage 2: SAVi finetune (memory 30) + online belief predictor
    finetune_opts = [
        "RL.PPO.SCENE_MEMORY_TRANSFORMER.memory_size", "30",
        # stage 2 freezes the perception towers (savi.yaml:45)
        "RL.PPO.SCENE_MEMORY_TRANSFORMER.freeze_encoders", "True",
        "RL.PPO.use_belief_predictor", "True",
        "RL.PPO.BELIEF_PREDICTOR.online_training", "True",
        "RL.PPO.BELIEF_PREDICTOR.pretrained_path", belief_ckpt,
        "RL.DDPPO.pretrained", "True",
        "RL.DDPPO.pretrained_weights", pre_ckpt,
    ]
    run("savi_finetune", "savi", finetune_opts + ["NUM_UPDATES", n(400)],
        os.path.join(w, "savi"))
    goal_ckpt, goal_scores = pick_best_ckpt(
        "savi_finetune", "savi", finetune_opts, ckpts_of("savi", "data")
    )

    # stage 3: pi_l dialog pretraining
    run("dialog_pretrain", "ddppo", [
        "DIALOG_TRAINING", "True",
        "RL.PPO.policy_type", "dialog",
        "NUM_UPDATES_DIALOG", n(150),
        "CHECKPOINT_INTERVAL_DIALOG", "40",
        "RL.PPO.SCENE_MEMORY_TRANSFORMER.memory_size", "30",
    ], os.path.join(w, "vln"))
    vln_ckpt = ckpts_of("vln", "data", "vln")[-1]

    # stage 4: neural speaker — the snapshot the interactive stage loads,
    # exactly as the reference always loads its pretrained speaker
    # (speaker_pipeline.py:27) and invokes it per query
    # (ppo_trainer.py:549-562)
    speaker_ckpt = os.path.join(w, "speaker", "speaker.pth")
    if not args.eval_only:
        from avlen_tpu.dialog.speaker.train_speaker import train_speaker

        train_speaker(
            tables0, num_steps=int(400 * args.scale), batch=32, hidden_size=128,
            checkpoint_dir=os.path.join(w, "speaker"),
        )
        print("[parity] stage speaker done", flush=True)

    interactive_opts = [
        "RL.PPO.policy_type", "interactive",
        "RL.PPO.SCENE_MEMORY_TRANSFORMER.memory_size", "30",
        "RL.PPO.use_belief_predictor", "True",
        "RL.PPO.BELIEF_PREDICTOR.pretrained_path", belief_ckpt,
        "REPLAY_STORE", "True",
        "GOAL_CKPT_PATH", goal_ckpt,
        "VLN_CKPT_PATH", vln_ckpt,
        "SPEAKER.BACKEND", "neural",
        "SPEAKER.CKPT_PATH", speaker_ckpt,
    ]

    # stage 5: AVLEN interactive (pi_q PPO + pi_l replay, neural speaker)
    if args.retrain_interactive:
        import shutil as _sh

        _sh.rmtree(os.path.join(w, "avlen"), ignore_errors=True)
        args.eval_only = False  # train THIS stage
    run("interactive", "ddppo", interactive_opts + ["NUM_UPDATES", n(200)],
        os.path.join(w, "avlen"))
    avlen_ckpt, avlen_scores = pick_best_ckpt(
        "interactive", "ddppo", interactive_opts, ckpts_of("avlen", "data")
    )

    # ------------------------------------------------------------------
    # the paper's qualitative table: query strategies × heard/unheard
    # (ppo_trainer.py:1333-1356; eval episode protocol
    # savi/config/default.py:348-362) + a goal-only SAVi row
    # ------------------------------------------------------------------
    from avlen_tpu.utils.tb import TensorboardWriter

    eval_count = ["TEST_EPISODE_COUNT", str(args.eval_count), "VIDEO_OPTION", "[]"]
    table = {}
    for qs in ("ours", "random", "uniform", "jask"):
        for sound in ("heard", "unheard"):
            cfg = get_config(
                opts=world + interactive_opts + eval_count + [
                    "NUM_UPDATES", "1",
                    "QS_METHOD", qs,
                    "SOUND_TYPE", sound,
                ],
                model_dir=os.path.join(w, "eval", f"{qs}_{sound}"),
            )
            trainer = registry.get_trainer("ddppo")(cfg)
            trainer.ensure_setup()
            with TensorboardWriter(None) as writer:
                means = trainer._eval_checkpoint(avlen_ckpt, writer, 0)
            table[f"{qs}/{sound}"] = {
                "success": means.get("success"),
                "spl": means.get("spl"),
                "sna": means.get("sna"),
                "mean_queries": means.get("query_count"),
                "episodes": means.get("episodes_evaluated"),
            }
            print(f"[parity] eval {qs}/{sound}: {table[f'{qs}/{sound}']}", flush=True)

    for sound in ("heard", "unheard"):
        cfg = get_config(
            opts=world + eval_count + [
                "NUM_UPDATES", "1",
                "RL.PPO.SCENE_MEMORY_TRANSFORMER.memory_size", "30",
                "RL.PPO.use_belief_predictor", "True",
                "RL.PPO.BELIEF_PREDICTOR.pretrained_path", belief_ckpt,
                "SOUND_TYPE", sound,
            ],
            model_dir=os.path.join(w, "eval", f"goalonly_{sound}"),
        )
        trainer = registry.get_trainer("savi")(cfg)
        trainer.ensure_setup()
        with TensorboardWriter(None) as writer:
            means = trainer._eval_checkpoint(goal_ckpt, writer, 0)
        table[f"goal_only/{sound}"] = {
            "success": means.get("success"),
            "spl": means.get("spl"),
            "sna": means.get("sna"),
            "mean_queries": 0.0,
            "episodes": means.get("episodes_evaluated"),
        }
        print(f"[parity] eval goal_only/{sound}: {table[f'goal_only/{sound}']}", flush=True)

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
        "recipe": "belief → savi_pretrain → savi_finetune → dialog → speaker → interactive(neural speaker)",
        "ckpt_selection": {
            "protocol": "eval-best over saved checkpoints (run.py find_best_ckpt_idx protocol)",
            "goal_ckpt": os.path.basename(goal_ckpt),
            "goal_ckpt_scores": goal_scores,
            "avlen_ckpt": os.path.basename(avlen_ckpt),
            "avlen_ckpt_scores": avlen_scores,
        },
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
        "eval_table": table,
    }
    with open(os.path.join(w, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print("[parity] summary:", json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()

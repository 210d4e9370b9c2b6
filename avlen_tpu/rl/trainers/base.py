"""Trainer base class.

Contract parity with BaseTrainer/BaseRLTrainer (ss_baselines/common/
base_trainer.py:22-289): ``train()`` / ``eval()`` entry points, checkpoint
folder polling during eval, and eval-config merge priority (current EVAL
opts over checkpoint-saved config, base_trainer.py:125-158).
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict, Optional

from avlen_tpu.config.node import ConfigNode
from avlen_tpu.utils.checkpoint import list_checkpoints, load_checkpoint, poll_checkpoint_folder
from avlen_tpu.utils.logging import logger
from avlen_tpu.utils.tb import TensorboardWriter


# step-metric keys that are bookkeeping, not scalar performance measures
# (the reference blacklists map-like info in _extract_scalars_from_info,
# savi/ppo/ppo_trainer.py:277-303)
METRIC_BLACKLIST = frozenset(
    {"episode", "agent_node", "agent_rot", "agent_scene", "goal_node"}
)


def scalar_metrics(metrics: Dict[str, Any]) -> Dict[str, Any]:
    return {k: v for k, v in metrics.items() if k not in METRIC_BLACKLIST}


def exact_once_deal(num_episodes: int, num_envs: int):
    """Deal episode indices round-robin across env slots for an exactly-once
    eval pass (the fixed-shape analogue of the reference's per-process eval
    splits + pause-on-done, base_trainer.py:185-289). Slots whose stream is
    shorter than the longest wrap onto their own episodes; the caller dedupes
    by episode id."""
    import numpy as np

    per = max(-(-num_episodes // num_envs), 1)
    order = np.zeros((num_envs, per), np.int32)
    ids = np.arange(num_episodes, dtype=np.int32)
    for b in range(num_envs):
        slot = ids[b::num_envs]
        if slot.size == 0:
            slot = ids
        order[b] = np.resize(slot, per)
    return order


def eval_episode_accounting(seen, count: int, where: str) -> Dict[str, float]:
    """Episodes-evaluated bookkeeping for the exactly-once eval loops.

    The eval loops bound rollout chunks by ``max_rollouts``, which can exit
    with fewer than TEST_EPISODE_COUNT episodes completed under pathological
    configs (very long episodes, few env slots). The reference instead blocks
    until every process finishes its split (base_trainer.py:185-289); here an
    under-count is logged loudly and recorded as ``episodes_evaluated`` so
    means over a short sample are never silent."""
    if len(seen) < count:
        logger.warning(
            "%s eval exhausted its rollout budget with %d/%d episodes "
            "completed; reported means cover only the completed episodes "
            "(more env slots or a higher max_rollouts budget would finish "
            "the split)",
            where, len(seen), count,
        )
    return {"episodes_evaluated": float(len(seen))}


class BaseRLTrainer:
    def __init__(self, config: ConfigNode):
        self.config = config
        self.num_updates_done = 0
        self.num_steps_done = 0
        self._setup_done = False

    def _setup(self, num_envs=None) -> None:  # overridden by trainers
        raise NotImplementedError

    def eval_rollout_budget(self, num_episodes: int, num_envs: int, max_episode_steps: int) -> int:
        """Rollout-chunk budget for the exactly-once eval loops: enough
        chunks for every slot to finish its dealt stream at worst-case
        episode length, with generous slack. Centralized so tests can force
        an artificially tiny budget and assert the under-count warning
        (eval_episode_accounting)."""
        return 10 + 4 * (-(-num_episodes // num_envs)) * (
            -(-max_episode_steps // max(self.num_steps, 1))
        )

    def compute_dtype(self):
        """TPU.PRECISION → the compute dtype passed into every tower
        (params stay float32; Flax casts activations/matmuls). bfloat16 is
        the MXU-native choice for TPU runs; float32 is the default so CPU
        tests and parity checks are bit-stable."""
        import jax.numpy as jnp

        name = str(self.config.TPU.PRECISION).lower()
        table = {
            "bfloat16": jnp.bfloat16, "bf16": jnp.bfloat16,
            "float32": jnp.float32, "fp32": jnp.float32,
            "float16": jnp.float16, "fp16": jnp.float16,
        }
        if name not in table:
            raise ValueError(f"unknown TPU.PRECISION {name!r}")
        return table[name]

    def _donate_rollouts(self) -> bool:
        """TPU.DONATE_ROLLOUTS → donate the superstep's carry buffers."""
        return bool(self.config.TPU.DONATE_ROLLOUTS)

    def _refresh_episode_stream(self, carry):
        """Re-deal each slot's future episode order from its ITERATOR_OPTIONS
        stream (EpisodeStreamer) between supersteps: shuffle per cycle and
        forced scene switches on the batched env — the reference's
        EpisodeIterator semantics (habitat dataset.py:310-356) applied to
        `EnvState.ep_order` without touching jit purity."""
        streamer = getattr(self.env, "streamer", None)
        if streamer is None:
            return carry
        import numpy as np

        state = carry.env_state
        order = streamer.refresh(np.asarray(state.cursor))
        return carry._replace(env_state=self.env.refresh_ep_order(state, order))

    def _make_train_mesh(self, num_envs: int):
        """Device mesh for data-parallel training from TPU.MESH_AXES/SHAPE
        (the TPU replacement for RL.DDPPO.distrib_backend + init_distrib_slurm,
        ss_baselines/savi/ddppo/algo/ddp_utils.py:129-182). Returns None —
        single-device execution — when only one device is available or the
        env batch does not divide across the mesh."""
        from avlen_tpu.parallel.mesh import make_mesh

        tpu_cfg = self.config.TPU
        mesh = make_mesh(tuple(tpu_cfg.MESH_AXES), tuple(tpu_cfg.MESH_SHAPE))
        n = int(mesh.devices.size)
        if n <= 1:
            return None
        if num_envs % n != 0:
            logger.warning(
                f"num_envs={num_envs} not divisible by mesh size {n}; "
                "falling back to single-device training"
            )
            return None
        logger.info(f"data-parallel training over {n} devices: {dict(mesh.shape)}")
        return mesh

    def ensure_setup(self) -> None:
        """Lazy build: eval paths defer env/model construction until the
        checkpoint config is known, avoiding a full second compile."""
        if not self._setup_done:
            self._setup()
            self._setup_done = True

    # -- API -------------------------------------------------------------
    def train(self) -> None:
        raise NotImplementedError

    def _eval_checkpoint(self, checkpoint_path: str, writer: TensorboardWriter, checkpoint_index: int = 0) -> Dict[str, float]:
        raise NotImplementedError

    def eval(self) -> None:
        """Evaluate a single checkpoint or poll a folder of them
        (base_trainer.py:69-123)."""
        os.makedirs(self.config.TENSORBOARD_DIR, exist_ok=True)
        with TensorboardWriter(self.config.TENSORBOARD_DIR) as writer:
            ckpt_dir = self.config.EVAL_CKPT_PATH_DIR
            if os.path.isfile(ckpt_dir):
                self._eval_checkpoint(ckpt_dir, writer, 0)
                return
            ckpts = list_checkpoints(ckpt_dir)
            if not ckpts:
                logger.warning(f"No checkpoints found in {ckpt_dir}")
                return
            if self.config.USE_LAST_CKPT:
                self._eval_checkpoint(ckpts[-1], writer, len(ckpts) - 1)
                return
            for i, path in enumerate(ckpts):
                self._eval_checkpoint(path, writer, i)

    def resolve_eval_config(self, ckpt_config: Optional[ConfigNode]) -> ConfigNode:
        """Merge priority: current eval opts > checkpoint config > current
        config (base_trainer.py:125-158)."""
        config = self.config.clone()
        if ckpt_config is not None and self.config.EVAL.USE_CKPT_CONFIG:
            config.defrost()
            merged = ckpt_config.clone() if isinstance(ckpt_config, ConfigNode) else ConfigNode(ckpt_config)
            for key in ("TASK_CONFIG", "RL"):
                if key in merged:
                    config[key] = merged[key].clone()
            if self.config.CMD_TRAILING_OPTS:
                config.merge_from_list(list(self.config.CMD_TRAILING_OPTS))
            config.freeze()
        return config

    @staticmethod
    def load_checkpoint(path: str) -> Dict[str, Any]:
        return load_checkpoint(path)

    def reconfigure_from_checkpoint(self, ckpt: Dict[str, Any]) -> None:
        """Rebuild env/policy under the checkpoint's saved config (the
        reference re-merges eval config from the checkpoint,
        base_trainer.py:125-158) so network shapes match the training run."""
        if not self.config.EVAL.USE_CKPT_CONFIG or "config" not in ckpt:
            self.ensure_setup()
            return
        saved = ConfigNode(ckpt["config"])
        current = self.config.clone()
        changed = False
        for key in ("TASK_CONFIG", "RL"):
            if key in saved and saved[key].to_dict() != current[key].to_dict():
                current[key] = saved[key].clone()
                changed = True
        if changed:
            if self.config.CMD_TRAILING_OPTS:
                try:
                    current.merge_from_list(list(self.config.CMD_TRAILING_OPTS))
                except KeyError:
                    pass
            current.freeze()
            self.config = current
            if self._setup_done:
                self._setup()
        self.ensure_setup()

    def generate_eval_videos(
        self, dones, masks, metrics, writer, checkpoint_index: int, max_videos: int = 2
    ) -> int:
        """Top-down-map episode videos at eval (generate_video semantics,
        common/utils.py:187-238) for episodes fully contained in the rollout
        chunk. Requires the agent-trace metrics recorded when VIDEO_OPTION is
        set (EnvConfig.record_pose_info). Returns the number written."""
        import numpy as np

        if "agent_node" not in metrics or not self.config.VIDEO_OPTION:
            return 0
        from avlen_tpu.utils.maps import draw_top_down_map
        from avlen_tpu.utils.video import generate_video

        dones = np.asarray(dones)
        masks = np.asarray(masks)
        metrics = {k: np.asarray(v) for k, v in metrics.items()}
        made = 0
        for b in range(dones.shape[1]):
            if made >= max_videos:
                break
            start = 0
            for t in range(dones.shape[0]):
                if masks[t, b] == 0:
                    start = t
                if dones[t, b]:
                    scene = int(metrics["agent_scene"][t, b])
                    tbl = self.env.scene_tables[scene]
                    edges = np.array(
                        [[u, v] for u in range(tbl.num_nodes) for v in tbl.neighbors[u] if v >= 0],
                        np.int32,
                    )
                    trail = [int(x) for x in metrics["agent_node"][start : t + 1, b]]
                    # per-episode fog-of-war accumulator over the map image
                    # (habitat fog_of_war.py reveal + overlay semantics)
                    from avlen_tpu.utils.maps import _to_px, reveal_fog_of_war

                    size = 256
                    fog = np.zeros((size, size), np.uint8)
                    px, _, _ = _to_px(tbl.positions, size)
                    no_obstacles = np.zeros((size, size), bool)
                    frames = []
                    for i in range(len(trail)):
                        rot = int(metrics["agent_rot"][start + i, b])
                        yx = (int(px[trail[i]][1]), int(px[trail[i]][0]))
                        fog = reveal_fog_of_war(
                            no_obstacles, fog, yx, np.deg2rad(rot * 90), max_line_len=40
                        )
                        frames.append(
                            draw_top_down_map(
                                tbl.positions, edges, trail[i], rot,
                                int(metrics["goal_node"][t, b]), trail=trail[: i + 1],
                                size=size, fog=fog,
                            )
                        )
                    generate_video(
                        self.config.VIDEO_OPTION, self.config.VIDEO_DIR, frames,
                        episode_id=f"{b}_{t}", checkpoint_idx=checkpoint_index,
                        metrics={"spl": float(metrics["spl"][t, b]), "success": float(metrics["success"][t, b])},
                        tb_writer=writer,
                    )
                    made += 1
                    start = t + 1
                    if made >= max_videos:
                        break
        return made

    def percent_done(self) -> float:
        return self.num_updates_done / max(self.config.NUM_UPDATES, 1)

    def try_to_resume(self) -> Optional[Dict[str, Any]]:
        """Resume from the newest checkpoint when RESUME_CHECKPOINT is set
        (try_to_resume_checkpoint, savi/ppo/ppo_trainer.py:238-275 +
        interrupted-state restore, ddppo_trainer.py:796-799)."""
        if not self.config.RESUME_CHECKPOINT:
            return None
        from avlen_tpu.utils.preemption import load_interrupted_state

        interrupted = load_interrupted_state()
        if interrupted is not None:
            logger.info("resuming from interrupted state")
            return interrupted
        ckpts = list_checkpoints(self.config.CHECKPOINT_FOLDER)
        if not ckpts:
            return None
        logger.info(f"resuming from {ckpts[-1]}")
        ckpt = load_checkpoint(ckpts[-1])
        ckpt["_resume_index"] = len(ckpts)
        return ckpt

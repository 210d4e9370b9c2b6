"""AV-WAN waypoint trainer.

Capability match for av_wan/ppo/ppo_trainer.py ("AVWanTrainer"): PPO over
waypoint actions in the hierarchical MapNav env, with action-map masking.
The rollout is a scan over HIGH-LEVEL steps, each of which internally runs
up to PREDICTION_INTERVAL planned low-level steps (sim/mapnav.py).
"""

from __future__ import annotations

import collections
import os
import time
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from avlen_tpu.core.registry import registry
from avlen_tpu.models.avwan_policy import AVWanNet, AVWanPolicy
from avlen_tpu.rl.gae import compute_gae
from avlen_tpu.rl.ppo import make_optimizer, ppo_update
from avlen_tpu.rl.rollout import RolloutBatch
from avlen_tpu.rl.trainers.avnav import ppo_config_from
from avlen_tpu.rl.trainers.base import METRIC_BLACKLIST, BaseRLTrainer
from avlen_tpu.sim.builder import construct_batched_env
from avlen_tpu.sim.mapnav import BatchedMapNavEnv, MapNavConfig
from avlen_tpu.utils.checkpoint import save_checkpoint
from avlen_tpu.utils.logging import logger
from avlen_tpu.utils.tb import TensorboardWriter


@registry.register_trainer(name="AVWanTrainer")
class AVWanTrainer(BaseRLTrainer):
    def __init__(self, config):
        super().__init__(config)

    def _setup(self, num_envs=None):
        cfg = self.config
        self.ppo_cfg = ppo_config_from(cfg)
        self.num_steps = cfg.RL.PPO.num_steps
        base_env = construct_batched_env(cfg, num_envs=num_envs, with_depth=True)
        tc = cfg.TASK_CONFIG.TASK
        self.env = BatchedMapNavEnv(
            base_env,
            MapNavConfig(
                action_map_size=tc.ACTION_MAP.MAP_SIZE,
                gm_size=tc.GEOMETRIC_MAP.MAP_SIZE // 10,
                am_size=tc.ACOUSTIC_MAP.MAP_SIZE,
                prediction_interval=cfg.PREDICTION_INTERVAL,
            ),
        )
        b = self.env.num_envs
        self.policy = AVWanPolicy(
            net=AVWanNet(
                hidden_size=cfg.RL.PPO.hidden_size,
                spectrogram_hw=base_env.spec_config.out_shape[:2],
                action_map_size=tc.ACTION_MAP.MAP_SIZE,
            )
        )
        key = jax.random.key(cfg.SEED)
        state, obs = self.env.reset()
        hidden = jnp.zeros((b, cfg.RL.PPO.hidden_size))
        amask = self.env.action_mask(obs)
        self.params = self.policy.init(
            key, obs, hidden, jnp.ones((b,)), amask, key, method=AVWanPolicy.act
        )
        self.optimizer = make_optimizer(self.ppo_cfg)
        self.opt_state = self.optimizer.init(self.params)
        self.state = state
        self.obs = obs
        self.hidden = hidden
        self.masks = jnp.zeros((b,))
        self.key = key
        self._build_jits()

    def _build_jits(self):
        policy, env = self.policy, self.env
        num_steps, ppo_cfg, optimizer = self.num_steps, self.ppo_cfg, self.optimizer

        def collect(params, state, obs, hidden, masks, key, deterministic=False):
            initial_hidden = hidden

            def step_fn(carry, _):
                state, obs, hidden, masks, key = carry
                key, sub = jax.random.split(key)
                amask = env.action_mask(obs)
                action, logp, value, hidden2, _ = policy.apply(
                    params, obs, hidden, masks, amask, sub, deterministic, method=AVWanPolicy.act
                )
                state2, obs2, reward, done, metrics = env._high_step_impl(state, action)
                store = dict(
                    obs={**obs, "__amask": amask},
                    actions=action, log_probs=logp, values=value, rewards=reward,
                    masks=masks, dones=done, metrics=metrics,
                )
                return (state2, obs2, hidden2, 1.0 - done.astype(jnp.float32), key), store

            carry, traj = jax.lax.scan(
                step_fn, (state, obs, hidden, masks, key), None, length=num_steps
            )
            state, obs, hidden, masks, key = carry
            amask = env.action_mask(obs)
            bootstrap = policy.apply(params, obs, hidden, masks, amask, method=AVWanPolicy.get_value)
            batch = RolloutBatch(
                obs=traj["obs"], actions=traj["actions"], log_probs=traj["log_probs"],
                values=traj["values"], rewards=traj["rewards"], masks=traj["masks"],
                dones=traj["dones"], metrics=traj["metrics"],
                initial_hidden=initial_hidden, bootstrap_value=bootstrap,
            )
            return (state, obs, hidden, masks, key), batch

        def update(params, opt_state, batch, key):
            adv, ret = compute_gae(
                batch.rewards, batch.values, batch.bootstrap_value,
                1.0 - batch.dones.astype(jnp.float32), ppo_cfg.gamma, ppo_cfg.tau,
            )

            def evaluate_actions(p, obs, h0, masks, actions):
                amask = obs["__amask"]
                sensor_obs = {k: v for k, v in obs.items() if not k.startswith("__")}
                return policy.apply(
                    p, sensor_obs, h0, masks, actions, amask, method=AVWanPolicy.evaluate_actions
                )

            return ppo_update(
                params, opt_state, batch, adv, ret, key, evaluate_actions, optimizer, ppo_cfg
            )

        def collect_bound(consts, params, *args, **kw):
            with env.binder.bind(consts):
                return collect(params, *args, **kw)

        self._collect = jax.jit(collect_bound, static_argnames=("deterministic",))
        self._update = jax.jit(update)

    # ------------------------------------------------------------------
    def train(self) -> None:
        self.ensure_setup()
        cfg = self.config
        os.makedirs(cfg.CHECKPOINT_FOLDER, exist_ok=True)
        os.makedirs(cfg.TENSORBOARD_DIR, exist_ok=True)
        window = collections.deque(maxlen=cfg.RL.PPO.reward_window_size)
        reward_acc = np.zeros((self.env.num_envs,), np.float64)
        key = jax.random.key(cfg.SEED + 1)
        t_start = time.time()
        ckpt_count = 0
        carry = (self.state, self.obs, self.hidden, self.masks, self.key)

        with TensorboardWriter(cfg.TENSORBOARD_DIR) as writer:
            for update in range(cfg.NUM_UPDATES):
                carry, batch = self._collect(self.env.consts, self.params, *carry)
                key, sub = jax.random.split(key)
                self.params, self.opt_state, stats = self._update(
                    self.params, self.opt_state, batch, sub
                )
                jax.block_until_ready(stats["value_loss"])

                rewards = np.asarray(batch.rewards)
                dones = np.asarray(batch.dones)
                metrics = {k: np.asarray(v) for k, v in batch.metrics.items() if k not in METRIC_BLACKLIST}
                for t_i in range(rewards.shape[0]):
                    reward_acc += rewards[t_i]
                    for b_i in np.nonzero(dones[t_i])[0]:
                        window.append(
                            {"reward": reward_acc[b_i], **{k: metrics[k][t_i, b_i] for k in metrics}}
                        )
                        reward_acc[b_i] = 0.0
                self.num_steps_done += rewards.size * cfg.PREDICTION_INTERVAL
                self.num_updates_done += 1

                if update % cfg.LOG_INTERVAL == 0:
                    fps = self.num_steps_done / max(time.time() - t_start, 1e-6)
                    logger.info(f"avwan update {update} fps {fps:.1f} frames {self.num_steps_done}")
                    if window:
                        means = {k: float(np.mean([w[k] for w in window])) for k in window[0]}
                        for k, v in means.items():
                            writer.add_scalar(f"Metrics/{k}", v, self.num_steps_done)
                    for k, v in stats.items():
                        writer.add_scalar(f"Policy/{k}", float(v), self.num_steps_done)

                # every CHECKPOINT_INTERVAL *updates* (ddppo_trainer.py:1191)
                if (update + 1) % cfg.CHECKPOINT_INTERVAL == 0 or update + 1 == cfg.NUM_UPDATES:
                    save_checkpoint(
                        cfg.CHECKPOINT_FOLDER, f"ckpt.{ckpt_count}.pth",
                        {"state_dict": self.params, "opt_state": self.opt_state,
                         "config": cfg.to_dict(),
                         "extra_state": {"step": self.num_steps_done}},
                    )
                    ckpt_count += 1

    def _eval_checkpoint(self, checkpoint_path: str, writer, checkpoint_index: int = 0) -> Dict[str, float]:
        ckpt = self.load_checkpoint(checkpoint_path)
        self.reconfigure_from_checkpoint(ckpt)
        params = jax.tree.map(jnp.asarray, ckpt["state_dict"])
        count = self.config.TEST_EPISODE_COUNT
        stats: Dict[str, list] = collections.defaultdict(list)
        state, obs = self.env.reset()
        b = self.env.num_envs
        carry = (state, obs, jnp.zeros((b, self.config.RL.PPO.hidden_size)), jnp.zeros((b,)), jax.random.key(7))
        episodes = 0
        while episodes < count:
            carry, batch = self._collect(self.env.consts, params, *carry, deterministic=True)
            dones = np.asarray(batch.dones)
            metrics = {k: np.asarray(v) for k, v in batch.metrics.items() if k not in METRIC_BLACKLIST}
            for t, bi in zip(*np.nonzero(dones)):
                if episodes >= count:
                    break
                for k in metrics:
                    stats[k].append(metrics[k][t, bi])
                episodes += 1
        means = {k: float(np.mean(v)) for k, v in stats.items()}
        logger.info(f"avwan eval ckpt {checkpoint_index}: " + ", ".join(f"{k}={v:.3f}" for k, v in means.items()))
        for k, v in means.items():
            writer.add_scalar(f"val/{k}", v, checkpoint_index)
        return means

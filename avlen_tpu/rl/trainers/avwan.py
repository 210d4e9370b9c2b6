"""AV-WAN waypoint trainer.

Capability match for av_wan/ppo/ppo_trainer.py ("AVWanTrainer"): PPO over
waypoint actions in the hierarchical MapNav env, with action-map masking.
The rollout is a scan over HIGH-LEVEL steps, each of which internally runs
up to PREDICTION_INTERVAL planned low-level steps (sim/mapnav.py).

First-class like the other stacks (round-3 parity sweep): the
(rollout → GAE → PPO) superstep runs under shard_map with pmean gradient
sync on a device mesh (parallel/ddppo.py), eval is exactly-once with
episode-id accounting + eval videos, training polls preemption and saves
interrupted state, and the ITERATOR_OPTIONS episode streams refresh between
supersteps.
"""

from __future__ import annotations

import collections
import os
import time
from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from avlen_tpu.core.registry import registry
from avlen_tpu.models.avwan_policy import AVWanNet, AVWanPolicy
from avlen_tpu.rl.gae import compute_gae
from avlen_tpu.rl.ppo import make_optimizer, ppo_update
from avlen_tpu.rl.rollout import RolloutBatch
from avlen_tpu.rl.trainers.avnav import ppo_config_from
from avlen_tpu.rl.trainers.base import (
    METRIC_BLACKLIST,
    BaseRLTrainer,
    eval_episode_accounting,
    exact_once_deal,
)
from avlen_tpu.sim.builder import construct_batched_env
from avlen_tpu.sim.mapnav import BatchedMapNavEnv, MapNavConfig
from avlen_tpu.utils.checkpoint import save_checkpoint
from avlen_tpu.utils.logging import logger
from avlen_tpu.utils.tb import TensorboardWriter


class AVWanCarry(NamedTuple):
    env_state: Any  # inner EnvState (episode stream lives here)
    mapper: Any  # MapperState
    obs: Dict[str, jnp.ndarray]
    hidden: jnp.ndarray
    masks: jnp.ndarray
    key: jax.Array


@registry.register_trainer(name="AVWanTrainer")
class AVWanTrainer(BaseRLTrainer):
    def __init__(self, config):
        super().__init__(config)

    def _setup(self, num_envs=None):
        cfg = self.config
        self.ppo_cfg = ppo_config_from(cfg)
        self.num_steps = cfg.RL.PPO.num_steps
        base_env = construct_batched_env(cfg, num_envs=num_envs, with_depth=True)
        from avlen_tpu.parallel.chunked import require_no_host_prefetch

        require_no_host_prefetch(base_env, "avwan")
        tc = cfg.TASK_CONFIG.TASK
        self.env = BatchedMapNavEnv(
            base_env,
            MapNavConfig(
                internal_map_size=tc.GEOMETRIC_MAP.INTERNAL_MAP_SIZE // 10,
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
                dtype=self.compute_dtype(),
            )
        )
        key = jax.random.key(cfg.SEED)
        state, obs = self.env.reset()
        env_state, mapper = state
        hidden = jnp.zeros((b, cfg.RL.PPO.hidden_size))
        amask = self.env.action_mask(obs)
        self.params = self.policy.init(
            key, obs, hidden, jnp.ones((b,)), amask, key, method=AVWanPolicy.act
        )
        self.optimizer = make_optimizer(self.ppo_cfg)
        self.opt_state = self.optimizer.init(self.params)
        self.carry = AVWanCarry(
            env_state=env_state, mapper=mapper, obs=obs, hidden=hidden,
            masks=jnp.zeros((b,)), key=key,
        )
        self.mesh = self._make_train_mesh(b)
        self._build_jits()

    def _build_jits(self):
        policy, env = self.policy, self.env
        num_steps, ppo_cfg, optimizer = self.num_steps, self.ppo_cfg, self.optimizer

        def collect(params, carry: AVWanCarry, deterministic=False):
            initial_hidden = carry.hidden

            def step_fn(c: AVWanCarry, _):
                key, sub = jax.random.split(c.key)
                amask = env.action_mask(c.obs)
                action, logp, value, hidden2, _ = policy.apply(
                    params, c.obs, c.hidden, c.masks, amask, sub, deterministic,
                    method=AVWanPolicy.act,
                )
                state2, obs2, reward, done, metrics = env._high_step_impl(
                    (c.env_state, c.mapper), action
                )
                env_state2, mapper2 = state2
                store = dict(
                    obs={**c.obs, "__amask": amask},
                    actions=action, log_probs=logp, values=value, rewards=reward,
                    masks=c.masks, dones=done, metrics=metrics,
                )
                c2 = AVWanCarry(
                    env_state=env_state2, mapper=mapper2, obs=obs2, hidden=hidden2,
                    masks=1.0 - done.astype(jnp.float32), key=key,
                )
                return c2, store

            carry2, traj = jax.lax.scan(step_fn, carry, None, length=num_steps)
            amask = env.action_mask(carry2.obs)
            bootstrap = policy.apply(
                params, carry2.obs, carry2.hidden, carry2.masks, amask,
                method=AVWanPolicy.get_value,
            )
            batch = RolloutBatch(
                obs=traj["obs"], actions=traj["actions"], log_probs=traj["log_probs"],
                values=traj["values"], rewards=traj["rewards"], masks=traj["masks"],
                dones=traj["dones"], metrics=traj["metrics"],
                initial_hidden=initial_hidden, bootstrap_value=bootstrap,
            )
            return carry2, batch

        def update(params, opt_state, batch, key, grad_reduce=lambda g: g):
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
                params, opt_state, batch, adv, ret, key, evaluate_actions,
                optimizer, ppo_cfg, grad_reduce=grad_reduce,
            )

        def collect_bound(consts, params, carry, deterministic=False):
            with env.binder.bind(consts):
                return collect(params, carry, deterministic)

        self._collect = jax.jit(collect_bound, static_argnames=("deterministic",))

        # (rollout → GAE → PPO) superstep; on a mesh it runs under shard_map
        # with pmean gradient sync, like every other stack
        def collect_ts(train_state, carry):
            params, _ = train_state
            return collect(params, carry)

        def update_ts(train_state, batch, key, grad_reduce):
            params, opt_state = train_state
            params, opt_state, stats = update(params, opt_state, batch, key, grad_reduce)
            return (params, opt_state), stats

        from avlen_tpu.parallel.ddppo import (
            make_local_superstep,
            make_sharded_superstep,
            shard_pytree,
        )

        if self.mesh is not None:
            self._superstep, carry_spec = make_sharded_superstep(
                collect_ts, update_ts, (self.params, self.opt_state), self.carry,
                self.mesh, num_steps, binder=env.binder,
                donate=self._donate_rollouts(),
            )
            self.carry = shard_pytree(self.carry, carry_spec, self.mesh)
        else:
            self._superstep = make_local_superstep(
                collect_ts, update_ts, binder=env.binder, donate=self._donate_rollouts()
            )

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

        from avlen_tpu.utils import preemption
        from avlen_tpu.utils.checkpoint import restore_into

        preemption.register_signal_handlers()
        resume = self.try_to_resume()
        if resume is not None:
            self.params = jax.tree.map(jnp.asarray, resume["state_dict"])
            if "opt_state" in resume:
                self.opt_state = restore_into(self.opt_state, resume["opt_state"])
            self.num_steps_done = int(resume.get("extra_state", {}).get("step", 0))
            ckpt_count = int(resume.get("_resume_index", 0))

        train_state = (self.params, self.opt_state)
        with TensorboardWriter(cfg.TENSORBOARD_DIR) as writer:
            for update in range(cfg.NUM_UPDATES):
                if preemption.should_exit():
                    # interrupted-state save + requeue (ddp_utils.py:70-122)
                    self.params, self.opt_state = train_state
                    preemption.save_interrupted_state(self._checkpoint_payload())
                    preemption.requeue_job()
                    return
                key, sub = jax.random.split(key)
                train_state, self.carry, batch, stats = self._superstep(
                    train_state, self.carry, sub, self.env.consts
                )
                self.params, self.opt_state = train_state
                jax.block_until_ready(stats["value_loss"])
                self.carry = self._refresh_episode_stream(self.carry)

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
                        cfg.CHECKPOINT_FOLDER, f"ckpt.{ckpt_count}.pth", self._checkpoint_payload()
                    )
                    ckpt_count += 1

    def _checkpoint_payload(self) -> Dict:
        return {
            "state_dict": self.params,
            "opt_state": self.opt_state,
            "config": self.config.to_dict(),
            "extra_state": {"step": self.num_steps_done},
        }

    # ------------------------------------------------------------------
    def _eval_checkpoint(self, checkpoint_path: str, writer, checkpoint_index: int = 0) -> Dict[str, float]:
        """Exactly-once eval over the split with episode-id accounting (the
        round-2 pattern every other stack uses) + eval videos."""
        cfg = self.config
        ckpt = self.load_checkpoint(checkpoint_path)
        self.reconfigure_from_checkpoint(ckpt)
        params = jax.tree.map(jnp.asarray, ckpt["state_dict"])
        num_episodes = int(self.env.eps["scene"].shape[0])
        count = min(cfg.TEST_EPISODE_COUNT, num_episodes)
        b = self.env.num_envs
        # heard/unheard sound split (env.eval_consts docstring)
        consts = self.env.eval_consts(cfg.SOUND_TYPE)
        state, obs = self.env.reset(
            order=jnp.asarray(exact_once_deal(num_episodes, b)), consts=consts
        )
        env_state, mapper = state
        carry = AVWanCarry(
            env_state=env_state, mapper=mapper, obs=obs,
            hidden=jnp.zeros((b, cfg.RL.PPO.hidden_size)),
            masks=jnp.zeros((b,)), key=jax.random.key(cfg.SEED + 7),
        )
        stats: Dict[str, list] = collections.defaultdict(list)
        seen: set = set()
        videos_made = 0
        max_rollouts = self.eval_rollout_budget(num_episodes, b, self.env.env.config.max_episode_steps)
        for _ in range(max_rollouts):
            if len(seen) >= count:
                break
            carry, batch = self._collect(consts, params, carry, deterministic=True)
            if videos_made < 2:
                videos_made += self.generate_eval_videos(
                    batch.dones, batch.masks, batch.metrics, writer, checkpoint_index
                )
            dones = np.asarray(batch.dones)
            ep_ids = np.asarray(batch.metrics["episode"])
            metrics = {k: np.asarray(v) for k, v in batch.metrics.items() if k not in METRIC_BLACKLIST}
            for t, bi in zip(*np.nonzero(dones)):
                eid = int(ep_ids[t, bi])
                if eid in seen or len(seen) >= count:
                    continue
                seen.add(eid)
                for k in metrics:
                    stats[k].append(metrics[k][t, bi])
        self._last_eval_episode_ids = sorted(seen)
        means = {k: float(np.mean(v)) for k, v in stats.items()}
        means.update(eval_episode_accounting(seen, count, "avwan"))
        logger.info(f"avwan eval ckpt {checkpoint_index}: " + ", ".join(f"{k}={v:.3f}" for k, v in means.items()))
        for k, v in means.items():
            writer.add_scalar(f"val/{k}", v, checkpoint_index)
        return means

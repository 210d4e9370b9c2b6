"""AV-Nav AudioGoal PPO trainer.

Capability match for PPOTrainer "AVNavTrainer" (ss_baselines/av_nav/ppo/
ppo_trainer.py:43-676): recurrent audio-visual PPO with GAE, windowed episode
stats, tensorboard scalars, ckpt.{i}.pth checkpoints, deterministic eval.

TPU-native execution model: the entire num_steps rollout runs as one jitted
`lax.scan` (rl/rollout.py) and the entire PPO update (epochs × minibatches)
is a second jit — per update there are exactly two device dispatches instead
of the reference's num_steps × (3 RPCs + forwards) + epoch × minibatch
python-loop steps.
"""

from __future__ import annotations

import collections
import functools
import os
import time
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from avlen_tpu.core.registry import registry
from avlen_tpu.models.policy import AudioNavBaselineNet, Policy
from avlen_tpu.rl.gae import compute_gae
from avlen_tpu.rl.ppo import PPOConfig, make_optimizer, ppo_update
from avlen_tpu.rl.rollout import CarryState, collect_rollout
from avlen_tpu.rl.trainers.base import METRIC_BLACKLIST, BaseRLTrainer
from avlen_tpu.sim.builder import construct_batched_env
from avlen_tpu.utils.checkpoint import save_checkpoint
from avlen_tpu.utils.logging import logger
from avlen_tpu.utils.tb import TensorboardWriter


def ppo_config_from(config) -> PPOConfig:
    p = config.RL.PPO
    return PPOConfig(
        clip_param=p.clip_param,
        ppo_epoch=p.ppo_epoch,
        num_mini_batch=p.num_mini_batch,
        value_loss_coef=p.value_loss_coef,
        entropy_coef=p.entropy_coef,
        lr=p.lr,
        eps=p.eps,
        max_grad_norm=p.max_grad_norm,
        gamma=p.gamma,
        tau=p.tau,
        use_gae=p.use_gae,
        use_normalized_advantage=p.use_normalized_advantage,
        use_linear_lr_decay=p.use_linear_lr_decay,
        lr_decay_steps=config.NUM_UPDATES * p.ppo_epoch * p.num_mini_batch,
    )


@registry.register_trainer(name="AVNavTrainer")
class AVNavTrainer(BaseRLTrainer):
    """PPO over the batched device env with a GRU audio-visual policy."""

    def __init__(self, config):
        super().__init__(config)

    def _setup(self, num_envs=None):
        cfg = self.config
        self.ppo_cfg = ppo_config_from(cfg)
        self.num_steps = cfg.RL.PPO.num_steps
        self.env = construct_batched_env(
            cfg, num_envs=num_envs, with_depth=True, with_rgb="RGB_SENSOR" in cfg.SENSORS and not cfg.EXTRA_RGB
        )
        b = self.env.num_envs
        spec_hw = self.env.spec_config.out_shape[:2]
        self.policy = Policy(
            net=AudioNavBaselineNet(
                hidden_size=cfg.RL.PPO.hidden_size,
                spectrogram_hw=spec_hw,
                use_rgb="rgb" in self.env.config.sensors,
                use_depth="depth" in self.env.config.sensors,
                dtype=self.compute_dtype(),
            ),
            num_actions=len(cfg.TASK_CONFIG.TASK.POSSIBLE_ACTIONS),
        )
        key = jax.random.key(cfg.SEED)
        state, obs = self.env.reset()
        hidden = jnp.zeros((b, cfg.RL.PPO.hidden_size), jnp.float32)
        self.params = self.policy.init(
            key, obs, hidden, jnp.ones((b,), jnp.float32), key, method=Policy.act
        )
        self.optimizer = make_optimizer(self.ppo_cfg)
        self.opt_state = self.optimizer.init(self.params)
        self.carry = CarryState(
            env_state=state, obs=obs, hidden=hidden,
            masks=jnp.zeros((b,), jnp.float32), key=key,
        )
        self.mesh = self._make_train_mesh(b)
        self._build_jits()

    def _build_jits(self):
        policy, env = self.policy, self.env
        num_steps, ppo_cfg, optimizer = self.num_steps, self.ppo_cfg, self.optimizer

        def collect(params, carry, deterministic=False, n=None):
            def pol(obs, h, m, key):
                return policy.apply(params, obs, h, m, key, deterministic, method=Policy.act)

            def val(obs, h, m):
                return policy.apply(params, obs, h, m, method=Policy.get_value)

            return collect_rollout(
                env._step_impl_noquery, pol, val, carry, num_steps if n is None else n
            )

        def update(params, opt_state, batch, key, grad_reduce=lambda g: g):
            adv, ret = compute_gae(
                batch.rewards, batch.values, batch.bootstrap_value,
                1.0 - batch.dones.astype(jnp.float32), ppo_cfg.gamma, ppo_cfg.tau,
            )

            def evaluate_actions(p, obs, h0, masks, actions):
                return policy.apply(p, obs, h0, masks, actions, method=Policy.evaluate_actions)

            return ppo_update(
                params, opt_state, batch, adv, ret, key, evaluate_actions, optimizer,
                ppo_cfg, grad_reduce=grad_reduce,
            )

        def collect_bound(consts, params, carry, deterministic=False, n=None):
            with env.binder.bind(consts):
                return collect(params, carry, deterministic, n=n)

        self._update = jax.jit(update)
        self._ddppo = None
        self._chunked = None
        if getattr(env, "host_prefetcher", None) is not None:
            # chunked host-prefetch audio (parallel/chunked.py): rollouts run
            # as C-step scans with host RIR prefetch between chunks
            import functools as _ft

            from avlen_tpu.parallel.chunked import (
                ChunkedCollector,
                make_chunked_superstep,
                resolve_chunk,
            )

            chunk = resolve_chunk(
                num_steps, self.config.TPU.ROLLOUT_CHUNK or max(1, num_steps // 6)
            )
            self._chunked = ChunkedCollector(env.host_prefetcher, env.binder, chunk, num_steps)
            self._chunk_len = chunk
            collect_chunk_jit = jax.jit(
                _ft.partial(collect_bound, n=chunk), static_argnames=("deterministic",)
            )

            def chunked_collect(consts, params, carry, deterministic=False):
                carry, batch, _ = self._chunked.run(
                    lambda c, cr: collect_chunk_jit(c, params, cr, deterministic=deterministic),
                    carry, consts,
                )
                return carry, batch

            self._collect = chunked_collect

            def collect_ts(train_state, carry, n=None):
                params, _ = train_state
                return collect(params, carry, n=n)

            def update_ts(train_state, batch, key, grad_reduce):
                params, opt_state = train_state
                params, opt_state, stats = update(params, opt_state, batch, key, grad_reduce)
                return (params, opt_state), stats

            self._superstep_chunked, carry_spec = make_chunked_superstep(
                collect_ts, update_ts, (self.params, self.opt_state), self.carry,
                self.mesh, num_steps, chunk, binder=env.binder, collector=self._chunked,
            )
            if carry_spec is not None:
                from avlen_tpu.parallel.ddppo import shard_pytree

                self.carry = shard_pytree(self.carry, carry_spec, self.mesh)
            # the reset observed through an empty cache — prime + recompute
            consts0 = self._chunked.prime(self.carry.env_state)
            self.carry = self.carry._replace(
                obs=dict(env._observe_jit(consts0, self.carry.env_state))
            )
            return

        self._collect = jax.jit(collect_bound, static_argnames=("deterministic",))

        # multi-chip: the GRU stack on make_ddppo_step (shard_map superstep,
        # pmean grad sync — the DDPPOTrainer path, ddppo_trainer.py:515-1200)
        if self.mesh is not None:
            from avlen_tpu.parallel.ddppo import make_ddppo_step, shard_carry

            self._ddppo = make_ddppo_step(
                env._step_impl_noquery,
                lambda p, o, h, m, k: policy.apply(p, o, h, m, k, False, method=Policy.act),
                lambda p, o, h, m: policy.apply(p, o, h, m, method=Policy.get_value),
                lambda p, o, h0, masks, a: policy.apply(
                    p, o, h0, masks, a, method=Policy.evaluate_actions
                ),
                optimizer, ppo_cfg, num_steps, self.mesh, self.carry,
                self.params, self.opt_state, binder=env.binder,
                donate=self._donate_rollouts(),
            )
            self.carry = shard_carry(self.carry, self.mesh)

    # ------------------------------------------------------------------
    def train(self) -> None:
        from avlen_tpu.utils.preemption import (
            register_signal_handlers,
            requeue_job,
            save_interrupted_state,
            should_exit,
        )

        self.ensure_setup()
        cfg = self.config
        os.makedirs(cfg.CHECKPOINT_FOLDER, exist_ok=True)
        os.makedirs(cfg.TENSORBOARD_DIR, exist_ok=True)
        window = collections.deque(maxlen=cfg.RL.PPO.reward_window_size)
        reward_acc = np.zeros((self.env.num_envs,), np.float64)
        key = jax.random.key(cfg.SEED + 1)
        t_start = time.time()
        env_time = pth_time = 0.0
        ckpt_count = 0

        register_signal_handlers()
        resume = self.try_to_resume()
        if resume is not None:
            self.params = jax.tree.map(jnp.asarray, resume["state_dict"])
            if "opt_state" in resume:
                from avlen_tpu.utils.checkpoint import restore_into

                # restore the msgpack state dict into the typed optax pytree
                # so Adam moments continue bit-exactly (ddp_utils.py:70-122)
                self.opt_state = restore_into(self.opt_state, resume["opt_state"])
            self.num_steps_done = int(resume.get("extra_state", {}).get("step", 0))
            ckpt_count = int(resume.get("_resume_index", 0))

        with TensorboardWriter(cfg.TENSORBOARD_DIR) as writer:
            for update in range(cfg.NUM_UPDATES):
                t0 = time.time()
                key, sub = jax.random.split(key)
                if self._chunked is not None:
                    # chunked host-prefetch superstep (parallel/chunked.py)
                    (self.params, self.opt_state), self.carry, batch, stats = (
                        self._superstep_chunked(
                            (self.params, self.opt_state), self.carry, sub, self.env.consts
                        )
                    )
                    jax.block_until_ready(stats["value_loss"])
                    t1 = t2 = time.time()
                    env_time += t1 - t0
                elif self._ddppo is not None:
                    # fused sharded superstep: rollout+update in one program
                    self.params, self.opt_state, self.carry, batch, stats = (
                        self._ddppo.step_fn(
                            self.params, self.opt_state, self.carry, sub, self.env.consts
                        )
                    )
                    jax.block_until_ready(stats["value_loss"])
                    t1 = t2 = time.time()
                    env_time += t1 - t0  # fused: device time counts as env+update
                else:
                    self.carry, batch = self._collect(self.env.consts, self.params, self.carry)
                    jax.block_until_ready(batch.rewards)
                    t1 = time.time()
                    self.params, self.opt_state, stats = self._update(
                        self.params, self.opt_state, batch, sub
                    )
                    jax.block_until_ready(stats["value_loss"])
                    t2 = time.time()
                    env_time += t1 - t0
                    pth_time += t2 - t1
                self.carry = self._refresh_episode_stream(self.carry)

                rewards = np.asarray(batch.rewards)
                dones = np.asarray(batch.dones)
                metrics = {k: np.asarray(v) for k, v in batch.metrics.items() if k not in METRIC_BLACKLIST}
                for t in range(rewards.shape[0]):
                    reward_acc += rewards[t]
                    for b in np.nonzero(dones[t])[0]:
                        window.append(
                            {"reward": reward_acc[b], **{k: metrics[k][t, b] for k in metrics}}
                        )
                        reward_acc[b] = 0.0

                self.num_steps_done += rewards.size
                self.num_updates_done += 1

                if update % cfg.LOG_INTERVAL == 0:
                    fps = self.num_steps_done / max(time.time() - t_start, 1e-6)
                    mean_stats = {
                        k: float(np.mean([w[k] for w in window])) for k in (window[0] if window else {})
                    }
                    logger.info(
                        f"update {update}\tfps {fps:.1f}\tenv-time {env_time:.2f}s\t"
                        f"pth-time {pth_time:.2f}s\tframes {self.num_steps_done}"
                    )
                    if window:
                        logger.info(
                            "window episodes {}: reward {:.3f} success {:.3f} spl {:.3f}".format(
                                len(window), mean_stats.get("reward", 0.0),
                                mean_stats.get("success", 0.0), mean_stats.get("spl", 0.0),
                            )
                        )
                    writer.add_scalar("Metrics/fps", fps, self.num_steps_done)
                    for k, v in stats.items():
                        writer.add_scalar(f"Policy/{k}", float(v), self.num_steps_done)
                    for k, v in (mean_stats.items() if window else []):
                        writer.add_scalar(f"Metrics/{k}", v, self.num_steps_done)

                # every CHECKPOINT_INTERVAL *updates* (ddppo_trainer.py:1191)
                if (update + 1) % cfg.CHECKPOINT_INTERVAL == 0 or update + 1 == cfg.NUM_UPDATES:
                    self.save_checkpoint(f"ckpt.{ckpt_count}.pth")
                    ckpt_count += 1

                if should_exit():
                    save_interrupted_state(
                        {
                            "state_dict": self.params,
                            "opt_state": self.opt_state,
                            "config": cfg.to_dict(),
                            "extra_state": {"step": self.num_steps_done},
                        }
                    )
                    requeue_job()
                    return

    def save_checkpoint(self, name: str) -> None:
        save_checkpoint(
            self.config.CHECKPOINT_FOLDER,
            name,
            {
                "state_dict": self.params,
                "opt_state": self.opt_state,
                "config": self.config.to_dict(),
                "extra_state": {"step": self.num_steps_done},
            },
        )

    # ------------------------------------------------------------------
    def _generate_eval_videos(self, batch, writer, checkpoint_index: int, max_videos: int = 2) -> None:
        self.generate_eval_videos(
            batch.dones, batch.masks, batch.metrics, writer, checkpoint_index, max_videos
        )

    def _eval_checkpoint(self, checkpoint_path: str, writer, checkpoint_index: int = 0) -> Dict[str, float]:
        ckpt = self.load_checkpoint(checkpoint_path)
        self.reconfigure_from_checkpoint(ckpt)
        from avlen_tpu.rl.trainers.base import eval_episode_accounting, exact_once_deal

        params = jax.tree.map(jnp.asarray, ckpt["state_dict"])
        num_episodes = int(self.env.eps["scene"].shape[0])
        count = min(self.config.TEST_EPISODE_COUNT, num_episodes)
        stats: Dict[str, list] = collections.defaultdict(list)
        b = self.env.num_envs
        # heard/unheard sound split (env.eval_consts docstring)
        consts = self.env.eval_consts(self.config.SOUND_TYPE)
        state, obs = self.env.reset(
            order=jnp.asarray(exact_once_deal(num_episodes, b)), consts=consts
        )
        if self._chunked is not None:
            # the reset observed through an empty/stale prefetch cache —
            # prime the standing pairs and recompute the initial obs
            consts = self._chunked.prime(state, consts)
            obs = dict(self.env._observe_jit(consts, state))
        carry = CarryState(
            env_state=state, obs=obs,
            hidden=jnp.zeros((b, self.config.RL.PPO.hidden_size), jnp.float32),
            masks=jnp.zeros((b,), jnp.float32),
            key=jax.random.key(self.config.SEED + 7),
        )
        seen: set = set()
        first_chunk = True
        max_rollouts = self.eval_rollout_budget(num_episodes, b, self.env.config.max_episode_steps)
        for _ in range(max_rollouts):
            if len(seen) >= count:
                break
            # av_nav's reference eval samples (ppo_trainer.py:518
            # deterministic=False); av_wan's takes argmax (its trainer keeps
            # deterministic=True) — match each stack's own protocol
            carry, batch = self._collect(consts, params, carry, deterministic=False)
            if first_chunk:
                self._generate_eval_videos(batch, writer, checkpoint_index)
                first_chunk = False
            dones = np.asarray(batch.dones)
            ep_ids = np.asarray(batch.metrics["episode"])
            metrics = {
                k: np.asarray(v) for k, v in batch.metrics.items()
                if k not in METRIC_BLACKLIST
            }
            for t, bi in zip(*np.nonzero(dones)):
                eid = int(ep_ids[t, bi])
                if eid in seen or len(seen) >= count:
                    continue
                seen.add(eid)
                for k in metrics:
                    stats[k].append(metrics[k][t, bi])
        self._last_eval_episode_ids = sorted(seen)
        means = {k: float(np.mean(v)) for k, v in stats.items()}
        means.update(eval_episode_accounting(seen, count, "avnav"))
        logger.info(f"eval ckpt {checkpoint_index}: " + ", ".join(f"{k}={v:.3f}" for k, v in means.items()))
        for k, v in means.items():
            writer.add_scalar(f"val/{k}", v, checkpoint_index)
        return means

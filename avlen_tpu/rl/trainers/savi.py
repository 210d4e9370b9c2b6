"""SAVi trainer: SMT policy + belief predictor PPO.

Capability match for PPOTrainer "savi" (ss_baselines/savi/ppo/ppo_trainer.py:
93-1311 — plain-SAVi path) with the two-stage recipe of the reference
configs: stage 1 `savi_pretraining.yaml` (SMT pretraining=True, memory 1,
ground-truth category as goal descriptor), stage 2 `savi.yaml` (memory 150,
frozen encoders, belief predictor filling category/location beliefs). The
online location-predictor training (`train_belief_predictor`,
ppo_trainer.py:959-1032) runs as a jitted MSE step over the rollout batch.

TPU execution: rollout = one scan (rl/rollout_smt.py), PPO update = one jit
with ring-replay memory views instead of the reference's num_copies
snapshots.
"""

from __future__ import annotations

import collections
import functools
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from avlen_tpu.core.registry import registry
from avlen_tpu.models.belief_predictor import (
    BeliefPredictorNet,
    init_belief_state,
    update_beliefs,
)
from avlen_tpu.models.memory import init_memory
from avlen_tpu.models.smt_policy import AudioNavSMTNet, SMTPolicy
from avlen_tpu.rl.gae import compute_gae
from avlen_tpu.rl.ppo import PPOConfig, make_optimizer, ppo_update
from avlen_tpu.rl.rollout_smt import (
    SMTCarry,
    collect_rollout_smt,
    evaluate_sequence_smt,
    evaluate_sequence_smt_batched,
)
from avlen_tpu.rl.trainers.avnav import ppo_config_from
from avlen_tpu.rl.trainers.base import METRIC_BLACKLIST, BaseRLTrainer
from avlen_tpu.sim.builder import construct_batched_env
from avlen_tpu.utils.checkpoint import merge_matching_params, save_checkpoint
from avlen_tpu.utils.logging import logger
from avlen_tpu.utils.platform import pallas_smt_enabled
from avlen_tpu.utils.tb import TensorboardWriter


@registry.register_trainer(name="savi")
class SaviTrainer(BaseRLTrainer):
    def __init__(self, config):
        super().__init__(config)

    # ------------------------------------------------------------------
    def _setup(self, num_envs: Optional[int] = None):
        cfg = self.config
        self.ppo_cfg = ppo_config_from(cfg)
        self.num_steps = cfg.RL.PPO.num_steps
        smt_cfg = cfg.RL.PPO.SCENE_MEMORY_TRANSFORMER
        bp_cfg = cfg.RL.PPO.BELIEF_PREDICTOR
        self.env = construct_batched_env(
            cfg, num_envs=num_envs, with_depth=True, with_rgb=True,
            extra_sensors=("category_belief", "location_belief", "category"),
        )
        b = self.env.num_envs
        self.memory_size = smt_cfg.memory_size

        self.policy = SMTPolicy(
            net=AudioNavSMTNet(
                spectrogram_hw=self.env.spec_config.out_shape[:2],
                num_actions=len(cfg.TASK_CONFIG.TASK.POSSIBLE_ACTIONS),
                d_model=smt_cfg.hidden_size,
                nhead=smt_cfg.nhead,
                use_rgb="rgb" in self.env.config.sensors,
                use_depth="depth" in self.env.config.sensors,
                use_belief_as_goal=cfg.RL.PPO.use_belief_predictor or smt_cfg.pretraining,
                use_label_belief=bp_cfg.use_label_belief,
                use_location_belief=bp_cfg.use_location_belief,
                normalize_category_distribution=bp_cfg.normalize_category_distribution,
                pretraining=smt_cfg.pretraining,
                dtype=self.compute_dtype(),
                smt_fused=pallas_smt_enabled(cfg.TPU.PALLAS_SMT),
            )
        )
        self.use_belief_predictor = cfg.RL.PPO.use_belief_predictor
        self.feature_size = self.policy.net.feature_size

        key = jax.random.key(cfg.SEED)
        state, obs = self.env.reset()
        mem = init_memory(b, self.memory_size, self.feature_size)
        prev_a = jnp.zeros((b,), jnp.int32)
        if "category_belief" not in obs:
            obs["category_belief"] = jnp.zeros((b, 21), jnp.float32)
            obs["location_belief"] = jnp.zeros((b, 2), jnp.float32)
        self.params = self.policy.init(
            key, obs, prev_a, mem.features, mem.valid, key, method=SMTPolicy.act
        )

        # cross-stage pretrained weight transfer (reference: DDPPO.pretrained
        # + pretrained_weights, or SMT use_pretrained + pretrained_path —
        # ddppo_trainer.py:244-280 / ppo_trainer.py:301-513 filtered load);
        # stage nets differ in heads, so merge matching subtrees only
        pretrained_path = ""
        if cfg.RL.DDPPO.pretrained and cfg.RL.DDPPO.pretrained_weights:
            pretrained_path = cfg.RL.DDPPO.pretrained_weights
        elif smt_cfg.use_pretrained and smt_cfg.pretrained_path:
            pretrained_path = smt_cfg.pretrained_path
        if pretrained_path and not os.path.exists(pretrained_path):
            # the reference's torch.load fails loudly on a typo'd path; a
            # silent skip would invalidate a staged recipe from scratch
            raise FileNotFoundError(
                f"configured pretrained weights not found: {pretrained_path}"
            )
        if pretrained_path:
            ckpt = self.load_checkpoint(pretrained_path)
            self.params, copied, skipped = merge_matching_params(
                self.params, ckpt["state_dict"]
            )
            logger.info(
                f"loaded pretrained weights from {pretrained_path}: "
                f"{len(copied)} tensors copied, {len(skipped)} kept fresh"
            )

        self.belief_net = None
        self.belief_params = None
        if self.use_belief_predictor:
            self.belief_net = BeliefPredictorNet(
                predict_label=bp_cfg.use_label_belief,
                predict_location=bp_cfg.use_location_belief,
                has_distractor_sound=self.env.config.has_distractor,
                dtype=self.compute_dtype(),
            )
            self.belief_params = self.belief_net.init(
                jax.random.fold_in(key, 1), obs["spectrogram"], obs.get("category")
            )
            if bp_cfg.pretrained_path and not os.path.exists(bp_cfg.pretrained_path):
                raise FileNotFoundError(
                    f"configured belief predictor weights not found: {bp_cfg.pretrained_path}"
                )
            if bp_cfg.pretrained_path:
                # offline-pretrained belief predictor (reference loads it in
                # _setup_actor_critic_agent, ppo_trainer.py:150-170)
                ckpt = self.load_checkpoint(bp_cfg.pretrained_path)
                self.belief_params, bcopied, _ = merge_matching_params(
                    self.belief_params, ckpt["state_dict"]
                )
                logger.info(
                    f"loaded belief predictor from {bp_cfg.pretrained_path} ({len(bcopied)} tensors)"
                )
            if bp_cfg.online_training:
                self.belief_optimizer = optax.adam(bp_cfg.lr)
                self.belief_opt_state = self.belief_optimizer.init(self.belief_params)

        self.optimizer = make_optimizer(self.ppo_cfg)
        self.opt_state = self.optimizer.init(self.params)
        self.carry = SMTCarry(
            env_state=state,
            obs=obs,
            prev_action=prev_a,
            masks=jnp.zeros((b,), jnp.float32),
            memory=mem,
            belief=init_belief_state(b),
            key=key,
        )
        self.mesh = self._make_train_mesh(b)
        self._build_jits()

    # ------------------------------------------------------------------
    def _build_jits(self):
        policy, env = self.policy, self.env
        num_steps, ppo_cfg, optimizer = self.num_steps, self.ppo_cfg, self.optimizer
        bp_cfg = self.config.RL.PPO.BELIEF_PREDICTOR
        smt_cfg = self.config.RL.PPO.SCENE_MEMORY_TRANSFORMER
        belief_net = self.belief_net

        def collect(params, belief_params, carry, deterministic=False, n=None):
            def act(obs, pa, mf, mv, key):
                return policy.apply(params, obs, pa, mf, mv, key, deterministic, method=SMTPolicy.act)

            def val(obs, pa, mf, mv):
                return policy.apply(params, obs, pa, mf, mv, method=SMTPolicy.get_value)

            belief_fn = None
            if belief_net is not None:
                def belief_fn(state, obs, new_ep):
                    return update_beliefs(
                        belief_params, belief_net, state, obs, new_ep,
                        weighting_factor=bp_cfg.weighting_factor,
                        current_pred_only=bp_cfg.current_pred_only,
                    )

            return collect_rollout_smt(
                env._step_impl_noquery, act, val, belief_fn, carry,
                num_steps if n is None else n,
            )

        def collect_bound(consts, params, belief_params, carry, deterministic=False, n=None):
            with env.binder.bind(consts):
                return collect(params, belief_params, carry, deterministic, n)

        self._chunked = None
        if getattr(env, "host_prefetcher", None) is not None:
            # callback-free host audio path: rollouts run as chunked scans
            # with host RIR prefetch between chunks (parallel/chunked.py)
            from avlen_tpu.parallel.chunked import ChunkedCollector, resolve_chunk

            chunk = resolve_chunk(
                num_steps, self.config.TPU.ROLLOUT_CHUNK or max(1, num_steps // 6)
            )
            self._chunked = ChunkedCollector(
                env.host_prefetcher, env.binder, chunk, num_steps
            )
            self._chunk_len = chunk
            collect_chunk_jit = jax.jit(
                functools.partial(collect_bound, n=chunk),
                static_argnames=("deterministic",),
            )

            def chunked_eval_collect(consts, params, belief_params, carry, deterministic=False):
                carry, batch, _ = self._chunked.run(
                    lambda c, cr: collect_chunk_jit(
                        c, params, belief_params, cr, deterministic=deterministic
                    ),
                    carry, consts,
                )
                return carry, batch

            self._collect = chunked_eval_collect
        else:
            self._collect = jax.jit(collect_bound, static_argnames=("deterministic",))

        online_belief = belief_net is not None and bp_cfg.online_training
        belief_optimizer = self.belief_optimizer if online_belief else None
        location_targets = self._location_targets

        def belief_train_step(belief_params, opt_state, batch, grad_reduce):
            """MSE location regression on rollout steps with audio
            (train_belief_predictor, ppo_trainer.py:959-1032)."""
            t, b = batch.actions.shape
            spec = batch.obs["spectrogram"].reshape(
                (t * b,) + batch.obs["spectrogram"].shape[2:]
            )
            cat = batch.obs.get("category")
            cat = cat.reshape((t * b, -1)) if cat is not None else None
            target = location_targets(batch).reshape(t * b, 2)
            weights = (jnp.abs(spec).sum(axis=(1, 2, 3)) != 0).astype(jnp.float32)

            def loss_fn(p):
                loc, _ = belief_net.apply(p, spec, cat)
                err = ((loc - target) ** 2).sum(-1) * weights
                return err.sum() / jnp.maximum(weights.sum(), 1.0)

            loss, grads = jax.value_and_grad(loss_fn)(belief_params)
            grads = grad_reduce(grads)
            updates, opt_state = belief_optimizer.update(grads, opt_state, belief_params)
            return optax.apply_updates(belief_params, updates), opt_state, loss

        # one (rollout → GAE → PPO [→ belief MSE]) superstep; multi-chip runs
        # it under shard_map with pmean gradient sync (parallel/ddppo.py)
        def collect_ts(train_state, carry, n=None):
            params, _, belief_params, _ = train_state
            return collect(params, belief_params, carry, n=n)

        def update_ts(train_state, batch, key, grad_reduce):
            params, opt_state, belief_params, belief_opt = train_state
            adv, ret = compute_gae(
                batch.rewards, batch.values, batch.bootstrap_value,
                1.0 - batch.dones.astype(jnp.float32), ppo_cfg.gamma, ppo_cfg.tau,
            )

            def evaluate_actions(p, obs, init_mem, masks, actions):
                # freeze_encoders (savi.yaml:45, policy.py:646-656): the
                # stored rollout features ARE the frozen towers' outputs, so
                # re-eval skips the towers and grads reach only SMT + heads
                method = (
                    SMTPolicy.evaluate_step_frozen
                    if smt_cfg.freeze_encoders
                    else SMTPolicy.evaluate_step
                )

                def eval_step(o, pa, mf, mv, a):
                    return policy.apply(p, o, pa, mf, mv, a, method=method)

                if smt_cfg.batched_eval:
                    return evaluate_sequence_smt_batched(
                        eval_step, obs, init_mem, masks, actions,
                        chunk=smt_cfg.batched_eval_chunk,
                        compute_dtype=self.compute_dtype(),
                    )
                return evaluate_sequence_smt(eval_step, obs, init_mem, masks, actions)

            params, opt_state, stats = ppo_update(
                params, opt_state, batch, adv, ret, key, evaluate_actions,
                optimizer, ppo_cfg, grad_reduce=grad_reduce,
            )
            if online_belief:
                belief_params, belief_opt, bloss = belief_train_step(
                    belief_params, belief_opt, batch, grad_reduce
                )
                stats = dict(stats, belief_loss=bloss)
            return (params, opt_state, belief_params, belief_opt), stats

        from avlen_tpu.parallel.ddppo import (
            make_local_superstep,
            make_sharded_superstep,
            shard_pytree,
        )

        self._collect_ts, self._update_ts = collect_ts, update_ts  # ablation timing
        if self._chunked is not None:
            from avlen_tpu.parallel.chunked import make_chunked_superstep

            self._superstep, carry_spec = make_chunked_superstep(
                collect_ts, update_ts, self._train_state(), self.carry,
                self.mesh, num_steps, self._chunk_len,
                binder=env.binder, collector=self._chunked,
            )
            if carry_spec is not None:
                self.carry = shard_pytree(self.carry, carry_spec, self.mesh)
        elif self.mesh is not None:
            train_state_ex = self._train_state()
            self._superstep, carry_spec = make_sharded_superstep(
                collect_ts, update_ts, train_state_ex, self.carry,
                self.mesh, num_steps, binder=env.binder,
                donate=self._donate_rollouts(),
            )
            self.carry = shard_pytree(self.carry, carry_spec, self.mesh)
        else:
            self._superstep = make_local_superstep(
                collect_ts, update_ts, binder=env.binder, donate=self._donate_rollouts()
            )

        if self._chunked is not None:
            # the reset's _observe ran against an empty RIR cache — prefetch
            # the standing pairs and recompute the initial observations
            consts = self._chunked.prime(self.carry.env_state)
            obs = dict(env._observe_jit(consts, self.carry.env_state))
            for k, v in self.carry.obs.items():
                obs.setdefault(k, v)  # belief slots injected at setup
            self.carry = self.carry._replace(obs=obs)

    def _train_state(self):
        return (
            self.params,
            self.opt_state,
            self.belief_params,
            getattr(self, "belief_opt_state", None),
        )

    def _set_train_state(self, train_state) -> None:
        self.params, self.opt_state, self.belief_params, belief_opt = train_state
        if belief_opt is not None:
            self.belief_opt_state = belief_opt

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
        from avlen_tpu.utils.profiling import Timings

        preemption.register_signal_handlers()
        timings = Timings()

        resume = self.try_to_resume()
        if resume is not None:
            self.params = jax.tree.map(jnp.asarray, resume["state_dict"])
            if "belief_predictor" in resume and self.belief_params is not None:
                self.belief_params = jax.tree.map(jnp.asarray, resume["belief_predictor"])
            if "optim_state" in resume:
                self.opt_state = restore_into(self.opt_state, resume["optim_state"])
            if "belief_optim_state" in resume and hasattr(self, "belief_opt_state"):
                self.belief_opt_state = restore_into(
                    self.belief_opt_state, resume["belief_optim_state"]
                )
            self.num_steps_done = int(resume.get("extra_state", {}).get("step", 0))
            ckpt_count = int(resume.get("_resume_index", 0))

        train_state = self._train_state()
        with TensorboardWriter(cfg.TENSORBOARD_DIR) as writer:
            for update in range(cfg.NUM_UPDATES):
                if preemption.should_exit():
                    # interrupted-state save + requeue (ddp_utils.py:70-122,
                    # trainer hook ddppo_trainer.py:846-870)
                    self._set_train_state(train_state)
                    preemption.save_interrupted_state(self._checkpoint_payload())
                    preemption.requeue_job()
                    return
                key, sub = jax.random.split(key)
                with timings.time("superstep_time"):
                    train_state, self.carry, batch, stats = self._superstep(
                        train_state, self.carry, sub, self.env.consts
                    )
                    self._set_train_state(train_state)
                    jax.block_until_ready(stats["value_loss"])
                self.carry = self._refresh_episode_stream(self.carry)

                with timings.time("host_time"):
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
                self.num_steps_done += rewards.size
                self.num_updates_done += 1

                if update % cfg.LOG_INTERVAL == 0:
                    fps = self.num_steps_done / max(time.time() - t_start, 1e-6)
                    # the SPMD superstep fuses rollout+update into one device
                    # program, so the reference's env_time/pth_time split
                    # (ddppo_trainer.py:1161-1175) becomes device vs host time
                    logger.info(
                        f"savi update {update} fps {fps:.1f} frames {self.num_steps_done} "
                        + timings.summary()
                    )
                    if window:
                        means = {k: float(np.mean([w[k] for w in window])) for k in window[0]}
                        logger.info(
                            "window reward {:.3f} success {:.3f} spl {:.3f}".format(
                                means.get("reward", 0), means.get("success", 0), means.get("spl", 0)
                            )
                        )
                        for k, v in means.items():
                            writer.add_scalar(f"Metrics/{k}", v, self.num_steps_done)
                    for k, v in stats.items():
                        writer.add_scalar(f"Policy/{k}", float(v), self.num_steps_done)

                # every CHECKPOINT_INTERVAL *updates*, like the reference
                # (ddppo_trainer.py:1191, update % CHECKPOINT_INTERVAL == 0)
                if (update + 1) % cfg.CHECKPOINT_INTERVAL == 0 or update + 1 == cfg.NUM_UPDATES:
                    self.save_checkpoint(f"ckpt.{ckpt_count}.pth")
                    ckpt_count += 1

    def _location_targets(self, batch) -> jnp.ndarray:
        """Ground-truth goal location in the agent's base frame for belief
        regression. The stored pose gives the agent's episodic pose; the
        location belief target is the goal direction in the same frame."""
        # location_belief target = gt pointgoal in agent frame; approximate via
        # stored oracle distance direction: use pose-relative goal from env
        # metrics (distance_to_goal along oracle next step is not directional),
        # so fall back to the stored location_belief if present else zeros.
        obs = batch.obs
        if "pointgoal_with_gps_compass" in obs:
            return obs["pointgoal_with_gps_compass"]
        # training the location head against zeros would silently corrupt the
        # belief predictor — require the sensor when the head is on
        raise ValueError(
            "BELIEF_PREDICTOR.use_location_belief online training requires the "
            "POINTGOAL_WITH_GPS_COMPASS_SENSOR in TASK.SENSORS (no ground-truth "
            "goal direction available for the regression target)"
        )

    def _checkpoint_payload(self) -> Dict:
        payload = {
            "state_dict": self.params,
            "optim_state": self.opt_state,
            "config": self.config.to_dict(),
            "extra_state": {"step": self.num_steps_done},
        }
        if self.belief_params is not None:
            payload["belief_predictor"] = self.belief_params
        if hasattr(self, "belief_opt_state"):
            payload["belief_optim_state"] = self.belief_opt_state
        return payload

    def save_checkpoint(self, name: str) -> None:
        save_checkpoint(self.config.CHECKPOINT_FOLDER, name, self._checkpoint_payload())

    # ------------------------------------------------------------------
    def _eval_checkpoint(self, checkpoint_path: str, writer, checkpoint_index: int = 0) -> Dict[str, float]:
        ckpt = self.load_checkpoint(checkpoint_path)
        self.reconfigure_from_checkpoint(ckpt)
        params = jax.tree.map(jnp.asarray, ckpt["state_dict"])
        belief_params = (
            jax.tree.map(jnp.asarray, ckpt["belief_predictor"])
            if "belief_predictor" in ckpt and self.use_belief_predictor
            else self.belief_params
        )
        from avlen_tpu.rl.trainers.base import METRIC_BLACKLIST, eval_episode_accounting, exact_once_deal

        # exactly-once protocol: each episode of the eval split is counted
        # once, keyed by its packed index (reference: every episode runs once
        # with pause-on-done, base_trainer.py:185-289)
        num_episodes = int(self.env.eps["scene"].shape[0])
        count = min(self.config.TEST_EPISODE_COUNT, num_episodes)
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
        stats: Dict[str, list] = collections.defaultdict(list)
        if "category_belief" not in obs:
            obs["category_belief"] = jnp.zeros((b, 21), jnp.float32)
            obs["location_belief"] = jnp.zeros((b, 2), jnp.float32)
        carry = SMTCarry(
            env_state=state, obs=obs,
            prev_action=jnp.zeros((b,), jnp.int32),
            masks=jnp.zeros((b,), jnp.float32),
            memory=init_memory(b, self.memory_size, self.feature_size),
            belief=init_belief_state(b),
            key=jax.random.key(self.config.SEED + 11),
        )
        seen: set = set()
        max_rollouts = self.eval_rollout_budget(num_episodes, b, self.env.config.max_episode_steps)
        videos_made = 0
        for _ in range(max_rollouts):
            if len(seen) >= count:
                break
            # the reference eval SAMPLES the goal policy (ppo_trainer.py:1960
            # deterministic=False): an argmax policy cycles on graph worlds
            # and never reaches the goal; sampling is the published protocol
            carry, batch = self._collect(consts, params, belief_params, carry, deterministic=False)
            if videos_made < 2:
                videos_made += self.generate_eval_videos(
                    batch.dones, batch.masks, batch.metrics, writer, checkpoint_index
                )
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
        means.update(eval_episode_accounting(seen, count, "savi"))
        logger.info(f"savi eval ckpt {checkpoint_index}: " + ", ".join(f"{k}={v:.3f}" for k, v in means.items()))
        for k, v in means.items():
            writer.add_scalar(f"val/{k}", v, checkpoint_index)
        return means

"""AVLEN interactive trainer (registered "ddppo").

Capability match for DDPPOTrainer (ss_baselines/savi/ddppo/algo/
ddppo_trainer.py:62-1200) across its policy types:

* ``policy_type: dialog`` — π_l pretraining: oracle-driven rollouts with
  per-window instructions, class-weighted CE updates
  (_setup_actor_critic_agent, ddppo_trainer.py:181-298).
* ``policy_type: interactive`` — full AVLEN: π_g (AudioNavSMTPolicy, frozen
  from GOAL_CKPT), π_l (AudioNavDialogPolicy from DIALOG_CKPT), π_q
  (AudioNavOptionPolicy) trained by rl_mask-gated PPO + uncertainty CE,
  with interleaved π_l replay updates when REPLAY_STORE
  (_setup_actor_critic_agent_interactive, ddppo_trainer.py:301-513;
  train(), :515-1200).

TPU-native: the whole interactive rollout runs as one scan with a
precomputed oracle-instruction token bank (rl/rollout_interactive.py) — no
TCPStore, no DDP hooks, no straggler preemption (SPMD lockstep); multi-chip
scale-out uses the same jits under shard_map (parallel/ddppo.py pattern).
Query-behavior stats (query count / ratio / 1st & 4th query step,
per-policy reward/step splits — ddppo_trainer.py:1099-1158) are aggregated
from the stacked trajectory.
"""

from __future__ import annotations

import collections
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from avlen_tpu.core.registry import registry
from avlen_tpu.dialog.instruction_source import (
    resolve_instruction_source,
    sub_instr_token_bank,
)
from avlen_tpu.models.belief_predictor import (
    BeliefPredictorNet,
    init_belief_state,
    update_beliefs,
)
from avlen_tpu.models.dialog_policy import AudioNavDialogNet, DialogPolicy
from avlen_tpu.models.memory import init_memory
from avlen_tpu.models.option_policy import AudioNavOptionNet, OptionPolicy
from avlen_tpu.models.smt_policy import AudioNavSMTNet, SMTPolicy
from avlen_tpu.rl.gae import compute_gae
from avlen_tpu.rl.ppo import make_optimizer
from avlen_tpu.rl.ppo_interactive import (
    dialog_supervised_update,
    ppo_update_interactive,
)
from avlen_tpu.rl.rollout_interactive import (
    InteractiveCarry,
    InteractiveConfig,
    InteractiveFns,
    collect_rollout_dialog_pretrain,
    collect_rollout_interactive,
    init_query_track,
    sinusoidal_pe,
)
from avlen_tpu.rl.trainers.avnav import ppo_config_from
from avlen_tpu.rl.trainers.base import METRIC_BLACKLIST, BaseRLTrainer
from avlen_tpu.sim.builder import construct_batched_env
from avlen_tpu.utils.checkpoint import save_checkpoint
from avlen_tpu.utils.logging import logger
from avlen_tpu.utils.platform import pallas_smt_enabled
from avlen_tpu.utils.tb import TensorboardWriter


@registry.register_trainer(name="ddppo")
class InteractiveDDPPOTrainer(BaseRLTrainer):
    def __init__(self, config):
        super().__init__(config)
        self._delegate = None
        if config.RL.PPO.policy_type in ("rnn", "smt") and not config.DIALOG_TRAINING:
            # plain (non-dialog) distributed training delegates to the SAVi
            # trainer path (reference DDPPOTrainer policy_type rnn/smt,
            # ddppo_trainer.py:92-180); multi-chip scale-out of the same jits
            # goes through parallel/ddppo.make_ddppo_step
            from avlen_tpu.rl.trainers.savi import SaviTrainer

            self._delegate = SaviTrainer(config)
            return

    # ------------------------------------------------------------------
    def _setup(self, num_envs: Optional[int] = None):
        cfg = self.config
        self.ppo_cfg = ppo_config_from(cfg)
        self.num_steps = cfg.RL.PPO.num_steps
        self.policy_type = cfg.RL.PPO.policy_type
        smt_cfg = cfg.RL.PPO.SCENE_MEMORY_TRANSFORMER
        bp_cfg = cfg.RL.PPO.BELIEF_PREDICTOR

        self.env = construct_batched_env(
            cfg, num_envs=num_envs, with_depth=True, with_rgb=True,
            extra_sensors=("category_belief", "location_belief", "category"),
        )
        b = self.env.num_envs
        spec_hw = self.env.spec_config.out_shape[:2]
        num_actions = len(cfg.TASK_CONFIG.TASK.POSSIBLE_ACTIONS)
        d_model = smt_cfg.hidden_size
        key = jax.random.key(cfg.SEED)

        # oracle-instruction source (SPEAKER config): a precomputed token
        # bank (small worlds; banked on the env binder so it enters jits as
        # an argument, not a literal), a per-query host-speaker callback
        # (large scenes, callback-capable backends), or — on the chunked
        # host-prefetch audio path — the chunk-boundary prefetched token
        # cache (dialog/instr_prefetch.py, the real-Matterport route on
        # io_callback-less backends)
        chunk_capable = getattr(self.env, "host_prefetcher", None) is not None
        bank, self.instr_source = resolve_instruction_source(
            cfg, self.env.scene_tables,
            rgb_bank=self.env.bank.rgb if cfg.SPEAKER.USE_PANO_FEATURES else None,
            allow_cached=chunk_capable,
        )
        self.instr_prefetcher = None
        from avlen_tpu.dialog.instruction_source import (
            CachedInstrRequest,
            HostSpeakerInstructionSource,
        )

        if isinstance(self.instr_source, CachedInstrRequest):
            from avlen_tpu.dialog.instr_prefetch import (
                CachedInstrSource,
                HostInstrPrefetcher,
            )

            host_lookup = HostSpeakerInstructionSource(
                self.instr_source.speaker, self.env.scene_tables
            )
            self.instr_prefetcher = HostInstrPrefetcher(
                host_lookup._lookup,
                np.asarray(self.env.bank.tables["hops"]),
                {k: np.asarray(v) for k, v in self.env.eps.items()},
                capacity=int(cfg.SPEAKER.CACHE_SLOTS),
            )
            self.env.binder.add("instr_cache", self.instr_prefetcher.make_cache())
            self.instr_source = CachedInstrSource(
                self.env.binder, self.instr_prefetcher.n_max
            )
        self.instr_bank = jnp.asarray(bank) if bank is not None else None
        self.pe_table = jnp.asarray(sinusoidal_pe(151, cfg.QUERY_COUNT_EMB_SIZE))
        if self.instr_bank is not None:
            self.env.binder.add("instr_bank", self.instr_bank)
        self.env.binder.add("pe_table", self.pe_table)
        # per-episode dataset instructions for π_l pretraining (the dialog
        # datasets' sub_instr, tokenized once — ppo_trainer.py:354-369)
        sub_bank = sub_instr_token_bank(getattr(self.env, "episodes", []))
        self.sub_instr_bank = jnp.asarray(sub_bank) if sub_bank is not None else None
        if self.sub_instr_bank is not None:
            self.env.binder.add("sub_instr_bank", self.sub_instr_bank)

        common = dict(
            spectrogram_hw=spec_hw,
            num_actions=num_actions,
            d_model=d_model,
            nhead=smt_cfg.nhead,
            use_rgb="rgb" in self.env.config.sensors,
            use_depth="depth" in self.env.config.sensors,
            use_label_belief=bp_cfg.use_label_belief,
            use_location_belief=bp_cfg.use_location_belief,
            pretraining=smt_cfg.pretraining,
            dtype=self.compute_dtype(),
            smt_fused=pallas_smt_enabled(cfg.TPU.PALLAS_SMT),
        )
        self.goal_policy = SMTPolicy(net=AudioNavSMTNet(use_belief_as_goal=True, **common))
        self.dialog_policy = DialogPolicy(
            net=AudioNavDialogNet(
                clip_width=cfg.RL.PPO.CLIP_WIDTH, clip_layers=cfg.RL.PPO.CLIP_LAYERS, **common
            )
        )
        self.option_policy = OptionPolicy(
            net=AudioNavOptionNet(query_count_emb_size=cfg.QUERY_COUNT_EMB_SIZE, **common)
        )

        state, obs = self.env.reset()
        if "category_belief" not in obs:
            obs["category_belief"] = jnp.zeros((b, 21), jnp.float32)
            obs["location_belief"] = jnp.zeros((b, 2), jnp.float32)
        self.memory_size = smt_cfg.memory_size
        self.feat_goal_size = self.goal_policy.net.feature_size
        self.feat_option_size = self.option_policy.net.feature_size
        prev_a = jnp.zeros((b,), jnp.int32)
        mem_g = init_memory(b, self.memory_size, self.feat_goal_size)
        mem_o = init_memory(b, self.memory_size, self.feat_option_size)
        mem_v = init_memory(b, cfg.NUM_DIALOG_STEPS, self.feat_goal_size)
        mem_vd = init_memory(b, cfg.NUM_DIALOG_STEPS, d_model)
        zeros_qs = jnp.zeros((b, cfg.QUERY_COUNT_EMB_SIZE))
        dialog0 = jnp.zeros((b, 77), jnp.int32)
        step0 = jnp.zeros((b,), jnp.int32)

        self.params_goal = self.goal_policy.init(
            key, obs, prev_a, mem_g.features, mem_g.valid, key, method=SMTPolicy.act
        )
        self.params_dialog = self.dialog_policy.init(
            jax.random.fold_in(key, 1), obs, prev_a, mem_v.features, mem_v.valid,
            mem_vd.features, mem_vd.valid, dialog0, step0, key, method=DialogPolicy.act,
        )
        self.params_option = self.option_policy.init(
            jax.random.fold_in(key, 2), obs, prev_a, mem_o.features, mem_o.valid,
            zeros_qs, zeros_qs, key, method=OptionPolicy.act,
        )

        # load pretrained towers (ddppo_trainer.py:244-280, 301-513)
        if cfg.GOAL_CKPT_PATH and os.path.exists(cfg.GOAL_CKPT_PATH):
            ckpt = self.load_checkpoint(cfg.GOAL_CKPT_PATH)
            self.params_goal = jax.tree.map(jnp.asarray, ckpt["state_dict"])
            logger.info(f"loaded goal policy from {cfg.GOAL_CKPT_PATH}")
        if cfg.VLN_CKPT_PATH and os.path.exists(cfg.VLN_CKPT_PATH):
            ckpt = self.load_checkpoint(cfg.VLN_CKPT_PATH)
            self.params_dialog = jax.tree.map(jnp.asarray, ckpt["state_dict"])
            logger.info(f"loaded dialog policy from {cfg.VLN_CKPT_PATH}")

        self.use_belief_predictor = cfg.RL.PPO.use_belief_predictor
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
                jax.random.fold_in(key, 3), obs["spectrogram"], obs.get("category")
            )
            if bp_cfg.pretrained_path and os.path.exists(bp_cfg.pretrained_path):
                ckpt = self.load_checkpoint(bp_cfg.pretrained_path)
                self.belief_params = jax.tree.map(jnp.asarray, ckpt["state_dict"])

        # optimizers: π_q PPO Adam; π_l Adam lr 1e-5 (ppo.py:62-63)
        self.optimizer_q = make_optimizer(self.ppo_cfg)
        self.opt_state_q = self.optimizer_q.init(self.params_option)
        self.optimizer_l = optax.adam(1e-5, eps=self.ppo_cfg.eps)
        self.opt_state_l = self.optimizer_l.init(self.params_dialog)

        self.interactive_cfg = InteractiveConfig(
            num_dialog_steps=cfg.NUM_DIALOG_STEPS,
            num_total_query=cfg.RL.NUM_TOTAL_QUERY,
            consecutive_reward=cfg.RL.CONSECUTIVE_REWARD,
            query_within_radius=cfg.QUERY_WITHIN_RADIUS,
            oracle_when_queried=cfg.ORACLE_WHEN_QUERIED,
            allow_stop=cfg.ALLOW_STOP,
            with_distance_constraint=cfg.RL.WITH_DISTANCE_CONSTRAINT,
            distance_distribution_type=cfg.RL.DISTANCE_DISTRIBUTION_TYPE,
            dist_mean=cfg.RL.MEAN,
            dist_sd=cfg.RL.SD,
            dist_alpha=cfg.RL.ALPHA,
            dist_beta=cfg.RL.BETA,
        )

        self.carry = InteractiveCarry(
            env_state=state,
            obs=obs,
            prev_action=prev_a,
            masks=jnp.zeros((b,), jnp.float32),
            masks_vln=jnp.zeros((b,), jnp.float32),
            mem_goal=mem_g,
            mem_option=mem_o,
            mem_vln=mem_v,
            mem_vln_dialog=mem_vd,
            belief=init_belief_state(b),
            # clip_width = CLIPTextEncoder.embed_dim (the text-projection
            # output, fixed 512) -- NOT RL.PPO.CLIP_WIDTH (the tower width)
            track=init_query_track(b),
            key=key,
        )
        self.mesh = self._make_train_mesh(b)
        self._build_jits()

    # ------------------------------------------------------------------
    def _build_jits(self):
        cfg = self.config
        env = self.env
        goal_p, dialog_p, option_p = self.goal_policy, self.dialog_policy, self.option_policy
        belief_net = self.belief_net
        bp_cfg = cfg.RL.PPO.BELIEF_PREDICTOR
        icfg = self.interactive_cfg
        binder = env.binder
        num_steps = self.num_steps

        def make_fns(pg, pd, po, pb, deterministic=False):
            # the reference's EVAL protocol SAMPLES pi_g and pi_q
            # (ppo_trainer.py:1940,1960 deterministic=False — argmax policies
            # cycle on graph worlds and never reach the goal) and takes
            # argmax only for pi_l (act_dialog deterministic=True, :1917);
            # `deterministic` here is therefore eval-mode: it switches the
            # eval query config below and pi_l's argmax, never pi_g/pi_q.
            def act_option(obs, pa, mf, mv, qs, lqi, key):
                return option_p.apply(po, obs, pa, mf, mv, qs, lqi, key, False, method=OptionPolicy.act)

            def act_goal(obs, pa, mf, mv, key):
                return goal_p.apply(pg, obs, pa, mf, mv, key, False, method=SMTPolicy.act)

            def act_dialog(obs, pa, mf, mv, smf, smv, dialog, step, key, dclip=None):
                return dialog_p.apply(
                    pd, obs, pa, mf, mv, smf, smv, dialog, step, key, deterministic,
                    dialog_clip=dclip, method=DialogPolicy.act
                )

            def clip_embed(tokens):
                return dialog_p.apply(pd, tokens, method=DialogPolicy.clip_embed)

            def value_option(obs, pa, mf, mv, qs, lqi):
                _, _, v, _, _, _ = option_p.apply(
                    po, obs, pa, mf, mv, qs, lqi, jax.random.key(0), True, method=OptionPolicy.act
                )
                return v

            belief_fn = None
            if belief_net is not None:
                def belief_fn(state, obs, new_ep):
                    return update_beliefs(
                        pb, belief_net, state, obs, new_ep,
                        weighting_factor=bp_cfg.weighting_factor,
                        current_pred_only=bp_cfg.current_pred_only,
                    )

            return InteractiveFns(
                act_option=act_option,
                act_goal=act_goal,
                act_dialog=act_dialog,
                value_option=value_option,
                oracle_action=env.oracle_action,
                env_step=env._step_impl,
                belief_fn=belief_fn,
                clip_embed=clip_embed,
            )

        instr_source = self.instr_source

        def instr_bank_or_source():
            # banked worlds read the bound token tensor; large worlds use
            # the host-speaker callback source (no O(N^2) bank exists)
            return instr_source if instr_source is not None else binder.get("instr_bank")

        def collect(pg, pd, po, pb, carry, deterministic=False, n=None):
            import dataclasses as _dc

            fns = make_fns(pg, pd, po, pb, deterministic)
            c = icfg if not deterministic else _dc.replace(
                icfg, qs_method=cfg.QS_METHOD, limit_query=cfg.LIMIT_QUERY,
                how_many_query=cfg.HOW_MANY_QUERY, enforced_gap=cfg.ENFORCED_GAP,
            )
            return collect_rollout_interactive(
                fns, carry, instr_bank_or_source(), binder.get("pe_table"), c,
                num_steps if n is None else n,
            )

        def update_q(po, opt_state, traj, key, grad_reduce=lambda g: g):
            adv, ret = compute_gae(
                traj["rewards"], traj["values_option"], traj["bootstrap_value"],
                1.0 - traj["dones"].astype(jnp.float32), self.ppo_cfg.gamma, self.ppo_cfg.tau,
            )

            def evaluate_step(p, obs, pa, mf, mv, qs, lqi, actions):
                return option_p.apply(p, obs, pa, mf, mv, qs, lqi, actions, method=OptionPolicy.evaluate_step)

            smt_cfg = cfg.RL.PPO.SCENE_MEMORY_TRANSFORMER
            return ppo_update_interactive(
                po, opt_state, traj, adv, ret, key, evaluate_step,
                self.optimizer_q, self.ppo_cfg, unct_coef=cfg.RL.PPO.unct_coef,
                grad_reduce=grad_reduce,
                batched_chunk=smt_cfg.batched_eval_chunk if smt_cfg.batched_eval else 0,
                compute_dtype=self.compute_dtype(),
            )

        def update_l(pd, opt_state, traj, replay_only=True, grad_reduce=lambda g: g):
            def evaluate_step(p, obs, pa, mf, mv, smf, smv, dialog, step, actions,
                              dclip=None):
                # width-0 = "no stored embedding" sentinel (scan xs cannot
                # carry None): fall back to the in-call tower
                if dclip is not None and dclip.shape[-1] == 0:
                    dclip = None
                return dialog_p.apply(
                    p, obs, pa, mf, mv, smf, smv, dialog, step, actions,
                    dialog_clip=dclip, method=DialogPolicy.evaluate_step,
                )

            smt_cfg = cfg.RL.PPO.SCENE_MEMORY_TRANSFORMER
            return dialog_supervised_update(
                pd, opt_state, traj, evaluate_step, self.optimizer_l,
                replay_only=replay_only, grad_reduce=grad_reduce,
                batched_chunk=smt_cfg.batched_eval_chunk if smt_cfg.batched_eval else 0,
                compute_dtype=self.compute_dtype(),
            )

        have_sub_instr = self.sub_instr_bank is not None

        def collect_dialog(pd, pb, carry, n=None):
            fns = make_fns(self.params_goal, pd, self.params_option, pb)
            return collect_rollout_dialog_pretrain(
                fns.act_dialog, env._step_impl_noquery, env.oracle_action, fns.belief_fn,
                carry, instr_bank_or_source(), cfg.NUM_DIALOG_STEPS,
                num_steps if n is None else n,
                sub_instr_bank=binder.get("sub_instr_bank") if have_sub_instr else None,
                clip_embed=fns.clip_embed,
            )

        def collect_bound(consts, pg, pd, po, pb, carry, deterministic=False, n=None):
            with binder.bind(consts):
                return collect(pg, pd, po, pb, carry, deterministic, n=n)

        def collect_dialog_bound(consts, pd, pb, carry, n=None):
            with binder.bind(consts):
                return collect_dialog(pd, pb, carry, n=n)

        # chunked host-prefetch execution (parallel/chunked.py): rollouts run
        # as C-step scans with host RIR + speaker-instruction prefetch between
        # chunks — the real-Matterport route on io_callback-less backends
        self._chunked = None
        if getattr(env, "host_prefetcher", None) is not None:
            from avlen_tpu.parallel.chunked import (
                ChunkedCollector,
                combine_traj_dicts,
                resolve_chunk,
            )

            chunk = resolve_chunk(
                num_steps, cfg.TPU.ROLLOUT_CHUNK or max(1, num_steps // 6)
            )
            self._chunked = ChunkedCollector(
                env.host_prefetcher, binder, chunk, num_steps,
                instr_prefetcher=self.instr_prefetcher,
            )
            self._chunk_len = chunk
            import functools as _ft

            collect_chunk_jit = jax.jit(
                _ft.partial(collect_bound, n=chunk),
                static_argnames=("deterministic",),
            )

            def chunked_eval_collect(consts, pg, pd, po, pb, carry, deterministic=False):
                carry, traj, _ = self._chunked.run(
                    lambda c, cr: collect_chunk_jit(
                        c, pg, pd, po, pb, cr, deterministic=deterministic
                    ),
                    carry, consts,
                    metrics_of=lambda t: t["metrics"],
                    combine=combine_traj_dicts,
                )
                return carry, traj

            self._collect = chunked_eval_collect

            collect_dialog_chunk_jit = jax.jit(_ft.partial(collect_dialog_bound, n=chunk))

            def chunked_dialog_collect(consts, pd, pb, carry):
                carry, traj, _ = self._chunked.run(
                    lambda c, cr: collect_dialog_chunk_jit(c, pd, pb, cr),
                    carry, consts,
                    metrics_of=lambda t: t["metrics"],
                    combine=combine_traj_dicts,
                )
                return carry, traj

            self._collect_dialog = chunked_dialog_collect
        else:
            self._collect = jax.jit(collect_bound, static_argnames=("deterministic",))
            self._collect_dialog = jax.jit(collect_dialog_bound)
        self._update_l = jax.jit(update_l, static_argnames=("replay_only",))

        # full-AVLEN superstep (rollout → π_q PPO [→ π_l replay CE]); on a
        # multi-device mesh runs under shard_map with pmean gradient sync on
        # BOTH optimizers (parallel/ddppo.py), the analogue of the two DDP
        # wrappers agent/agent_vln (ddppo_trainer.py:583-585)
        replay_store = bool(cfg.REPLAY_STORE)

        def collect_ts(train_state, carry, n=None):
            pg, pd, po, pb, _, _ = train_state
            return collect(pg, pd, po, pb, carry, n=n)

        def update_ts(train_state, traj, key, grad_reduce):
            pg, pd, po, pb, opt_q, opt_l = train_state
            po, opt_q, stats = update_q(po, opt_q, traj, key, grad_reduce)
            if replay_store:
                pd, opt_l, dialog_loss = update_l(
                    pd, opt_l, traj, replay_only=True, grad_reduce=grad_reduce
                )
                stats = dict(stats, dialog_loss=dialog_loss)
            return (pg, pd, po, pb, opt_q, opt_l), stats

        # π_l dialog-pretraining superstep (oracle rollout → weighted CE)
        def collect_dialog_ts(train_state, carry, n=None):
            pd, _, pb = train_state
            return collect_dialog(pd, pb, carry, n=n)

        def update_dialog_ts(train_state, traj, key, grad_reduce):
            pd, opt_l, pb = train_state
            pd, opt_l, loss = update_l(
                pd, opt_l, traj, replay_only=False, grad_reduce=grad_reduce
            )
            return (pd, opt_l, pb), {"dialog_loss": loss}

        from avlen_tpu.parallel.ddppo import (
            make_local_superstep,
            make_sharded_superstep,
            shard_pytree,
        )

        dialog_mode = self.policy_type == "dialog" or cfg.DIALOG_TRAINING
        donate = self._donate_rollouts()
        if self._chunked is not None:
            from avlen_tpu.parallel.chunked import (
                combine_traj_dicts,
                make_chunked_superstep,
            )

            metrics_of = lambda t: t["metrics"]  # noqa: E731
            if dialog_mode:
                self._superstep_dialog, carry_spec = make_chunked_superstep(
                    collect_dialog_ts, update_dialog_ts, self._dialog_train_state(),
                    self.carry, self.mesh, num_steps, self._chunk_len,
                    binder=binder, collector=self._chunked,
                    metrics_of=metrics_of, combine=combine_traj_dicts,
                )
            else:
                self._superstep, carry_spec = make_chunked_superstep(
                    collect_ts, update_ts, self._train_state(), self.carry,
                    self.mesh, num_steps, self._chunk_len,
                    binder=binder, collector=self._chunked,
                    metrics_of=metrics_of, combine=combine_traj_dicts,
                )
            if carry_spec is not None:
                self.carry = shard_pytree(self.carry, carry_spec, self.mesh)
            # the reset's _observe ran against empty RIR/instruction caches —
            # prefetch the standing pairs and recompute the initial obs
            consts0 = self._chunked.prime(self.carry.env_state)
            obs0 = dict(env._observe_jit(consts0, self.carry.env_state))
            for k, v in self.carry.obs.items():
                obs0.setdefault(k, v)  # belief slots injected at setup
            self.carry = self.carry._replace(obs=obs0)
        elif self.mesh is not None:
            # eval_shape traces the rollout eagerly, so only build the
            # superstep for the active mode
            if dialog_mode:
                self._superstep_dialog, carry_spec = make_sharded_superstep(
                    collect_dialog_ts, update_dialog_ts, self._dialog_train_state(),
                    self.carry, self.mesh, num_steps, binder=binder, donate=donate,
                )
            else:
                self._superstep, carry_spec = make_sharded_superstep(
                    collect_ts, update_ts, self._train_state(), self.carry,
                    self.mesh, num_steps, binder=binder, donate=donate,
                )
            self.carry = shard_pytree(self.carry, carry_spec, self.mesh)
        else:
            self._superstep = make_local_superstep(
                collect_ts, update_ts, binder=binder, donate=donate
            )
            self._superstep_dialog = make_local_superstep(
                collect_dialog_ts, update_dialog_ts, binder=binder, donate=donate
            )

    def _train_state(self):
        return (
            self.params_goal, self.params_dialog, self.params_option,
            self.belief_params, self.opt_state_q, self.opt_state_l,
        )

    def _set_train_state(self, train_state) -> None:
        (
            self.params_goal, self.params_dialog, self.params_option,
            self.belief_params, self.opt_state_q, self.opt_state_l,
        ) = train_state

    def _dialog_train_state(self):
        return (self.params_dialog, self.opt_state_l, self.belief_params)

    # ------------------------------------------------------------------
    def train(self) -> None:
        if self._delegate is not None:
            self._delegate.train()
            return
        self.ensure_setup()
        if self.policy_type == "dialog" or self.config.DIALOG_TRAINING:
            self._train_dialog()
        else:
            self._train_interactive()

    def eval(self) -> None:
        if self._delegate is not None:
            self._delegate.eval()
        else:
            super().eval()

    def _train_interactive(self) -> None:
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
            self.params_option = jax.tree.map(jnp.asarray, resume["state_dict"])
            if "state_dict_goal" in resume:
                self.params_goal = jax.tree.map(jnp.asarray, resume["state_dict_goal"])
            if "state_dict_vln" in resume:
                self.params_dialog = jax.tree.map(jnp.asarray, resume["state_dict_vln"])
            if "optim_state" in resume:
                self.opt_state_q = restore_into(self.opt_state_q, resume["optim_state"])
            if "optim_state_vln" in resume:
                self.opt_state_l = restore_into(self.opt_state_l, resume["optim_state_vln"])
            self.num_steps_done = int(resume.get("extra_state", {}).get("step", 0))
            ckpt_count = int(resume.get("_resume_index", 0))

        train_state = self._train_state()
        with TensorboardWriter(cfg.TENSORBOARD_DIR) as writer:
            for update in range(cfg.NUM_UPDATES):
                if preemption.should_exit():
                    self._set_train_state(train_state)
                    preemption.save_interrupted_state(self._checkpoint_payload())
                    preemption.requeue_job()
                    return
                key, sub = jax.random.split(key)
                with timings.time("superstep_time"):
                    train_state, self.carry, traj, stats = self._superstep(
                        train_state, self.carry, sub, self.env.consts
                    )
                    self._set_train_state(train_state)
                    jax.block_until_ready(stats["value_loss"])
                self.carry = self._refresh_episode_stream(self.carry)

                rewards = np.asarray(traj["rewards"])
                dones = np.asarray(traj["dones"])
                qcount = np.asarray(traj["query_count"])
                metrics = {k: np.asarray(v) for k, v in traj["metrics"].items() if k not in METRIC_BLACKLIST}
                for t_i in range(rewards.shape[0]):
                    reward_acc += rewards[t_i]
                    for b_i in np.nonzero(dones[t_i])[0]:
                        window.append({
                            "reward": reward_acc[b_i],
                            "query_count": qcount[t_i, b_i],
                            **{k: metrics[k][t_i, b_i] for k in metrics},
                        })
                        reward_acc[b_i] = 0.0
                self.num_steps_done += rewards.size
                self.num_updates_done += 1

                if update % cfg.LOG_INTERVAL == 0:
                    fps = self.num_steps_done / max(time.time() - t_start, 1e-6)
                    logger.info(
                        f"interactive update {update} fps {fps:.1f} frames {self.num_steps_done} "
                        + timings.summary()
                    )
                    if window:
                        means = {k: float(np.mean([w[k] for w in window])) for k in window[0]}
                        logger.info(
                            "window reward {:.3f} success {:.3f} spl {:.3f} queries {:.2f}".format(
                                means.get("reward", 0), means.get("success", 0),
                                means.get("spl", 0), means.get("query_count", 0),
                            )
                        )
                        for k, v in means.items():
                            tag = "Debug" if "query" in k else "Metrics"
                            writer.add_scalar(f"{tag}/{k}", v, self.num_steps_done)
                    for k, v in stats.items():
                        writer.add_scalar(f"Policy/{k}", float(v), self.num_steps_done)

                # every CHECKPOINT_INTERVAL *updates*, like the reference
                # (ddppo_trainer.py:1191, update % CHECKPOINT_INTERVAL == 0)
                if (update + 1) % cfg.CHECKPOINT_INTERVAL == 0 or update + 1 == cfg.NUM_UPDATES:
                    self.save_checkpoint(f"ckpt.{ckpt_count}.pth")
                    ckpt_count += 1

    def _train_dialog(self) -> None:
        cfg = self.config
        os.makedirs(cfg.CHECKPOINT_FOLDER, exist_ok=True)
        os.makedirs(cfg.TENSORBOARD_DIR, exist_ok=True)
        t_start = time.time()
        ckpt_count = 0
        key = jax.random.key(cfg.SEED + 2)
        train_state = self._dialog_train_state()
        with TensorboardWriter(cfg.TENSORBOARD_DIR) as writer:
            for update in range(cfg.NUM_UPDATES_DIALOG):
                key, sub = jax.random.split(key)
                train_state, self.carry, traj, dstats = self._superstep_dialog(
                    train_state, self.carry, sub, self.env.consts
                )
                self.params_dialog, self.opt_state_l, _ = train_state
                loss = dstats["dialog_loss"]
                jax.block_until_ready(loss)
                self.carry = self._refresh_episode_stream(self.carry)
                self.num_steps_done += int(np.prod(np.asarray(traj["o_action"]).shape))
                self.num_updates_done += 1
                if update % cfg.LOG_INTERVAL == 0:
                    fps = self.num_steps_done / max(time.time() - t_start, 1e-6)
                    logger.info(f"dialog update {update} loss {float(loss):.4f} fps {fps:.1f}")
                    writer.add_scalar("Policy/dialog_loss", float(loss), self.num_steps_done)
                if (update + 1) % max(cfg.CHECKPOINT_INTERVAL_DIALOG, 1) == 0 or update + 1 == cfg.NUM_UPDATES_DIALOG:
                    save_checkpoint(
                        os.path.join(cfg.CHECKPOINT_FOLDER, "vln"),
                        f"ckpt.{ckpt_count}.pth",
                        {"state_dict": self.params_dialog, "config": cfg.to_dict()},
                    )
                    ckpt_count += 1

    def _checkpoint_payload(self) -> Dict:
        payload = {
            "state_dict": self.params_option,
            "state_dict_goal": self.params_goal,
            "state_dict_vln": self.params_dialog,
            # both optimizers, matching the reference's interrupted-state
            # payload (agent + agent_vln optim state, ddp_utils.py:70-99)
            "optim_state": self.opt_state_q,
            "optim_state_vln": self.opt_state_l,
            "config": self.config.to_dict(),
            "extra_state": {"step": self.num_steps_done},
        }
        if self.belief_params is not None:
            payload["belief_predictor"] = self.belief_params
        return payload

    def save_checkpoint(self, name: str) -> None:
        save_checkpoint(self.config.CHECKPOINT_FOLDER, name, self._checkpoint_payload())

    # ------------------------------------------------------------------
    def _eval_checkpoint(self, checkpoint_path: str, writer, checkpoint_index: int = 0) -> Dict[str, float]:
        """Interactive eval with query strategies + budget
        (ppo_trainer.py:1313-2761)."""
        cfg = self.config
        # config-level dispatch: eval() may reach here before _setup binds
        # self.policy_type
        if cfg.RL.PPO.policy_type == "dialog" or cfg.DIALOG_TRAINING:
            # a vln/ckpt.N.pth dialog checkpoint holds π_l params only —
            # evaluating it through the interactive loader would mis-load it
            # as π_q; dispatch to the dialog protocol instead
            return self._eval_checkpoint_dialog(checkpoint_path, writer, checkpoint_index)
        ckpt = self.load_checkpoint(checkpoint_path)
        self.reconfigure_from_checkpoint(ckpt)
        p_opt = jax.tree.map(jnp.asarray, ckpt["state_dict"])
        p_goal = jax.tree.map(jnp.asarray, ckpt.get("state_dict_goal", self.params_goal))
        p_vln = jax.tree.map(jnp.asarray, ckpt.get("state_dict_vln", self.params_dialog))
        p_bel = (
            jax.tree.map(jnp.asarray, ckpt["belief_predictor"])
            if "belief_predictor" in ckpt and self.use_belief_predictor
            else self.belief_params
        )
        from avlen_tpu.rl.trainers.base import METRIC_BLACKLIST, eval_episode_accounting, exact_once_deal

        # exactly-once protocol over the eval split (reference runs each of
        # the 500/1000 episodes once with pause-on-done, base_trainer.py:185)
        num_episodes = int(self.env.eps["scene"].shape[0])
        count = min(cfg.TEST_EPISODE_COUNT, num_episodes)
        b = self.env.num_envs
        # heard/unheard sound split (env.eval_consts docstring)
        consts = self.env.eval_consts(cfg.SOUND_TYPE)
        state, obs = self.env.reset(
            order=jnp.asarray(exact_once_deal(num_episodes, b)), consts=consts
        )
        if self._chunked is not None:
            # the reset observed through an empty/stale prefetch cache —
            # prime the standing pairs and recompute the initial obs
            consts = self._chunked.prime(state, consts)
            obs = dict(self.env._observe_jit(consts, state))
        if "category_belief" not in obs:
            obs["category_belief"] = jnp.zeros((b, 21), jnp.float32)
            obs["location_belief"] = jnp.zeros((b, 2), jnp.float32)
        carry = self.carry._replace(
            env_state=state, obs=obs,
            prev_action=jnp.zeros((b,), jnp.int32),
            masks=jnp.zeros((b,), jnp.float32),
            masks_vln=jnp.zeros((b,), jnp.float32),
            mem_goal=init_memory(b, self.memory_size, self.feat_goal_size),
            mem_option=init_memory(b, self.memory_size, self.feat_option_size),
            mem_vln=init_memory(b, cfg.NUM_DIALOG_STEPS, self.feat_goal_size),
            mem_vln_dialog=init_memory(
                b, cfg.NUM_DIALOG_STEPS, cfg.RL.PPO.SCENE_MEMORY_TRANSFORMER.hidden_size
            ),
            belief=init_belief_state(b),
            # clip_width = CLIPTextEncoder.embed_dim (the text-projection
            # output, fixed 512) -- NOT RL.PPO.CLIP_WIDTH (the tower width)
            track=init_query_track(b),
            key=jax.random.key(cfg.SEED + 13),
        )
        stats: Dict[str, list] = collections.defaultdict(list)
        seen: set = set()
        # per-episode text log + npz histograms (ppo_trainer.py:1383-1397,
        # 1824-1860)
        log_lines = []
        episode_records = collections.defaultdict(list)
        max_rollouts = self.eval_rollout_budget(num_episodes, b, self.env.config.max_episode_steps)
        videos_made = 0
        for _ in range(max_rollouts):
            if len(seen) >= count:
                break
            carry, traj = self._collect(consts, p_goal, p_vln, p_opt, p_bel, carry, deterministic=True)
            if videos_made < 2:
                # eval videos (ppo_trainer.py:1824-1860 parity): keep trying
                # chunks until some episode completes inside one
                videos_made += self.generate_eval_videos(
                    traj["dones"], traj["masks"], traj["metrics"], writer, checkpoint_index
                )
            dones = np.asarray(traj["dones"])
            ep_ids = np.asarray(traj["metrics"]["episode"])
            metrics = {
                k: np.asarray(v) for k, v in traj["metrics"].items()
                if k not in METRIC_BLACKLIST
            }
            qcount = np.asarray(traj["query_count"])
            rlmask = np.asarray(traj["rl_mask"])
            for t, bi in zip(*np.nonzero(dones)):
                eid = int(ep_ids[t, bi])
                if eid in seen or len(seen) >= count:
                    continue
                seen.add(eid)
                for k in metrics:
                    stats[k].append(metrics[k][t, bi])
                stats["query_count"].append(qcount[t, bi])
                episode_records["episode"].append(eid)
                episode_records["query_count"].append(float(qcount[t, bi]))
                episode_records["success"].append(float(metrics["success"][t, bi]))
                episode_records["spl"].append(float(metrics["spl"][t, bi]))
                episode_records["na"].append(float(metrics["na"][t, bi]))
                log_lines.append(
                    f"episode {eid}: success={metrics['success'][t, bi]:.0f} "
                    f"spl={metrics['spl'][t, bi]:.3f} sna={metrics['sna'][t, bi]:.3f} "
                    f"na={metrics['na'][t, bi]:.0f} queries={qcount[t, bi]:.0f} "
                    f"vln_steps={float((1.0 - rlmask[: t + 1, bi]).sum()):.0f}"
                )
        self._last_eval_episode_ids = sorted(seen)
        os.makedirs(cfg.MODEL_DIR, exist_ok=True)
        sound_tag = cfg.SOUND_TYPE
        with open(os.path.join(cfg.MODEL_DIR, f"test_log_ckpt{checkpoint_index}_{sound_tag}.txt"), "w") as f:
            f.write("\n".join(log_lines) + "\n")
        np.savez(
            os.path.join(cfg.MODEL_DIR, f"eval_stats_ckpt{checkpoint_index}_{sound_tag}.npz"),
            **{k: np.asarray(v) for k, v in episode_records.items()},
        )
        means = {k: float(np.mean(v)) for k, v in stats.items()}
        means.update(eval_episode_accounting(seen, count, "interactive"))
        logger.info(
            f"interactive eval ckpt {checkpoint_index}: "
            + ", ".join(f"{k}={v:.3f}" for k, v in means.items())
        )
        for k, v in means.items():
            writer.add_scalar(f"val/{k}", v, checkpoint_index)
        return means

    def _eval_checkpoint_dialog(
        self, checkpoint_path: str, writer, checkpoint_index: int = 0
    ) -> Dict[str, float]:
        """π_l (dialog policy) eval protocol: load a ``vln/ckpt.N.pth``
        dialog checkpoint, roll the oracle-window episodes of the val split
        exactly once, and report π_l's imitation quality — per-step action
        accuracy and CE against the oracle action — alongside the split's
        nav metrics. The reference evaluates the dialog policy on its own
        val split this way (ss_baselines/savi/config/default.py:348-362,
        ddppo_trainer.py:181-298)."""
        cfg = self.config
        ckpt = self.load_checkpoint(checkpoint_path)
        self.reconfigure_from_checkpoint(ckpt)
        p_vln = jax.tree.map(jnp.asarray, ckpt["state_dict"])
        p_bel = (
            jax.tree.map(jnp.asarray, ckpt["belief_predictor"])
            if "belief_predictor" in ckpt and self.use_belief_predictor
            else self.belief_params
        )
        from avlen_tpu.rl.trainers.base import (
            METRIC_BLACKLIST,
            eval_episode_accounting,
            exact_once_deal,
        )

        num_episodes = int(self.env.eps["scene"].shape[0])
        count = min(cfg.TEST_EPISODE_COUNT, num_episodes)
        b = self.env.num_envs
        consts = self.env.eval_consts(cfg.SOUND_TYPE)
        state, obs = self.env.reset(
            order=jnp.asarray(exact_once_deal(num_episodes, b)), consts=consts
        )
        if self._chunked is not None:
            consts = self._chunked.prime(state, consts)
            obs = dict(self.env._observe_jit(consts, state))
        if "category_belief" not in obs:
            obs["category_belief"] = jnp.zeros((b, 21), jnp.float32)
            obs["location_belief"] = jnp.zeros((b, 2), jnp.float32)
        carry = self.carry._replace(
            env_state=state, obs=obs,
            prev_action=jnp.zeros((b,), jnp.int32),
            masks=jnp.zeros((b,), jnp.float32),
            masks_vln=jnp.zeros((b,), jnp.float32),
            mem_goal=init_memory(b, self.memory_size, self.feat_goal_size),
            mem_option=init_memory(b, self.memory_size, self.feat_option_size),
            mem_vln=init_memory(b, cfg.NUM_DIALOG_STEPS, self.feat_goal_size),
            mem_vln_dialog=init_memory(
                b, cfg.NUM_DIALOG_STEPS, cfg.RL.PPO.SCENE_MEMORY_TRANSFORMER.hidden_size
            ),
            belief=init_belief_state(b),
            track=init_query_track(b),
            key=jax.random.key(cfg.SEED + 17),
        )
        stats: Dict[str, list] = collections.defaultdict(list)
        seen: set = set()
        acc_num = ce_num = n_steps = 0.0
        max_rollouts = self.eval_rollout_budget(
            num_episodes, b, self.env.config.max_episode_steps
        )
        for _ in range(max_rollouts):
            if len(seen) >= count:
                break
            carry, traj = self._collect_dialog(consts, p_vln, p_bel, carry)
            logits = np.asarray(traj["logits_vln"], np.float64)  # (T, B, A)
            oracle = np.asarray(traj["o_action"])  # (T, B)
            z = logits - logits.max(axis=-1, keepdims=True)
            logp = z - np.log(np.exp(z).sum(axis=-1, keepdims=True))
            picked = np.take_along_axis(logp, oracle[..., None], axis=-1)[..., 0]
            acc_num += float((logits.argmax(-1) == oracle).sum())
            ce_num += float(-picked.sum())
            n_steps += float(oracle.size)
            dones = np.asarray(traj["dones"])
            ep_ids = np.asarray(traj["metrics"]["episode"])
            metrics = {
                k: np.asarray(v) for k, v in traj["metrics"].items()
                if k not in METRIC_BLACKLIST
            }
            for t, bi in zip(*np.nonzero(dones)):
                eid = int(ep_ids[t, bi])
                if eid in seen or len(seen) >= count:
                    continue
                seen.add(eid)
                for k in metrics:
                    stats[k].append(metrics[k][t, bi])
        means = {k: float(np.mean(v)) for k, v in stats.items()}
        means["action_accuracy"] = acc_num / max(n_steps, 1.0)
        means["action_ce"] = ce_num / max(n_steps, 1.0)
        means.update(eval_episode_accounting(seen, count, "dialog"))
        logger.info(
            f"dialog eval ckpt {checkpoint_index}: "
            + ", ".join(f"{k}={v:.3f}" for k, v in means.items())
        )
        for k, v in means.items():
            writer.add_scalar(f"val_dialog/{k}", v, checkpoint_index)
        return means

"""AVLEN updates: π_q PPO with rl_mask gating + uncertainty CE, and the π_l
supervised (replay) update.

Loss semantics from savi/ppo/ppo.py:
* `update` (:157-289): clipped surrogate gated by rl_masks
  (sum/Σrl_masks), clipped value loss (plain mean), entropy bonus, and the
  auxiliary uncertainty cross-entropy with coefficient unct_coef=0.5.
* `update_dialog` (:99-154): class-weighted CE of π_l logits against oracle
  actions on o_mask steps (weights [0, ⅓, ⅓, ⅓] — STOP excluded), separate
  Adam at lr 1e-5. In the REPLAY_STORE flow the training set is the queried
  steps of the rollout (ddppo_trainer.py:907-944); here that is a weight
  mask over the stored sequence instead of a copied replay buffer.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from avlen_tpu.models.memory import SMTMemory, insert, reset_where
from avlen_tpu.rl.ppo import PPOConfig

DIALOG_CLASS_WEIGHTS = (0.0, 1.0 / 3, 1.0 / 3, 1.0 / 3)


def evaluate_option_sequence(
    evaluate_step: Callable,  # (obs, pa, mf, mv, qs, lqi, actions) -> (v, lp, ent, logits, unct, x)
    traj_obs: Dict[str, jnp.ndarray],  # (T, Bm, ...) with __prev_action
    feat_option: jnp.ndarray,  # (T, Bm, F) stored features (old params)
    query_state: jnp.ndarray,
    last_query_info: jnp.ndarray,
    masks: jnp.ndarray,  # (T, Bm)
    actions_option: jnp.ndarray,
    initial_memory: SMTMemory,
):
    prev_actions = traj_obs["__prev_action"]
    sensor_obs = {k: v for k, v in traj_obs.items() if not k.startswith("__")}

    evaluate_step = jax.checkpoint(evaluate_step)  # remat per scan step

    def step(mem, inp):
        obs_t, pa_t, feat_t, qs_t, lqi_t, m_t, a_t = inp
        mem = reset_where(mem, m_t == 0)
        v, lp, ent, logits, unct, _ = evaluate_step(
            obs_t, pa_t, mem.features, mem.valid, qs_t, lqi_t, a_t
        )
        mem = insert(mem, feat_t)
        return mem, (v, lp, ent, unct)

    _, (v, lp, ent, unct) = jax.lax.scan(
        step,
        initial_memory,
        (sensor_obs, prev_actions, feat_option, query_state, last_query_info, masks, actions_option),
    )
    return v, lp, ent, unct


def evaluate_option_sequence_batched(
    evaluate_step: Callable,
    traj_obs: Dict[str, jnp.ndarray],
    feat_option: jnp.ndarray,
    query_state: jnp.ndarray,
    last_query_info: jnp.ndarray,
    masks: jnp.ndarray,
    actions_option: jnp.ndarray,
    initial_memory: SMTMemory,
    chunk: int = 15,
    compute_dtype=None,
):
    """T-parallel evaluate_option_sequence (rl/rollout_smt.batched_ring_eval):
    identical per-step ring views, MXU-sized batches."""
    from avlen_tpu.rl.rollout_smt import batched_ring_eval

    sensor_obs = {k: v for k, v in traj_obs.items() if not k.startswith("__")}

    def eval_fn(inp, views):
        obs_f, pa_f, qs_f, lqi_f, a_f = inp
        (mem, mem_valid), = views
        v, lp, ent, logits, unct, _ = evaluate_step(
            obs_f, pa_f, mem, mem_valid, qs_f, lqi_f, a_f
        )
        return v, lp, ent, unct

    return batched_ring_eval(
        eval_fn,
        (sensor_obs, traj_obs["__prev_action"], query_state, last_query_info, actions_option),
        [(initial_memory, feat_option, masks)],
        chunk=chunk,
        compute_dtype=compute_dtype,
    )


def ppo_update_interactive(
    params,
    opt_state,
    traj: Dict[str, jnp.ndarray],
    advantages: jnp.ndarray,
    returns: jnp.ndarray,
    key: jax.Array,
    evaluate_step: Callable,  # closure over params: see evaluate_option_sequence
    optimizer: optax.GradientTransformation,
    config: PPOConfig,
    unct_coef: float = 0.5,
    grad_reduce: Callable = lambda g: g,
    batched_chunk: int = 0,  # >0: T-parallel ring re-eval with this chunk
    compute_dtype=None,  # pool dtype for the batched ring views (bf16 on TPU)
):
    """One π_q PPO update over the interactive trajectory."""
    t, b = traj["actions_option"].shape
    num_mb = min(config.num_mini_batch, b)
    mb_size = b // num_mb

    adv = advantages
    if config.use_normalized_advantage:
        adv = (adv - adv.mean()) / (adv.std() + 1e-5)

    def sel1(tree, idx):
        return jax.tree.map(lambda v: jnp.take(v, idx, axis=1), tree)

    def sel0(tree, idx):
        return jax.tree.map(lambda v: jnp.take(v, idx, axis=0), tree)

    eval_seq = (
        functools.partial(
            evaluate_option_sequence_batched,
            chunk=batched_chunk,
            compute_dtype=compute_dtype,
        )
        if batched_chunk > 0
        else evaluate_option_sequence
    )

    def loss_fn(p, idx):
        obs = sel1(traj["obs"], idx)
        v, lp, ent, unct = eval_seq(
            lambda *a: evaluate_step(p, *a),
            obs,
            jnp.take(traj["feat_option"], idx, axis=1),
            jnp.take(traj["query_state"], idx, axis=1),
            jnp.take(traj["last_query_info"], idx, axis=1),
            jnp.take(traj["masks"], idx, axis=1),
            jnp.take(traj["actions_option"], idx, axis=1),
            sel0(traj["initial_memories"][1], idx),
        )
        old_lp = jnp.take(traj["log_probs_option"], idx, axis=1)
        old_v = jnp.take(traj["values_option"], idx, axis=1)
        rl = jnp.take(traj["rl_mask"], idx, axis=1)
        a_t = jnp.take(adv, idx, axis=1)
        r_t = jnp.take(returns, idx, axis=1)
        gt = jnp.take(traj["ucnt_gt"], idx, axis=1)

        ratio = jnp.exp(lp - old_lp)
        surr1 = ratio * a_t * rl
        surr2 = jnp.clip(ratio, 1 - config.clip_param, 1 + config.clip_param) * a_t * rl
        action_loss = -jnp.minimum(surr1, surr2).sum() / jnp.maximum(rl.sum(), 1.0)

        v_clip = old_v + jnp.clip(v - old_v, -config.clip_param, config.clip_param)
        value_loss = 0.5 * jnp.maximum((v - r_t) ** 2, (v_clip - r_t) ** 2).mean()

        ent_mean = ent.mean()
        unct_loss = optax.softmax_cross_entropy_with_integer_labels(
            unct.reshape(-1, 2), gt.reshape(-1)
        ).mean()
        total = (
            value_loss * config.value_loss_coef
            + action_loss
            - ent_mean * config.entropy_coef
            + unct_coef * unct_loss
        )
        return total, {
            "value_loss": value_loss,
            "action_loss": action_loss,
            "entropy": ent_mean,
            "unct_loss": unct_loss,
        }

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
    stats = {"value_loss": 0.0, "action_loss": 0.0, "entropy": 0.0, "unct_loss": 0.0}
    for e in range(config.ppo_epoch):
        key, sub = jax.random.split(key)
        perm = jax.random.permutation(sub, b)
        for m in range(num_mb):
            idx = jax.lax.dynamic_slice_in_dim(perm, m * mb_size, mb_size)
            (loss, aux), grads = grad_fn(params, idx)
            grads = grad_reduce(grads)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            stats = {k: stats[k] + aux[k] for k in stats}
    n = config.ppo_epoch * num_mb
    return params, opt_state, {k: v / n for k, v in stats.items()}


# ---------------------------------------------------------------------------
def evaluate_dialog_sequence(
    evaluate_step: Callable,  # (obs, pa, mf, mv, smf, smv, dialog, step, actions, dclip) -> (v, lp, ent, logits, x, x_att)
    traj_obs: Dict[str, jnp.ndarray],
    feat_vln: jnp.ndarray,
    feat_vln_dialog: jnp.ndarray,
    dialog: jnp.ndarray,  # (T, Bm, 77)
    agent_step: jnp.ndarray,  # (T, Bm)
    masks_vln: jnp.ndarray,  # (T, Bm)
    actions: jnp.ndarray,
    initial_mem_vln: SMTMemory,
    initial_mem_vln_dialog: SMTMemory,
    dialog_clip: Optional[jnp.ndarray] = None,  # (T, Bm, clip_width|0)
):
    prev_actions = traj_obs["__prev_action"]
    sensor_obs = {k: v for k, v in traj_obs.items() if not k.startswith("__")}

    evaluate_step = jax.checkpoint(evaluate_step)  # remat per scan step

    # dialog_clip absent or width-0 -> legacy 9-arg evaluate_step contract
    use_clip = dialog_clip is not None and dialog_clip.shape[-1] > 0

    def step(carry, inp):
        mem, smem = carry
        if use_clip:
            obs_t, pa_t, f_t, fd_t, d_t, dc_t, st_t, m_t, a_t = inp
            extra = (dc_t,)
        else:
            obs_t, pa_t, f_t, fd_t, d_t, st_t, m_t, a_t = inp
            extra = ()
        mem = reset_where(mem, m_t == 0)
        smem = reset_where(smem, m_t == 0)
        v, lp, ent, logits, _, x_att = evaluate_step(
            obs_t, pa_t, mem.features, mem.valid, smem.features, smem.valid,
            d_t, st_t, a_t, *extra,
        )
        mem = insert(mem, f_t)
        smem = insert(smem, fd_t)
        return (mem, smem), logits

    xs = (
        (sensor_obs, prev_actions, feat_vln, feat_vln_dialog, dialog,
         dialog_clip, agent_step, masks_vln, actions)
        if use_clip else
        (sensor_obs, prev_actions, feat_vln, feat_vln_dialog, dialog,
         agent_step, masks_vln, actions)
    )
    _, logits = jax.lax.scan(
        step, (initial_mem_vln, initial_mem_vln_dialog), xs
    )
    return logits


def evaluate_dialog_sequence_batched(
    evaluate_step: Callable,
    traj_obs: Dict[str, jnp.ndarray],
    feat_vln: jnp.ndarray,
    feat_vln_dialog: jnp.ndarray,
    dialog: jnp.ndarray,
    agent_step: jnp.ndarray,
    masks_vln: jnp.ndarray,
    actions: jnp.ndarray,
    initial_mem_vln: SMTMemory,
    initial_mem_vln_dialog: SMTMemory,
    chunk: int = 15,
    compute_dtype=None,
    dialog_clip: Optional[jnp.ndarray] = None,
):
    """T-parallel evaluate_dialog_sequence: both π_l ring memories (state and
    dialog-state) reconstructed by gather (rl/rollout_smt.batched_ring_eval)."""
    from avlen_tpu.rl.rollout_smt import batched_ring_eval

    sensor_obs = {k: v for k, v in traj_obs.items() if not k.startswith("__")}

    use_clip = dialog_clip is not None and dialog_clip.shape[-1] > 0

    def eval_fn(inp, views):
        if use_clip:
            obs_f, pa_f, d_f, dc_f, st_f, a_f = inp
            extra = (dc_f,)
        else:
            obs_f, pa_f, d_f, st_f, a_f = inp
            extra = ()
        (mem, mv), (smem, smv) = views
        _, _, _, logits, _, _ = evaluate_step(
            obs_f, pa_f, mem, mv, smem, smv, d_f, st_f, a_f, *extra
        )
        return logits

    return batched_ring_eval(
        eval_fn,
        (sensor_obs, traj_obs["__prev_action"], dialog, dialog_clip,
         agent_step, actions)
        if use_clip else
        (sensor_obs, traj_obs["__prev_action"], dialog, agent_step, actions),
        [
            (initial_mem_vln, feat_vln, masks_vln),
            (initial_mem_vln_dialog, feat_vln_dialog, masks_vln),
        ],
        chunk=chunk,
        compute_dtype=compute_dtype,
    )


def dialog_supervised_update(
    params,
    opt_state,
    traj: Dict[str, jnp.ndarray],
    evaluate_step: Callable,  # closure over params
    optimizer: optax.GradientTransformation,
    replay_only: bool = True,
    grad_reduce: Callable = lambda g: g,
    batched_chunk: int = 0,  # >0: T-parallel ring re-eval with this chunk
    compute_dtype=None,
):
    """π_l class-weighted CE against oracle actions (update_dialog,
    savi/ppo/ppo.py:99-154). ``replay_only`` restricts to queried steps (the
    REPLAY_STORE flow); DIALOG_TRAINING uses all o_mask steps."""
    weights_tbl = jnp.asarray(DIALOG_CLASS_WEIGHTS)

    eval_seq = (
        functools.partial(
            evaluate_dialog_sequence_batched,
            chunk=batched_chunk,
            compute_dtype=compute_dtype,
        )
        if batched_chunk > 0
        else evaluate_dialog_sequence
    )

    def loss_fn(p):
        logits = eval_seq(
            lambda *a: evaluate_step(p, *a),
            traj["obs"],
            traj["feat_vln"],
            traj["feat_vln_dialog"],
            traj["dialog"],
            traj["agent_step"],
            traj["masks_vln"],
            traj["o_action"],
            traj["initial_memories"][2],
            traj["initial_memories"][3],
            dialog_clip=traj.get("dialog_clip"),
        )
        o_action = traj["o_action"].astype(jnp.int32)
        sample_w = traj["o_mask"]
        if replay_only:
            sample_w = sample_w * traj["queried"].astype(jnp.float32)
        class_w = weights_tbl[o_action]
        w = sample_w * class_w
        ce = optax.softmax_cross_entropy_with_integer_labels(
            logits.reshape(-1, logits.shape[-1]), o_action.reshape(-1)
        ).reshape(o_action.shape)
        return (ce * w).sum() / jnp.maximum(w.sum(), 1.0)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    grads = grad_reduce(grads)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss

"""Rollout collection and PPO re-evaluation for SMT (external-memory) policies.

The reference collects SAVi rollouts step-by-step, keeping `num_copies = T+1`
snapshots of the external memory so each PPO minibatch step can see its own
memory view (savi/models/rollout_storage.py:145-173, 907-960) — O(T·M·B·F)
storage. Here the memory ring buffer lives in the scan carry (O(M·B·F)) and
PPO re-evaluation *replays* the stored step features into a fresh ring while
scanning the sequence — numerically identical views (memory entries are the
collection-time features, held constant across PPO epochs exactly like the
reference's snapshots) at a T-fold memory saving.

The belief predictor refresh (`belief_predictor.update` after each env step,
savi/ppo/ppo_trainer.py:890-894) is fused into the same scan: beliefs are
computed *before* acting, written into the stored observations, and carried
as a BeliefState pytree.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from avlen_tpu.models.belief_predictor import BeliefState
from avlen_tpu.models.memory import SMTMemory, insert, reset_where


class SMTCarry(NamedTuple):
    env_state: Any
    obs: Dict[str, jnp.ndarray]
    prev_action: jnp.ndarray  # (B,) i32
    masks: jnp.ndarray  # (B,) f32 — 0 at episode start
    memory: SMTMemory
    belief: BeliefState
    key: jax.Array


def collect_rollout_smt(
    env_step: Callable,  # (env_state, actions) -> (env_state, StepOutput)
    act_fn: Callable,  # (obs, prev_a, mem_feats, mem_valid, key) -> (a, lp, v, x, logits)
    value_fn: Callable,  # (obs, prev_a, mem_feats, mem_valid) -> v
    belief_fn: Optional[Callable],  # (belief_state, obs, new_episode) -> (state, cat, loc)
    carry: SMTCarry,
    num_steps: int,
):
    """Returns (carry, RolloutBatch) with SMT extras stored in obs under
    reserved keys: __prev_action, __feature."""
    from avlen_tpu.rl.rollout import RolloutBatch

    initial_memory = carry.memory

    def step_fn(c: SMTCarry, _):
        key, sub = jax.random.split(c.key)
        new_ep = c.masks == 0
        memory = reset_where(c.memory, new_ep)
        prev_action = jnp.where(new_ep, 0, c.prev_action)

        obs = dict(c.obs)
        belief_state = c.belief
        if belief_fn is not None:
            belief_state, cat_belief, loc_belief = belief_fn(belief_state, obs, new_ep)
            obs["category_belief"] = cat_belief
            obs["location_belief"] = loc_belief

        action, logp, value, x, _ = act_fn(obs, prev_action, memory.features, memory.valid, sub)
        memory = insert(memory, x)

        env_state, out = env_step(c.env_state, action)
        masks_next = 1.0 - out.done.astype(jnp.float32)
        new_c = SMTCarry(env_state, out.obs, action, masks_next, memory, belief_state, key)
        store = dict(
            obs={**obs, "__prev_action": prev_action, "__feature": jax.lax.stop_gradient(x)},
            actions=action,
            log_probs=logp,
            values=value,
            rewards=out.reward,
            masks=c.masks,
            dones=out.done,
            metrics=out.metrics,
        )
        return new_c, store

    carry2, traj = jax.lax.scan(step_fn, carry, None, length=num_steps)

    # bootstrap value from the post-rollout state
    new_ep = carry2.masks == 0
    memory_b = reset_where(carry2.memory, new_ep)
    prev_a_b = jnp.where(new_ep, 0, carry2.prev_action)
    obs_b = dict(carry2.obs)
    if belief_fn is not None:
        _, cat_b, loc_b = belief_fn(carry2.belief, obs_b, new_ep)
        obs_b["category_belief"] = cat_b
        obs_b["location_belief"] = loc_b
    bootstrap = value_fn(obs_b, prev_a_b, memory_b.features, memory_b.valid)

    batch = RolloutBatch(
        obs=traj["obs"],
        actions=traj["actions"],
        log_probs=traj["log_probs"],
        values=traj["values"],
        rewards=traj["rewards"],
        masks=traj["masks"],
        dones=traj["dones"],
        metrics=traj["metrics"],
        initial_hidden=initial_memory,
        bootstrap_value=bootstrap,
    )
    return carry2, batch


def reconstruct_memory_views(
    initial_memory: SMTMemory,
    features_seq: jnp.ndarray,  # (T, B, F) stored step features
    masks_seq: jnp.ndarray,  # (T, B) 0 at episode start
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Closed-form ring-buffer replay: the index map from (step t, env b,
    slot j) to the feature each memory slot held when step t was evaluated.

    The sequential semantics (reset_where → evaluate → insert per step) imply
    slot j at step t contains the stored feature of step
    ``s* = t-1 - ((t-1 - base_t - j) mod M)`` where ``base_t`` is the most
    recent reset step r ≤ t (ring restarts at slot 0 there), or ``-idx0``
    when no reset has occurred (inserts continue the pre-rollout ring). If
    s* predates the current episode segment the slot holds the pre-rollout
    entry (segment 0 only, where the initial ring is still alive) or nothing.

    Returns ``(content_idx, valid)``: content_idx (T, B, M) int32 indices
    into ``concat([features_seq, initial ring slots, one zero row], axis=0)``
    along a (T+M+1)-length axis; valid (T, B, M) float like memory.valid.
    Used by evaluate_sequence_smt_batched to turn the T-sequential PPO
    re-evaluation into T-parallel gathers + one batched SMT forward (the
    reference instead snapshots num_copies=T+1 memories,
    savi/models/rollout_storage.py:145-173).
    """
    t_len, b = masks_seq.shape
    m = initial_memory.features.shape[1]
    steps = jnp.arange(t_len, dtype=jnp.int32)[:, None]  # (T, 1)

    reset_at = jnp.where(masks_seq == 0, steps, -1)  # (T, B)
    r = jax.lax.cummax(reset_at, axis=0)  # (T, B) latest reset step ≤ t, -1 if none
    has_reset = r >= 0
    base = jnp.where(has_reset, r, -initial_memory.idx[None, :])  # (T, B)
    seg_lo = jnp.maximum(r, 0)  # first insert step visible at t

    j = jnp.arange(m, dtype=jnp.int32)[None, None, :]  # (1, 1, M)
    tm1 = steps[:, :, None] - 1  # (T, 1→B, M) broadcast
    s_star = tm1 - jnp.mod(tm1 - base[:, :, None] - j, m)  # (T, B, M)
    ins_ok = s_star >= seg_lo[:, :, None]
    init_ok = (
        (~has_reset)[:, :, None]
        & (initial_memory.valid > 0)[None, :, :]
        & ~ins_ok
    )
    content_idx = jnp.where(
        ins_ok, s_star, jnp.where(init_ok, t_len + j, t_len + m)
    ).astype(jnp.int32)
    valid = (ins_ok | init_ok).astype(initial_memory.valid.dtype)
    return content_idx, valid


def batched_ring_eval(
    eval_fn: Callable,  # (flat_inputs, [(mem_feats, mem_valid), ...]) -> pytree of (C·B, ...)
    inputs,  # pytree with (T, B, ...) leaves, passed flattened to eval_fn
    memories,  # sequence of (initial SMTMemory, features_seq (T,B,F), masks_seq (T,B))
    chunk: int = 15,
    compute_dtype=None,  # cast the feature pool (e.g. bf16 under TPU.PRECISION):
    # the (C·B, M, F) view gathers are the update's dominant HBM traffic
):
    """T-parallel ring-replay evaluation: per-step memory views are gathered
    from the stored features (reconstruct_memory_views) and ``eval_fn`` runs
    on (chunk·B)-row batches — MXU-sized matmuls instead of T sequential
    scan steps of B-row ones. Supports multiple ring memories (the AVLEN
    interactive policies carry up to two per evaluator). Chunking bounds the
    gathered (chunk, B, M, F) tensors; each chunk is rematerialized in the
    backward pass. Returns eval_fn's outputs reshaped to (T, B, ...)."""
    first = jax.tree.leaves(inputs)[0]
    t_len, b = first.shape[:2]
    while t_len % chunk:  # static shapes: largest divisor ≤ requested chunk
        chunk -= 1
    n_chunks = t_len // chunk

    plans = []  # (pool (T+M+1, B, F) time-major, content_idx (T,B,M), valid (T,B,M))
    for mem0, feats, masks in memories:
        content_idx, valid = reconstruct_memory_views(mem0, feats, masks)
        pool = jnp.concatenate(
            [feats, jnp.swapaxes(mem0.features, 0, 1), jnp.zeros_like(feats[:1])],
            axis=0,
        )
        if compute_dtype is not None:
            pool = pool.astype(compute_dtype)
        plans.append((pool, content_idx, valid))

    env_ids = jnp.arange(b)[None, :, None]  # (1, B, 1)

    def eval_chunk(_, inp):
        inputs_c, idx_valid_c = inp  # leaves (C, B, ...)
        c = jax.tree.leaves(inputs_c)[0].shape[0]
        views = []
        for (pool, _, _), (idx_c, valid_c) in zip(plans, idx_valid_c):
            m = idx_c.shape[-1]
            # time-major pool + (C, B, M) fancy index → the gather emits
            # (C, B, M, F) directly in the C-major layout eval_fn consumes;
            # the previous take_along_axis route materialized a (B, C·M, F)
            # gather then a ~160 MB transpose per chunk (28% of the whole
            # PPO update was XLA `copy` ops at production shapes)
            mem = pool[idx_c, env_ids]  # (C, B, M, F)
            views.append((mem.reshape(c * b, m, -1), valid_c.reshape(c * b, m)))
        flat = lambda x: x.reshape((c * b,) + x.shape[2:])
        out = eval_fn(jax.tree.map(flat, inputs_c), views)
        return None, jax.tree.map(lambda x: x.reshape((c, b) + x.shape[1:]), out)

    eval_chunk = jax.checkpoint(eval_chunk, prevent_cse=False)
    reshape_c = lambda x: x.reshape((n_chunks, chunk) + x.shape[1:])
    xs = (
        jax.tree.map(reshape_c, inputs),
        [(reshape_c(ci), reshape_c(va)) for _, ci, va in plans],
    )
    _, out = jax.lax.scan(eval_chunk, None, xs)
    return jax.tree.map(lambda x: x.reshape((t_len,) + x.shape[2:]), out)


def evaluate_sequence_smt_batched(
    evaluate_step: Callable,  # (obs, prev_a, mem_feats, mem_valid, actions) -> (v, lp, ent, logits, x)
    obs_seq: Dict[str, jnp.ndarray],  # (T, Bm, ...) incl. __prev_action/__feature
    initial_memory: SMTMemory,
    masks_seq: jnp.ndarray,  # (T, Bm)
    actions_seq: jnp.ndarray,  # (T, Bm)
    chunk: int = 15,
    compute_dtype=None,
):
    """T-parallel evaluate_sequence_smt (see batched_ring_eval): numerically
    the same per-step memory views as the scan, same outputs."""
    features = obs_seq["__feature"]  # (T, B, F)
    # __feature stays in the step obs: evaluate_step_frozen consumes it
    # (freeze_encoders fast path); the recompute path ignores it
    sensor_obs = {
        k: v for k, v in obs_seq.items()
        if not k.startswith("__") or k == "__feature"
    }

    def eval_fn(inp, views):
        obs_f, pa_f, a_f = inp
        (mem, mem_valid), = views
        v, lp, ent, logits, _ = evaluate_step(obs_f, pa_f, mem, mem_valid, a_f)
        return v, lp, ent, logits

    return batched_ring_eval(
        eval_fn,
        (sensor_obs, obs_seq["__prev_action"], actions_seq),
        [(initial_memory, features, masks_seq)],
        chunk=chunk,
        compute_dtype=compute_dtype,
    )


def evaluate_sequence_smt(
    evaluate_step: Callable,  # (obs, prev_a, mem_feats, mem_valid, actions) -> (v, lp, ent, logits, x)
    obs_seq: Dict[str, jnp.ndarray],  # (T, Bm, ...) incl. __prev_action/__feature
    initial_memory: SMTMemory,
    masks_seq: jnp.ndarray,  # (T, Bm)
    actions_seq: jnp.ndarray,  # (T, Bm)
):
    """PPO sequence evaluation replaying stored features into the ring buffer.
    Returns (values, log_probs, entropy, logits), each (T, Bm, ...)."""
    prev_actions = obs_seq["__prev_action"]
    features = obs_seq["__feature"]
    sensor_obs = {
        k: v for k, v in obs_seq.items()
        if not k.startswith("__") or k == "__feature"
    }

    # rematerialize each step's policy forward in the backward pass: without
    # this the scan would keep every step's CNN/transformer activations live
    # (the reference pays the analogous cost as num_copies memory snapshots)
    evaluate_step = jax.checkpoint(evaluate_step)

    def step(mem, inp):
        obs_t, pa_t, feat_t, m_t, a_t = inp
        mem = reset_where(mem, m_t == 0)
        v, lp, ent, logits, _ = evaluate_step(obs_t, pa_t, mem.features, mem.valid, a_t)
        mem = insert(mem, feat_t)
        return mem, (v, lp, ent, logits)

    _, (v, lp, ent, logits) = jax.lax.scan(
        step, initial_memory, (sensor_obs, prev_actions, features, masks_seq, actions_seq)
    )
    return v, lp, ent, logits

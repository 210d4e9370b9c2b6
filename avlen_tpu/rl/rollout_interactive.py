"""AVLEN interactive rollout: π_q option selection, on-device oracle
instructions, π_g / π_l action multiplexing — as ONE `lax.scan`.

Re-design of `_collect_rollout_step` (ss_baselines/savi/ppo/ppo_trainer.py:
323-897), which per step does host RPCs (agent_state / is_new_episode /
compute_oracle_actions), three GPU policy forwards, an on-demand host speaker
+ CLIP tokenization, and Python dict bookkeeping per env. Here all of it is
vectorized device math: oracle actions come from the graph tables, oracle
instructions from the precomputed token bank (dialog/instruction_bank.py),
query bookkeeping is an integer pytree in the scan carry, and the four
external memories (goal / option / vln / vln-dialog-state —
savi/models/rollout_storage.py:145-173) are ring buffers in the carry.

Semantics preserved step-for-step (citations inline):
* query trigger & radius gate (ppo_trainer.py:449-470)
* consecutive-query reward (ppo_trainer.py:524-535)
* rl_mask = 1 on goal-steps and query-start steps, 0 on dialog-follow steps
  (ppo_trainer.py:503-596)
* instruction = speaker over the ≤3-node shortest-path prefix
  (ppo_trainer.py:538-562)
* uncertainty ground truth: top-2 goal-action prob gap < 0.1
  (ppo_trainer.py:646-652)
* action mux incl. ORACLE_WHEN_QUERIED / ALLOW_STOP and o_mask
  (ppo_trainer.py:654-694)
* dialog window end: NUM_DIALOG_STEPS steps then masks_vln=0 and state reset
  (ppo_trainer.py:760-772)
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from avlen_tpu.models.belief_predictor import BeliefState
from avlen_tpu.models.memory import SMTMemory, insert, reset_where


def sinusoidal_pe(max_len: int, dim: int) -> np.ndarray:
    """Query-count positional table (ddppo_trainer.py:505-513)."""
    position = np.arange(max_len)[:, None]
    div = np.exp(np.arange(0, dim, 2) * (-np.log(10000.0) / dim))
    pe = np.zeros((max_len, dim), np.float32)
    pe[:, 0::2] = np.sin(position * div)
    pe[:, 1::2] = np.cos(position * div)
    return pe


class QueryTrack(NamedTuple):
    queried: jnp.ndarray  # (B,) bool — inside a dialog window
    dialog_step: jnp.ndarray  # (B,) i32 — step within the window
    total_step: jnp.ndarray  # (B,) i32 — episode step counter
    last_query_step: jnp.ndarray  # (B,) i32
    query_count: jnp.ndarray  # (B,) i32
    current_dialog: jnp.ndarray  # (B, 77) i32
    current_clip: jnp.ndarray  # (B, clip_width) f32 frozen CLIP emb of current_dialog


def init_query_track(
    batch: int, context_length: int = 77, clip_width: int = 512
) -> QueryTrack:
    # distinct buffers per field: sharing one zeros array across leaves makes
    # donated supersteps fail with "donate the same buffer twice"
    z = lambda: jnp.zeros((batch,), jnp.int32)
    return QueryTrack(
        queried=jnp.zeros((batch,), bool),
        dialog_step=z(),
        total_step=z(),
        last_query_step=z(),
        query_count=z(),
        current_dialog=jnp.zeros((batch, context_length), jnp.int32),
        current_clip=jnp.zeros((batch, clip_width), jnp.float32),
    )


class InteractiveCarry(NamedTuple):
    env_state: Any
    obs: Dict[str, jnp.ndarray]
    prev_action: jnp.ndarray
    masks: jnp.ndarray  # (B,) episode mask (0 at episode start)
    masks_vln: jnp.ndarray  # (B,) vln window mask
    mem_goal: SMTMemory
    mem_option: SMTMemory
    mem_vln: SMTMemory
    mem_vln_dialog: SMTMemory  # state memory of π_l x_att states
    belief: BeliefState
    track: QueryTrack
    key: jax.Array


@dataclasses.dataclass(frozen=True)
class InteractiveConfig:
    num_dialog_steps: int = 3
    num_total_query: int = 5
    consecutive_reward: float = -0.5
    query_within_radius: bool = True
    oracle_when_queried: bool = False
    allow_stop: bool = False
    query_radius: float = 3.0
    pe_max: int = 151
    deterministic: bool = False
    # eval-time query strategy (ppo_trainer.py:1333-1356): ours | random |
    # uniform | jask | never; budget/gap enforced when limit_query
    qs_method: str = "ours"
    limit_query: bool = False
    how_many_query: int = 3
    enforced_gap: int = 1
    # uniform: query at per-episode steps {0, U, 2U, ...} up to the budget
    # (uniform_step = au*UNIFORM_STEP_SIZE, ppo_trainer.py:1356,1868)
    uniform_interval: int = 10
    # random: HOW_MANY_QUERY steps sampled per episode from
    # range(random_start, random_end, random_step) (ppo_trainer.py:1352-1354)
    random_end: int = 30
    random_step: int = 3
    # jask "just ask": query when the goal policy's action-probability
    # margin is under this threshold (ppo_trainer.py:2036-2040)
    jask_margin: float = 0.1
    # distance-sampled query reward draw (environments.py:126-133); the env
    # applies RewardConfig.query_reward_distance when dtg * sample <= 3
    with_distance_constraint: bool = False
    distance_distribution_type: str = "gaussian"  # gaussian | beta
    dist_mean: float = 0.0
    dist_sd: float = 0.5
    dist_alpha: float = 2.0
    dist_beta: float = 2.0


@dataclasses.dataclass(frozen=True)
class InteractiveFns:
    """Jittable policy closures over fixed params."""

    act_option: Callable  # (obs, pa, mem_f, mem_v, qs, lqi, key) -> (a, lp, v, x_mem, logits, unct)
    act_goal: Callable  # (obs, pa, mem_f, mem_v, key) -> (a, lp, v, x, logits)
    act_dialog: Callable  # (obs, pa, mem_f, mem_v, smem_f, smem_v, dialog, step, key[, dclip]) -> (a, lp, v, x, x_att, logits)
    value_option: Callable  # (obs, pa, mem_f, mem_v, qs, lqi) -> v
    oracle_action: Callable  # (env_state) -> (B,) i32
    env_step: Callable  # (env_state, actions, QueryInfo) -> (env_state, StepOutput)
    belief_fn: Optional[Callable] = None  # (belief_state, obs, new_ep) -> (state, cat, loc)
    # (B, 77) tokens -> (B, clip_width) FROZEN CLIP text features. When set,
    # the rollout runs the tower only on steps where some query starts
    # (lax.cond), carries the embedding in QueryTrack, and stores it in the
    # trajectory so the pi_l replay CE never re-runs the tower (~17% of the
    # interactive superstep device time in the r4 profile).
    clip_embed: Optional[Callable] = None


def collect_rollout_interactive(
    fns: InteractiveFns,
    carry: InteractiveCarry,
    instr_bank,  # (S, N, 4, N, 77) int32 bank OR callable (env_state, newly) -> (B, 77)
    pe_table: jnp.ndarray,  # (pe_max, qc_emb)
    cfg: InteractiveConfig,
    num_steps: int,
):
    """Returns (carry, traj dict of stacked (T, B, ...) tensors).

    ``instr_bank`` may be a precomputed token bank (small worlds) or a
    host-callback instruction source (dialog/instruction_source.py) for
    scenes too large to bank — the reference's on-demand speaker call
    (ppo_trainer.py:549-562)."""
    from avlen_tpu.sim.env import QueryInfo

    init_memories = (carry.mem_goal, carry.mem_option, carry.mem_vln, carry.mem_vln_dialog)

    def step_fn(c: InteractiveCarry, _):
        key, k1, k2, k3, k4, k5 = jax.random.split(c.key, 6)
        new_ep = c.masks == 0
        t = c.track
        b = c.masks.shape[0]

        # ---- episode-boundary resets (ppo_trainer.py:397-407)
        t = QueryTrack(
            queried=jnp.where(new_ep, False, t.queried),
            dialog_step=jnp.where(new_ep, 0, t.dialog_step),
            total_step=jnp.where(new_ep, 0, t.total_step),
            last_query_step=jnp.where(new_ep, 0, t.last_query_step),
            query_count=jnp.where(new_ep, 0, t.query_count),
            current_dialog=jnp.where(new_ep[:, None], 0, t.current_dialog),
            current_clip=jnp.where(new_ep[:, None], 0, t.current_clip),
        )
        vln_reset = new_ep | (c.masks_vln == 0)
        mem_goal = reset_where(c.mem_goal, new_ep)
        mem_option = reset_where(c.mem_option, new_ep)
        mem_vln = reset_where(c.mem_vln, vln_reset)
        mem_vln_dialog = reset_where(c.mem_vln_dialog, vln_reset)
        prev_action = jnp.where(new_ep, 0, c.prev_action)

        obs = dict(c.obs)
        belief_state = c.belief
        if fns.belief_fn is not None:
            belief_state, cat_b, loc_b = fns.belief_fn(belief_state, obs, new_ep)
            obs["category_belief"] = cat_b
            obs["location_belief"] = loc_b

        # ---- query-state encodings (ppo_trainer.py:404-420)
        diff_lqi = jnp.where(
            t.query_count >= 2, t.total_step - t.last_query_step, cfg.pe_max - 1
        )
        query_state = pe_table[jnp.clip(t.query_count, 0, cfg.pe_max - 1)]
        last_query_info = pe_table[jnp.clip(diff_lqi, 0, cfg.pe_max - 1)]

        # ---- option policy (ppo_trainer.py:449-458)
        a_opt, lp_opt, v_opt, x_mem_opt, logits_opt, unct_logits = fns.act_option(
            obs, prev_action, mem_option.features, mem_option.valid, query_state, last_query_info, k1
        )
        # goal policy forward (ppo_trainer.py:600-607) — hoisted above the
        # query decision: the 'jask' strategy reads this step's goal action
        # probabilities (ppo_trainer.py:2036-2040)
        a_goal, lp_goal, v_goal, x_goal, logits_goal = fns.act_goal(
            obs, prev_action, mem_goal.features, mem_goal.valid, k2
        )

        env_state = c.env_state
        dtg = env_state.prev_dtg  # geodesic at the current node (pre-step)

        # query decision by strategy (train: 'ours' from π_q; eval variants
        # ppo_trainer.py:2036-2100)
        if cfg.qs_method == "ours":
            wants_query = a_opt == 1
        elif cfg.qs_method == "random":
            # reference: HOW_MANY_QUERY per-episode steps sampled from
            # range(0, random_end, random_step) (ppo_trainer.py:1866, 2023);
            # jit-friendly equivalent: each eligible step queries with
            # probability budget/|eligible| (same expected count, no
            # per-episode sampled sets threading through the scan)
            n_eligible = max(1, -(-cfg.random_end // cfg.random_step))
            eligible = (t.total_step < cfg.random_end) & (
                t.total_step % cfg.random_step == 0
            )
            wants_query = eligible & (
                jax.random.uniform(k4, (b,)) < cfg.how_many_query / n_eligible
            )
        elif cfg.qs_method == "uniform":
            # reference: per-episode steps {0, U, 2U, ...}; the budget gate
            # below caps the count at how_many_query (ppo_trainer.py:1868)
            wants_query = (t.total_step % cfg.uniform_interval) == 0
        elif cfg.qs_method == "jask":
            # "just ask when uncertain": the goal policy's action-prob margin
            # under jask_margin (ppo_trainer.py:2036-2040 — the literal prob
            # pair there is its action layout's top-2 at the decision point)
            p_goal = jax.nn.softmax(logits_goal, axis=-1)
            top2_goal = jax.lax.top_k(p_goal, 2)[0]
            wants_query = (top2_goal[:, 0] - top2_goal[:, 1]) < cfg.jask_margin
        else:  # never
            wants_query = jnp.zeros((b,), bool)

        dist_ok = jnp.full((b,), True) if cfg.query_within_radius else (dtg > cfg.query_radius)
        allowed = jnp.full((b,), True)
        if cfg.limit_query:
            gap_ok = (t.total_step - t.last_query_step) > cfg.enforced_gap
            allowed = (t.query_count < cfg.how_many_query) & (gap_ok | (t.query_count == 0))
        newly = (~t.queried) & wants_query & dist_ok & allowed
        queried = t.queried | newly
        query_count = t.query_count + newly.astype(jnp.int32)

        # ---- consecutive-query shaping (ppo_trainer.py:524-535)
        diff2 = t.total_step - (t.last_query_step + 2)
        cons = jnp.where(
            newly & (query_count >= 2) & (diff2 <= 10),
            cfg.consecutive_reward / jnp.maximum(diff2, 1).astype(jnp.float32),
            0.0,
        )
        last_query_step = jnp.where(newly, t.total_step, t.last_query_step)
        rl_mask = ((~queried) | newly).astype(jnp.float32)

        # ---- oracle instruction gather (ppo_trainer.py:538-562); banked
        # worlds gather on device, large worlds call the host speaker for the
        # envs whose query starts this step (speaker_pipeline.py:110-124)
        if callable(instr_bank):
            tokens = instr_bank(env_state, newly)
        else:
            tokens = instr_bank[env_state.scene, env_state.node, env_state.rot, env_state.goal_node]
        instr_metrics = {}
        if getattr(instr_bank, "record_requests", False):
            # chunked host-prefetch instruction source: record the packed key
            # of every query-start step so the verify/replay backstop can
            # prove (or repair) cache coverage (dialog/instr_prefetch.py)
            ka, kb = instr_bank.keys_of(env_state)
            instr_metrics = {
                "pair_instr_a": jnp.where(newly, ka, -1),
                "pair_instr_src": jnp.where(newly, kb, -1),
            }
        current_dialog = jnp.where(newly[:, None], tokens, t.current_dialog)
        if fns.clip_embed is not None:
            # frozen tower runs only when some env's query starts this step
            fresh_clip = jax.lax.cond(
                jnp.any(newly),
                lambda: fns.clip_embed(tokens).astype(t.current_clip.dtype),
                lambda: t.current_clip,
            )
            current_clip = jnp.where(newly[:, None], fresh_clip, t.current_clip)
        else:
            current_clip = None
        agent_step = t.dialog_step

        # ---- dialog policy (ppo_trainer.py:608-637; goal forward hoisted
        # above the query decision for 'jask')
        _dialog_extra = () if current_clip is None else (current_clip,)
        a_vln, lp_vln, v_vln, x_vln, x_att_dialog, logits_vln = fns.act_dialog(
            obs, prev_action, mem_vln.features, mem_vln.valid,
            mem_vln_dialog.features, mem_vln_dialog.valid, current_dialog,
            agent_step, k3, *_dialog_extra,
        )

        o_action = fns.oracle_action(env_state)

        # uncertainty gt: top-2 goal prob gap (ppo_trainer.py:646-652)
        probs_goal = jax.nn.softmax(logits_goal, axis=-1)
        top2 = jax.lax.top_k(probs_goal, 2)[0]
        ucnt_gt = ((top2[:, 0] - top2[:, 1]) < 0.1).astype(jnp.int32)

        # ---- action mux (ppo_trainer.py:654-694)
        oracle_stop = o_action == 0
        if cfg.oracle_when_queried:
            on_stop = o_action if cfg.allow_stop else a_vln
            a_q = jnp.where(oracle_stop, on_stop, o_action)
        else:
            a_q = jnp.where(oracle_stop, o_action, a_vln)
        actions = jnp.where(queried, a_q, a_goal)
        o_mask = jnp.where(queried & oracle_stop, 0, 1).astype(jnp.float32)

        if cfg.with_distance_constraint:
            if cfg.distance_distribution_type == "gaussian":
                dist_sample = cfg.dist_mean + cfg.dist_sd * jax.random.normal(k5, (b,))
            else:
                dist_sample = jax.random.beta(k5, cfg.dist_alpha, cfg.dist_beta, (b,))
        else:
            dist_sample = jnp.zeros((b,), jnp.float32)

        env_state2, out = fns.env_step(
            env_state, actions,
            QueryInfo(is_queried=queried, query_num=query_count, cons_reward=cons,
                      dist_sample=dist_sample),
        )

        # ---- dialog window bookkeeping (ppo_trainer.py:760-772)
        dialog_step2 = jnp.where(queried, t.dialog_step + 1, t.dialog_step)
        window_over = queried & (dialog_step2 >= cfg.num_dialog_steps)
        queried_next = queried & ~window_over
        dialog_step3 = jnp.where(window_over, 0, dialog_step2)
        dialog_next = jnp.where(window_over[:, None], 0, current_dialog)
        clip_next = (
            jnp.where(window_over[:, None], 0, current_clip)
            if current_clip is not None else t.current_clip
        )
        masks_vln_next = jnp.where(window_over | out.done, 0.0, 1.0)

        track_next = QueryTrack(
            queried=queried_next,
            dialog_step=dialog_step3,
            total_step=jnp.where(out.done, 0, t.total_step + 1),
            last_query_step=last_query_step,
            query_count=query_count,
            current_dialog=dialog_next,
            current_clip=clip_next,
        )

        new_c = InteractiveCarry(
            env_state=env_state2,
            obs=out.obs,
            prev_action=actions,
            masks=1.0 - out.done.astype(jnp.float32),
            masks_vln=masks_vln_next,
            mem_goal=insert(mem_goal, x_goal),
            mem_option=insert(mem_option, x_mem_opt),
            mem_vln=insert(mem_vln, x_vln),
            mem_vln_dialog=insert(mem_vln_dialog, x_att_dialog),
            belief=belief_state,
            track=track_next,
            key=key,
        )

        store = dict(
            obs={**obs, "__prev_action": prev_action},
            actions=actions,
            actions_option=a_opt,
            log_probs_option=lp_opt,
            values_option=v_opt,
            feat_goal=x_goal,
            feat_option=x_mem_opt,
            feat_vln=x_vln,
            feat_vln_dialog=jax.lax.stop_gradient(x_att_dialog),
            dialog=current_dialog,
            dialog_clip=(current_clip if current_clip is not None
                         else jnp.zeros((b, 0), jnp.float32)),
            agent_step=agent_step,
            query_state=query_state,
            last_query_info=last_query_info,
            rl_mask=rl_mask,
            o_action=o_action,
            o_mask=o_mask,
            ucnt_gt=ucnt_gt,
            queried=queried,
            logits_vln=logits_vln,
            rewards=out.reward,
            masks=c.masks,
            masks_vln=jnp.where(vln_reset, 0.0, c.masks_vln),
            dones=out.done,
            query_count=query_count,
            metrics={**out.metrics, **instr_metrics},
        )
        return new_c, store

    carry2, traj = jax.lax.scan(step_fn, carry, None, length=num_steps)
    traj["initial_memories"] = init_memories

    # bootstrap value for π_q (post-rollout)
    t = carry2.track
    new_ep = carry2.masks == 0
    obs_b = dict(carry2.obs)
    if fns.belief_fn is not None:
        _, cat_b, loc_b = fns.belief_fn(carry2.belief, obs_b, new_ep)
        obs_b["category_belief"] = cat_b
        obs_b["location_belief"] = loc_b
    mem_o = reset_where(carry2.mem_option, new_ep)
    pa = jnp.where(new_ep, 0, carry2.prev_action)
    diff_lqi = jnp.where(t.query_count >= 2, t.total_step - t.last_query_step, cfg.pe_max - 1)
    qs = pe_table[jnp.clip(t.query_count, 0, cfg.pe_max - 1)]
    lqi = pe_table[jnp.clip(diff_lqi, 0, cfg.pe_max - 1)]
    traj["bootstrap_value"] = fns.value_option(obs_b, pa, mem_o.features, mem_o.valid, qs, lqi)
    return carry2, traj


def collect_rollout_dialog_pretrain(
    act_dialog: Callable,
    env_step_noquery: Callable,
    oracle_action: Callable,
    belief_fn: Optional[Callable],
    carry: InteractiveCarry,
    instr_bank,
    num_dialog_steps: int,
    num_steps: int,
    sub_instr_bank: Optional[jnp.ndarray] = None,
    clip_embed: Optional[Callable] = None,
):
    """π_l pretraining rollout (DIALOG_TRAINING flow, ddppo_trainer.py:
    181-298, 881-891 + ppo_trainer.py:354-369): oracle actions drive the
    agent; the instruction for each NUM_DIALOG_STEPS window comes from the
    dataset's per-episode ``sub_instr`` tokens when the episode carries one
    (``sub_instr_bank`` (E, 77), gathered by episode index — the reference
    tokenizes episode sub_instr at ppo_trainer.py:354-369), falling back to
    the oracle (node, rot, goal) instruction bank otherwise; π_l's logits
    are later trained by CE against the oracle actions. masks_vln closes
    each window so the dialog state memory resets. ``instr_bank`` may also
    be a host-callback source (see collect_rollout_interactive).
    """

    def step_fn(c: InteractiveCarry, _):
        key, k1 = jax.random.split(c.key)
        new_ep = c.masks == 0
        t = c.track
        window_start = new_ep | (t.dialog_step == 0)
        vln_reset = new_ep | (c.masks_vln == 0)
        mem_vln = reset_where(c.mem_vln, vln_reset)
        mem_vln_dialog = reset_where(c.mem_vln_dialog, vln_reset)
        prev_action = jnp.where(new_ep, 0, c.prev_action)

        obs = dict(c.obs)
        belief_state = c.belief
        if belief_fn is not None:
            belief_state, cat_b, loc_b = belief_fn(belief_state, obs, new_ep)
            obs["category_belief"] = cat_b
            obs["location_belief"] = loc_b

        env_state = c.env_state
        if callable(instr_bank):
            tokens = instr_bank(env_state, window_start)
        else:
            tokens = instr_bank[env_state.scene, env_state.node, env_state.rot, env_state.goal_node]
        oracle_needed = window_start
        if sub_instr_bank is not None:
            # dataset instruction for this episode (all-zero row = absent)
            ds_tokens = sub_instr_bank[env_state.ep_i]
            has_ds = jnp.any(ds_tokens != 0, axis=-1)
            tokens = jnp.where(has_ds[:, None], ds_tokens, tokens)
            oracle_needed = window_start & ~has_ds
        instr_metrics = {}
        if getattr(instr_bank, "record_requests", False):
            # verify/replay recording for the chunked host-prefetch source:
            # only window-start steps actually consuming the ORACLE tokens
            # (dataset sub_instr rows need no speaker) count as requests
            ka, kb = instr_bank.keys_of(env_state)
            instr_metrics = {
                "pair_instr_a": jnp.where(oracle_needed, ka, -1),
                "pair_instr_src": jnp.where(oracle_needed, kb, -1),
            }
        current_dialog = jnp.where(window_start[:, None], tokens, t.current_dialog)
        agent_step = jnp.where(new_ep, 0, t.dialog_step)

        # window_start fires every few steps somewhere in the batch, so the
        # tower runs unconditionally here (net-neutral for the rollout); the
        # stored embedding spares the CE update from re-running it.
        current_clip = (
            clip_embed(current_dialog).astype(jnp.float32)
            if clip_embed is not None else None
        )
        _dialog_extra = () if current_clip is None else (current_clip,)
        a_vln, lp, v, x_vln, x_att_dialog, logits = act_dialog(
            obs, prev_action, mem_vln.features, mem_vln.valid,
            mem_vln_dialog.features, mem_vln_dialog.valid, current_dialog,
            agent_step, k1, *_dialog_extra,
        )
        o_action = oracle_action(env_state)
        env_state2, out = env_step_noquery(env_state, o_action)

        step2 = agent_step + 1
        window_over = step2 >= num_dialog_steps
        masks_vln_next = jnp.where(window_over | out.done, 0.0, 1.0)

        track_next = t._replace(
            dialog_step=jnp.where(window_over | out.done, 0, step2),
            total_step=jnp.where(out.done, 0, t.total_step + 1),
            current_dialog=jnp.where((window_over | out.done)[:, None], 0, current_dialog),
        )
        new_c = c._replace(
            env_state=env_state2,
            obs=out.obs,
            prev_action=o_action,
            masks=1.0 - out.done.astype(jnp.float32),
            masks_vln=masks_vln_next,
            mem_vln=insert(mem_vln, x_vln),
            mem_vln_dialog=insert(mem_vln_dialog, x_att_dialog),
            belief=belief_state,
            track=track_next,
            key=key,
        )
        store = dict(
            obs={**obs, "__prev_action": prev_action},
            feat_vln=x_vln,
            feat_vln_dialog=jax.lax.stop_gradient(x_att_dialog),
            dialog=current_dialog,
            dialog_clip=(current_clip if current_clip is not None
                         else jnp.zeros((current_dialog.shape[0], 0), jnp.float32)),
            agent_step=agent_step,
            o_action=o_action,
            o_mask=jnp.ones_like(o_action, jnp.float32),
            queried=jnp.ones_like(out.done),
            masks_vln=jnp.where(vln_reset, 0.0, c.masks_vln),
            logits_vln=logits,
            dones=out.done,
            metrics={**out.metrics, **instr_metrics},
        )
        return new_c, store

    init_memories = (carry.mem_goal, carry.mem_option, carry.mem_vln, carry.mem_vln_dialog)
    carry2, traj = jax.lax.scan(step_fn, carry, None, length=num_steps)
    traj["initial_memories"] = init_memories
    return carry2, traj

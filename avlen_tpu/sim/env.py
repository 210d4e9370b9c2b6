"""Batched device-resident audio navigation environment.

The TPU replacement for the reference's process tree — habitat `Env`/`RLEnv`
(habitat-lab-dialog/habitat/core/env.py:26-425), `VectorEnv` forkserver
workers (vector_env.py:136-712) and `SoundSpacesSim` (soundspaces/
simulator.py:96-834). All ``B`` env slots advance in ONE jitted program:
graph moves are table gathers, audio is the fused conv+STFT kernel, rewards
and measures are vector math. There are no processes, no pipes, no pickles,
and a whole rollout can run inside `lax.scan`.

Semantics preserved (with reference citations inline):

* action set STOP/MOVE_FORWARD/TURN_LEFT/TURN_RIGHT with collision-on-blocked
  forward (simulator.py:476-592)
* reward shaping incl. AVLEN query penalties
  (ss_baselines/common/environments.py:98-135)
* auto-reset to the next episode on done, as habitat's vector-env workers do
* measures: DistanceToGoal (VIEW_POINTS), Success, SPL, SoftSPL, NA, SNA,
  SWS, NormalizedDistanceToGoal (habitat/tasks/nav/nav.py:499-682,
  soundspaces/tasks/nav.py:109-233, semantic_audionav_task.py:239-260)
* sensors: spectrogram, audiogoal, rgb, depth, category (21-way one-hot),
  pose (episodic frame, soundspaces/tasks/nav.py:701-775), collision,
  oracle action (greedy shortest-path step, simulator.py:758-787),
  zero-filled category/location beliefs (filled by the belief predictor)
"""

from __future__ import annotations

import dataclasses
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from avlen_tpu.ops.audio import SpectrogramConfig, render_audiogoal
from avlen_tpu.sim.graph import UNREACHABLE
from avlen_tpu.sim.scene import SceneBank

STOP, MOVE_FORWARD, TURN_LEFT, TURN_RIGHT = 0, 1, 2, 3


class EnvState(NamedTuple):
    node: jax.Array  # (B,) i32
    rot: jax.Array  # (B,) i32 rotation_angle // 90
    scene: jax.Array  # (B,) i32
    step_count: jax.Array  # (B,) i32
    cursor: jax.Array  # (B,) i32 position in per-env episode order
    ep_i: jax.Array  # (B,) i32 packed episode index
    goal_node: jax.Array
    sound: jax.Array
    offset: jax.Array  # (B,) i32 — sound start offset in seconds
    duration: jax.Array
    category: jax.Array
    view_points: jax.Array  # (B, V) i32
    distractor_node: jax.Array
    distractor_sound: jax.Array
    start_node: jax.Array
    start_rot: jax.Array
    prev_dtg: jax.Array  # (B,) f32 geodesic to goal (reward bookkeeping)
    start_dtg: jax.Array  # (B,) f32 DistanceToGoal at episode start (measures)
    ep_geodesic: jax.Array  # (B,) f32 episode.info geodesic
    ep_num_action: jax.Array  # (B,) i32 episode.info num_action
    path_len: jax.Array  # (B,) f32 euclidean distance covered
    num_action: jax.Array  # (B,) i32
    collided: jax.Array  # (B,) bool
    new_episode: jax.Array  # (B,) bool — True on the first obs of an episode
    ep_order: jax.Array  # (B, E_per) i32 — this slot's episode stream (kept in
    # state so the env shards cleanly over device meshes)


class QueryInfo(NamedTuple):
    """Per-step AVLEN query inputs (trainer-provided; see ppo_trainer.py:594-712)."""

    is_queried: jax.Array  # (B,) bool
    query_num: jax.Array  # (B,) i32 — count including this query
    cons_reward: jax.Array  # (B,) f32 — CONSECUTIVE_REWARD / max(diff_step, 1)
    # pre-sampled gaussian/beta draw for the distance-sampled query reward
    # (environments.py:126-133); sampled by the rollout (which owns the PRNG)
    dist_sample: Optional[jax.Array] = None  # (B,) f32


class StepOutput(NamedTuple):
    obs: Dict[str, jax.Array]
    reward: jax.Array
    done: jax.Array
    metrics: Dict[str, jax.Array]  # measures of the episode the step belonged to


@dataclasses.dataclass(frozen=True)
class RewardConfig:
    """RL.* reward keys (savi/config/default.py:78-101)."""

    success_reward: float = 10.0
    slack_reward: float = -0.01
    with_time_penalty: bool = True
    with_distance_reward: bool = True
    distance_reward_scale: float = 1.0
    with_query_constraint: bool = False
    num_total_query: int = 5
    query_reward: float = -1.0
    soft_query_reward: bool = False
    consecutive_constraint_reward: bool = False
    # distance-sampled query reward (environments.py:126-133): when queried,
    # draw s ~ gaussian/beta (rollout-side) and add QUERY_REWARD_DISTANCE if
    # geodesic_to_source * s <= 3
    with_distance_constraint: bool = False
    query_reward_distance: float = -1.0


@dataclasses.dataclass(frozen=True)
class EnvConfig:
    max_episode_steps: int = 500
    success_distance: float = 0.2
    grid_size: float = 1.0
    sensors: Tuple[str, ...] = (
        "spectrogram",
        "depth",
        "category",
        "pose",
        "collision",
        "oracle_action",
        "category_belief",
        "location_belief",
    )
    num_categories: int = 21
    reward: RewardConfig = RewardConfig()
    has_distractor: bool = False
    record_pose_info: bool = False  # include agent trace in step metrics
    # EgoMap sensor geometry (nav.py:236-406 MAP_SIZE/MAP_RESOLUTION)
    egomap_size: int = 31
    egomap_resolution: float = 0.5
    # fused Pallas spectrogram kernel (ops/pallas_spectrogram.py): None =
    # auto (on when the default backend is TPU), True/False = forced
    pallas_spectrogram: Optional[bool] = None
    # record each step's rendered audio pair in the metrics (packed
    # (scene, azimuth, receiver) key + source node) — the verify half of the
    # chunked host-prefetch audio path (data/host_prefetch.py): the host
    # checks every requested pair against its cache mirror after each chunk
    record_audio_pairs: bool = False


class BatchedAudioNavEnv:
    """Vectorized env over a SceneBank + packed episodes.

    All methods returning device values are pure jitted functions of
    (state, inputs); the object only holds immutable assets and config.
    """

    def __init__(self, bank: SceneBank, packed: Dict[str, np.ndarray], config: EnvConfig):
        self.bank = bank
        self.config = config
        self.eps = {k: jnp.asarray(v) for k, v in packed.items()}
        self.num_envs = int(packed["order"].shape[0])
        use_pallas = config.pallas_spectrogram
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        self.spec_config = SpectrogramConfig(
            sampling_rate=bank.sampling_rate, use_pallas=bool(use_pallas)
        )
        # procedural RIR providers serve analytic spectra (no per-step rFFT)
        if hasattr(bank.rir, "ensure_tables"):
            bank.rir.ensure_tables()
        if "semantic_object" in config.sensors and bank.semantic is not None:
            from avlen_tpu.sim.mp3d_utils import mp3d_id_to_task_id

            self._mp3d_to_task_table = jnp.asarray(mp3d_id_to_task_id())
        # the scene bank + episode tables cross every jit boundary as runtime
        # arguments (utils/hoist.py) — outer jits bind self.binder so nothing
        # here lowers as an HLO literal (the axon remote-compile payload cap
        # and compile latency both scale with embedded constants)
        from avlen_tpu.utils.hoist import ConstBinder

        self.binder = ConstBinder()
        self.binder.add("bank", self.bank)
        self.binder.add("eps", self.eps)
        self._step = jax.jit(self._step_bound)
        self._observe_jit = jax.jit(self._observe_bound)

    @property
    def consts(self):
        """Pytree to pass as the ``consts`` argument of hoisted jits."""
        return self.binder.arrays

    @property
    def _wbank(self) -> SceneBank:
        return self.binder.get("bank")

    @property
    def _weps(self) -> Dict[str, jax.Array]:
        return self.binder.get("eps")

    def _step_bound(self, consts, state, actions, query):
        with self.binder.bind(consts):
            return self._step_impl(state, actions, query)

    def _observe_bound(self, consts, state):
        with self.binder.bind(consts):
            return self._observe(state)

    # ------------------------------------------------------------------
    def _episode_fields(self, ep_i: jax.Array) -> Dict[str, jax.Array]:
        e = self._weps
        return {
            "scene": e["scene"][ep_i],
            "start_node": e["start_node"][ep_i],
            "start_rot": e["start_rot"][ep_i],
            "goal_node": e["goal_node"][ep_i],
            "sound": e["sound"][ep_i],
            "offset": e["offset"][ep_i],
            "duration": e["duration"][ep_i],
            "category": e["category"][ep_i],
            "view_points": e["view_points"][ep_i],
            "distractor_node": e["distractor_node"][ep_i],
            "distractor_sound": e["distractor_sound"][ep_i],
            "geodesic": e["geodesic"][ep_i],
            "num_action": e["num_action"][ep_i],
        }

    def _hops(self, scene: jax.Array, a: jax.Array, b: jax.Array) -> jax.Array:
        return self._wbank.tables["hops"][scene, a, b]

    def _dtg_goal(self, scene, node, goal) -> jax.Array:
        """Geodesic to the sound source (reward path, environments.py:160-166)."""
        h = self._hops(scene, node, goal)
        return h.astype(jnp.float32) * self.config.grid_size

    def _dtg_view_points(self, scene, node, view_points) -> jax.Array:
        """DistanceToGoal with DISTANCE_TO=VIEW_POINTS (nav.py:959-1016)."""
        valid = view_points >= 0
        vp = jnp.where(valid, view_points, 0)
        h = self._wbank.tables["hops"][scene[:, None], node[:, None], vp]
        h = jnp.where(valid, h, UNREACHABLE)
        return jnp.min(h, axis=1).astype(jnp.float32) * self.config.grid_size

    # ------------------------------------------------------------------
    def reset(self, order: Optional[jax.Array] = None, consts=None) -> Tuple[EnvState, Dict[str, jax.Array]]:
        """``order`` overrides the per-slot episode streams — (B, P) int32 —
        e.g. an exactly-once eval deal (the fixed-shape analogue of the
        reference's per-process eval splits, base_trainer.py:185-289).
        ``consts`` overrides the bound asset/episode tables (e.g.
        `eval_consts` sound remapping) so the FIRST episode of each slot
        also reflects the override, not just auto-reset pulls."""
        import contextlib

        ctx = self.binder.bind(consts) if consts is not None else contextlib.nullcontext()
        with ctx:
            return self._reset_impl(order, consts)

    def _reset_impl(self, order, consts):
        b = self.num_envs
        cursor = jnp.zeros((b,), jnp.int32)
        order = self._weps["order"] if order is None else jnp.asarray(order)
        # the carry's episode stream must be its own buffer: donated
        # supersteps would otherwise delete the shared eps["order"] table
        order = jnp.copy(order)
        ep_i = order[jnp.arange(b), cursor]
        f = self._episode_fields(ep_i)
        zero = jnp.zeros((b,), jnp.int32)
        state = EnvState(
            node=f["start_node"],
            rot=f["start_rot"],
            scene=f["scene"],
            step_count=zero,
            cursor=cursor,
            ep_i=ep_i,
            goal_node=f["goal_node"],
            sound=f["sound"],
            offset=f["offset"],
            duration=f["duration"],
            category=f["category"],
            view_points=f["view_points"],
            distractor_node=f["distractor_node"],
            distractor_sound=f["distractor_sound"],
            start_node=f["start_node"],
            start_rot=f["start_rot"],
            prev_dtg=self._dtg_goal(f["scene"], f["start_node"], f["goal_node"]),
            start_dtg=self._dtg_view_points(f["scene"], f["start_node"], f["view_points"]),
            ep_geodesic=f["geodesic"],
            ep_num_action=f["num_action"],
            path_len=jnp.zeros((b,), jnp.float32),
            num_action=zero,
            collided=jnp.zeros((b,), bool),
            new_episode=jnp.ones((b,), bool),
            ep_order=order,
        )
        return state, self._observe_jit(consts if consts is not None else self.binder.arrays, state)

    # ------------------------------------------------------------------
    def eval_consts(self, sound_type: str = ""):
        """``consts`` with every episode's sound remapped onto the eval
        sound set: ``heard`` → the train sounds, ``unheard`` → the held-out
        sounds (the reference's eval-time SOUND_ID switch,
        soundspaces/tasks/semantic_audionav_task.py:222-224, and the paper's
        heard/unheard protocol). No-op when no DATASET.HELD_OUT_SOUNDS split
        is configured. Because the episode tables cross jits as arguments,
        eval can bind remapped tables with zero recompilation."""
        split = getattr(self, "sound_split", None)
        if not split or sound_type not in ("heard", "unheard"):
            return self.consts
        train_ids, held_ids = split
        target = jnp.asarray(train_ids if sound_type == "heard" else held_ids, jnp.int32)
        consts = dict(self.consts)
        eps = dict(consts["eps"])

        # deterministic per-episode draw over the target sound set, keyed by
        # the episode's packed index (not the train sound id): a modulo remap
        # of the train sound would collapse several train sounds onto one
        # eval sound and skew the eval distribution; the reference instead
        # names sounds per category at episode load
        # (semantic_audionav_task.py:222-224), which this draw approximates
        # uniformly while preserving the never-trained-on guarantee
        def draw(salt: int):
            e = jnp.arange(eps["sound"].shape[0], dtype=jnp.uint32)
            h = (e + jnp.uint32(salt)) * jnp.uint32(2654435761)
            h = h ^ (h >> 16)
            return target[(h % jnp.uint32(target.shape[0])).astype(jnp.int32)]

        eps["sound"] = draw(0)
        dist = eps["distractor_sound"]
        eps["distractor_sound"] = jnp.where(dist >= 0, draw(0x9E37), dist)
        consts["eps"] = eps
        return consts

    # ------------------------------------------------------------------
    def refresh_ep_order(self, state: EnvState, order) -> EnvState:
        """Swap in a refreshed per-slot episode stream (EpisodeStreamer):
        host work between supersteps — ``ep_order`` is only read at episode
        boundaries, so the in-flight episode is untouched. Preserves the
        leaf's device sharding so sharded carries stay valid."""
        new = jnp.asarray(order, jnp.int32)
        old = state.ep_order
        if hasattr(old, "sharding"):
            new = jax.device_put(new, old.sharding)
        return state._replace(ep_order=new)

    # ------------------------------------------------------------------
    def step(self, state: EnvState, actions: jax.Array, query: Optional[QueryInfo] = None):
        if query is None:
            b = self.num_envs
            query = QueryInfo(
                is_queried=jnp.zeros((b,), bool),
                query_num=jnp.zeros((b,), jnp.int32),
                cons_reward=jnp.zeros((b,), jnp.float32),
            )
        return self._step(self.binder.arrays, state, actions, query)

    def _step_impl_noquery(self, state: EnvState, actions: jax.Array):
        """Pure step with no query shaping inputs — traceable inside scans."""
        b = state.node.shape[0]
        query = QueryInfo(
            is_queried=jnp.zeros((b,), bool),
            query_num=jnp.zeros((b,), jnp.int32),
            cons_reward=jnp.zeros((b,), jnp.float32),
        )
        return self._step_impl(state, actions, query)

    def _step_impl(self, state: EnvState, actions: jax.Array, query: QueryInfo):
        cfg = self.config
        tables = self._wbank.tables

        stop = actions == STOP
        fwd = actions == MOVE_FORWARD
        left = actions == TURN_LEFT
        right = actions == TURN_RIGHT

        new_rot = (state.rot + left.astype(jnp.int32) - right.astype(jnp.int32)) % 4
        orient = (3 - state.rot) % 4  # orientation = (270 - rot)%360 (simulator.py:595-597)
        fwd_target = tables["fwd_next"][state.scene, state.node, orient]
        blocked = fwd & (fwd_target < 0)
        new_node = jnp.where(fwd & ~blocked, jnp.where(fwd_target < 0, state.node, fwd_target), state.node)
        collided = blocked  # previous_step_collided (simulator.py:502-512)

        step_count = state.step_count + 1
        episode_over = step_count >= cfg.max_episode_steps
        done = stop | episode_over

        reaching_goal = new_node == state.goal_node
        dtg_goal = self._dtg_goal(state.scene, new_node, state.goal_node)
        dtg_measure = self._dtg_view_points(state.scene, new_node, state.view_points)

        # ---- reward (environments.py:98-135); uses pre-reset bookkeeping
        r = jnp.zeros_like(dtg_goal)
        rw = cfg.reward
        if rw.with_time_penalty:
            r = r + rw.slack_reward
        if rw.with_distance_reward:
            r = r + (state.prev_dtg - dtg_goal) * rw.distance_reward_scale
        success_for_reward = stop & reaching_goal
        r = r + jnp.where(success_for_reward, rw.success_reward, 0.0)
        if rw.with_query_constraint:
            q = query.query_num.astype(jnp.float32)
            soft = (q / rw.num_total_query) * (np.exp(-rw.num_total_query) + rw.query_reward)
            hard = jnp.exp(-q) + rw.query_reward
            within = query.query_num <= rw.num_total_query
            qr = jnp.where(within, soft if rw.soft_query_reward else 0.0, hard)
            if rw.consecutive_constraint_reward:
                qr = qr + query.cons_reward
            r = r + jnp.where(query.is_queried, qr, 0.0)
        if rw.with_distance_constraint and query.dist_sample is not None:
            # distance-sampled query reward (environments.py:126-133): the
            # post-step geodesic to the source scaled by the sampled draw
            hit = dtg_goal * query.dist_sample <= 3.0
            r = r + jnp.where(query.is_queried & hit, rw.query_reward_distance, 0.0)

        # ---- measures of the (possibly ending) episode
        pos_old = tables["positions"][state.scene, state.node]
        pos_new = tables["positions"][state.scene, new_node]
        path_len = state.path_len + jnp.sqrt(jnp.sum((pos_new - pos_old) ** 2, axis=-1) + 1e-12)
        num_action = state.num_action + 1

        success = (stop & (dtg_measure < cfg.success_distance)).astype(jnp.float32)
        denom = jnp.maximum(state.start_dtg, path_len)
        spl = jnp.where(denom > 0, success * state.start_dtg / jnp.maximum(denom, 1e-6), 0.0)
        soft_success = jnp.maximum(0.0, 1.0 - dtg_measure / jnp.maximum(state.start_dtg, 1e-6))
        soft_success = jnp.where(state.start_dtg > 0, soft_success, 0.0)
        softspl = jnp.where(denom > 0, soft_success * state.start_dtg / jnp.maximum(denom, 1e-6), 0.0)
        na = num_action.astype(jnp.float32)
        sna = success * state.ep_num_action.astype(jnp.float32) / jnp.maximum(
            jnp.maximum(state.ep_num_action, num_action).astype(jnp.float32), 1.0
        )
        sws = success * (step_count > state.duration).astype(jnp.float32)
        ndtg = dtg_measure / jnp.maximum(state.ep_geodesic, 1e-6)
        metrics = {
            "distance_to_goal": dtg_measure,
            "normalized_distance_to_goal": ndtg,
            "success": success,
            "spl": spl,
            "softspl": softspl,
            "na": na,
            "sna": sna,
            "sws": sws,
            # packed episode index of the episode this step belonged to —
            # lets eval count each episode exactly once (the reference keys
            # stats_episodes by (scene_id, episode_id), ppo_trainer.py:1824)
            "episode": state.ep_i.astype(jnp.float32),
        }
        if cfg.record_pose_info:
            # agent trace for video/top-down-map generation (the reference
            # carries TopDownMap through info, habitat/tasks/nav/nav.py:705)
            metrics["agent_node"] = new_node.astype(jnp.float32)
            metrics["agent_rot"] = new_rot.astype(jnp.float32)
            metrics["agent_scene"] = state.scene.astype(jnp.float32)
            metrics["goal_node"] = state.goal_node.astype(jnp.float32)

        # ---- auto-reset: pull each done env's next episode from its stream
        cursor = jnp.where(done, state.cursor + 1, state.cursor)
        per = state.ep_order.shape[1]
        ep_i = jnp.take_along_axis(state.ep_order, (cursor % per)[:, None], axis=1)[:, 0]
        f = self._episode_fields(ep_i)

        def sel(new_ep_val, cont_val):
            return jnp.where(done.reshape((-1,) + (1,) * (cont_val.ndim - 1)), new_ep_val, cont_val)

        next_state = EnvState(
            node=sel(f["start_node"], new_node),
            rot=sel(f["start_rot"], new_rot),
            scene=sel(f["scene"], state.scene),
            step_count=sel(jnp.zeros_like(step_count), step_count),
            cursor=cursor,
            ep_i=sel(ep_i, state.ep_i),
            goal_node=sel(f["goal_node"], state.goal_node),
            sound=sel(f["sound"], state.sound),
            offset=sel(f["offset"], state.offset),
            duration=sel(f["duration"], state.duration),
            category=sel(f["category"], state.category),
            view_points=sel(f["view_points"], state.view_points),
            distractor_node=sel(f["distractor_node"], state.distractor_node),
            distractor_sound=sel(f["distractor_sound"], state.distractor_sound),
            start_node=sel(f["start_node"], state.start_node),
            start_rot=sel(f["start_rot"], state.start_rot),
            prev_dtg=sel(self._dtg_goal(f["scene"], f["start_node"], f["goal_node"]), dtg_goal),
            start_dtg=sel(self._dtg_view_points(f["scene"], f["start_node"], f["view_points"]), state.start_dtg),
            ep_geodesic=sel(f["geodesic"], state.ep_geodesic),
            ep_num_action=sel(f["num_action"], state.ep_num_action),
            path_len=sel(jnp.zeros_like(path_len), path_len),
            num_action=sel(jnp.zeros_like(num_action), num_action),
            collided=jnp.where(done, False, collided),
            new_episode=done,
            ep_order=state.ep_order,
        )
        if cfg.record_audio_pairs:
            # the audio pair _observe(next_state) is about to render — the
            # verify input of the chunked host-prefetch path
            # (data/host_prefetch.HostRIRPrefetcher.requested_keys)
            from avlen_tpu.data.host_prefetch import pack_pair_key_a

            az_next = (4 - next_state.rot) % 4
            metrics["pair_key_a"] = pack_pair_key_a(
                next_state.scene, az_next, next_state.node, self._wbank.max_nodes
            ).astype(jnp.int32)
            metrics["pair_src"] = next_state.goal_node.astype(jnp.int32)
            if cfg.has_distractor:
                metrics["pair_dsrc"] = next_state.distractor_node.astype(jnp.int32)

        obs = self._observe(next_state)
        return next_state, StepOutput(obs=obs, reward=r, done=done, metrics=metrics)

    # ------------------------------------------------------------------
    def _observe(self, state: EnvState) -> Dict[str, jax.Array]:
        cfg = self.config
        bank = self._wbank
        obs: Dict[str, jax.Array] = {}
        sensors = set(cfg.sensors)

        use_bank = (
            bank.spec_bank is not None
            and not cfg.has_distractor
            and "audiogoal" not in sensors
        )
        if "spectrogram" in sensors and use_bank:
            # precomputed spectrogram bank: the reference's per-(src, recv,
            # azimuth) cache steady state (simulator.py:723-734) as ONE gather
            az = (4 - state.rot) % 4
            spec = bank.spec_bank[state.scene, state.sound, az, state.node, state.goal_node]
            active = (state.step_count <= state.duration).astype(jnp.float32)
            obs["spectrogram"] = spec.astype(jnp.float32) * active[:, None, None, None]
        elif "spectrogram" in sensors or "audiogoal" in sensors:
            az = (4 - state.rot) % 4  # azimuth = -rotation (simulator.py:600-604)
            # analytic frequency-domain RIRs (ProceduralRIRBank.gather_fft)
            # skip the per-step length-2^n rFFT; exactly rfft(gather(...))
            use_fft = getattr(bank.rir, "tail_fft", None) is not None
            rir = rir_f = None
            if use_fft:
                rir_f = bank.rir.gather_fft(state.scene, az, state.node, state.goal_node)
            else:
                rir = bank.rir.gather(state.scene, az, state.node, state.goal_node)
            sound_padded = bank.sounds_padded[state.sound]
            secs = bank.sound_secs[state.sound]
            # the sound starts at the episode's offset (episode.offset seconds
            # into the source clip; SAVi's multi-second-sound semantics —
            # the reference parses AGENT_0.OFFSET at reconfigure,
            # simulator.py:350-354)
            audio_index = (state.offset + state.step_count) % jnp.maximum(secs, 1)
            active = state.step_count <= state.duration  # silence past duration (simulator.py:646-649)
            dargs = {}
            if bank.sound_fft_bank is not None:
                # precomputed per-(sound, second) segment rFFTs: one gather
                # replaces the per-step segment slice + rFFT (scene.py)
                s_max = bank.sound_fft_bank.shape[1]
                dargs["seg_f"] = bank.sound_fft_bank[
                    state.sound, jnp.clip(audio_index, 0, s_max - 1)
                ]
            if cfg.has_distractor:
                dnode = jnp.maximum(state.distractor_node, 0)
                has = (state.distractor_node >= 0)[:, None, None]
                dsound = jnp.maximum(state.distractor_sound, 0)
                if use_fft:
                    drir_f = bank.rir.gather_fft(state.scene, az, state.node, dnode)
                    dargs["distractor_rir_f"] = drir_f * has.astype(drir_f.dtype)
                else:
                    drir = bank.rir.gather(state.scene, az, state.node, dnode)
                    dargs["distractor_rir"] = drir * has.astype(drir.dtype)
                dargs.update(
                    distractor_sound_padded=bank.sounds_padded[dsound],
                    has_distractor=True,
                )
                if bank.sound_fft_bank is not None:
                    dargs["distractor_seg_f"] = bank.sound_fft_bank[dsound, 0]
            audio, spec = render_audiogoal(
                sound_padded, audio_index, rir, active, bank.sampling_rate,
                config=self.spec_config, rir_f=rir_f,
                rir_len=(bank.rir.length if use_fft else None), **dargs,
            )
            if "audiogoal" in sensors:
                obs["audiogoal"] = audio
            if "spectrogram" in sensors:
                obs["spectrogram"] = spec

        if "rgb" in sensors and bank.rgb is not None:
            obs["rgb"] = bank.rgb[state.scene, state.node, state.rot]
        if "depth" in sensors and bank.depth is not None:
            obs["depth"] = bank.depth[state.scene, state.node, state.rot]

        if "semantic_object" in sensors and bank.semantic is not None:
            # SemanticObjectSensor (nav.py:570-698): pixel instance ids →
            # mpcat40 (per-scene .house-derived table) → 21-way task ids
            # (unknown classes collapse to id 21) as two device gathers
            inst = bank.semantic[state.scene, state.node, state.rot]  # (B,H,W)
            inst_map = bank.semantic_instance_to_mp3d[state.scene]  # (B, I)
            inst = jnp.where(inst >= inst_map.shape[1], 0, inst)  # invalid → 0
            bsz, hh, ww = inst.shape
            mp3d = jnp.take_along_axis(inst_map, inst.reshape(bsz, -1), axis=1)
            task = self._mp3d_to_task_table[jnp.clip(mp3d, 0, 199)]
            obs["semantic_object"] = task.reshape(bsz, hh, ww)

        if "egomap" in sensors and bank.depth is not None:
            # EgoMap sensor exposure (nav.py:236-406): depth → egocentric
            # top-down [obstacle, explored] map
            from avlen_tpu.ops.mapping import depth_to_egomap

            obs["egomap"] = depth_to_egomap(
                bank.depth[state.scene, state.node, state.rot],
                map_size=cfg.egomap_size,
                resolution=cfg.egomap_resolution,
            )

        b = state.node.shape[0]
        if "category" in sensors:
            obs["category"] = jax.nn.one_hot(state.category, cfg.num_categories)
        if "mpcat40_index" in sensors:
            # MPCAT40Index sensor (soundspaces/tasks/nav.py:515-569): the
            # episode's object category as its raw mpcat40 index, shape (B, 1)
            from avlen_tpu.sim.mp3d_utils import task_id_to_mp3d_id

            table = jnp.asarray(task_id_to_mp3d_id())  # (21,) tiny literal
            obs["mpcat40_index"] = table[
                jnp.clip(state.category, 0, table.shape[0] - 1)
            ][:, None]
        if "category_belief" in sensors:
            obs["category_belief"] = jnp.zeros((b, cfg.num_categories), jnp.float32)
        if "location_belief" in sensors:
            obs["location_belief"] = jnp.zeros((b, 2), jnp.float32)

        if "pose" in sensors:
            obs["pose"] = self._pose(state)

        if "pointgoal_with_gps_compass" in sensors:
            # goal location in agent base frame: X forward, Y rightward
            # (habitat PointGoalWithGPSCompass with CARTESIAN 2D format,
            # habitat/tasks/nav/nav.py:290-330)
            tables = self._wbank.tables
            d = tables["positions"][state.scene, state.goal_node] - tables["positions"][state.scene, state.node]
            th = state.rot.astype(jnp.float32) * (jnp.pi / 2)
            fwd = -d[:, 0] * jnp.sin(th) - d[:, 2] * jnp.cos(th)
            rgt = d[:, 0] * jnp.cos(th) - d[:, 2] * jnp.sin(th)
            obs["pointgoal_with_gps_compass"] = jnp.stack([fwd, rgt], axis=1)

        if "collision" in sensors:
            obs["collision"] = state.collided.astype(jnp.float32)[:, None]

        if "oracle_action" in sensors:
            obs["oracle_action"] = self.oracle_action(state)[:, None].astype(jnp.float32)

        return obs

    def _pose(self, state: EnvState) -> jax.Array:
        """Episodic (x=-local_dz, y=local_dx, heading, t) (nav.py:746-775)."""
        tables = self._wbank.tables
        pos = tables["positions"][state.scene, state.node]
        origin = tables["positions"][state.scene, state.start_node]
        d = pos - origin
        th_s = state.start_rot.astype(jnp.float32) * (jnp.pi / 2)
        lx = d[:, 0] * jnp.cos(th_s) - d[:, 2] * jnp.sin(th_s)
        lz = d[:, 0] * jnp.sin(th_s) + d[:, 2] * jnp.cos(th_s)
        heading = (state.rot - state.start_rot).astype(jnp.float32) * (jnp.pi / 2)
        heading = jnp.mod(heading + jnp.pi, 2 * jnp.pi) - jnp.pi
        t = state.step_count.astype(jnp.float32)
        return jnp.stack([-lz, lx, heading, t], axis=1)

    def oracle_action(self, state: EnvState) -> jax.Array:
        """Greedy next oracle action from the current state (simulator.py:758-787):
        delta(direction, orientation): 0→FWD, 270→LEFT, 90/180→RIGHT; at goal→STOP."""
        tables = self._wbank.tables
        nxt = tables["oracle_next"][state.scene, state.node, state.goal_node]
        p1 = tables["positions"][state.scene, state.node]
        p2 = tables["positions"][state.scene, jnp.maximum(nxt, 0)]
        ang = jnp.arctan2(p2[:, 2] - p1[:, 2], p2[:, 0] - p1[:, 0])
        dir_idx = jnp.round(ang / (jnp.pi / 2)).astype(jnp.int32) % 4
        orient = (3 - state.rot) % 4
        delta = (dir_idx - orient) % 4
        action = jnp.where(
            delta == 0,
            MOVE_FORWARD,
            jnp.where(delta == 3, TURN_LEFT, TURN_RIGHT),
        )
        at_goal = state.node == state.goal_node
        return jnp.where(at_goal | (nxt < 0), STOP, action).astype(jnp.int32)

    # convenience: agent state for the speaker path (environments.py:141-157)
    def agent_state_host(self, state: EnvState) -> Dict[str, np.ndarray]:
        tables = self._wbank.tables
        return {
            "node": np.asarray(state.node),
            "rot": np.asarray(state.rot),
            "scene": np.asarray(state.scene),
            "position": np.asarray(tables["positions"][state.scene, state.node]),
            "goal_node": np.asarray(state.goal_node),
            "distance_to_goal": np.asarray(self._dtg_goal(state.scene, state.node, state.goal_node)),
        }

"""Hierarchical waypoint navigation env (AV-WAN).

Capability match for MapNavEnv + Planner + Mapper (ss_baselines/av_wan/
mapnav_env.py:22-166, models/planner.py:19-209, models/mapper.py:27-345):
the policy picks a cell in an egocentric action map; the planner navigates
toward that waypoint with up to PREDICTION_INTERVAL low-level steps, updating
the allocentric geometric/acoustic maps from egomap projections and marking
blocked transitions on collision.

TPU-native: the mapper state is a batched (B, G, G, 2) device array; the
inner low-level loop is a `lax.scan` of PREDICTION_INTERVAL fused steps
(plan → act → env step → map update), so one high-level step is one jit.
Planning is the device BFS distance field (ops/mapping.py) instead of a host
networkx Dijkstra.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from avlen_tpu.ops.mapping import (
    depth_to_egomap,
    distance_field,
    egocentric_crop,
    next_action_from_field,
    register_egomap,
)
from avlen_tpu.sim.env import BatchedAudioNavEnv, QueryInfo


class MapperState(NamedTuple):
    geometric: jnp.ndarray  # (B, G, G, 2) obstacle/explored
    acoustic: jnp.ndarray  # (B, Ga, Ga, 1) accumulated intensity
    row: jnp.ndarray  # (B,) agent cell
    col: jnp.ndarray  # (B,)
    orientation: jnp.ndarray  # (B,) quarter turns (0 = map-up)


@dataclasses.dataclass(frozen=True)
class MapNavConfig:
    internal_map_size: int = 100  # cells (stride units)
    action_map_size: int = 9
    gm_size: int = 20  # egocentric geometric map crop fed to the policy
    am_size: int = 20
    ego_map_size: int = 15
    prediction_interval: int = 10
    bfs_iters: int = 64


class BatchedMapNavEnv:
    """Wraps BatchedAudioNavEnv with mapping + waypoint planning."""

    def __init__(self, env: BatchedAudioNavEnv, config: MapNavConfig = MapNavConfig()):
        self.env = env
        self.config = config
        self.num_envs = env.num_envs
        self.binder = env.binder  # asset banks as jit args (utils/hoist.py)
        self._high_step = jax.jit(self._high_step_bound)

    @property
    def consts(self):
        return self.binder.arrays

    @property
    def eps(self):
        return self.env.eps

    @property
    def scene_tables(self):
        return self.env.scene_tables

    @property
    def streamer(self):
        return getattr(self.env, "streamer", None)

    def eval_consts(self, sound_type: str = ""):
        return self.env.eval_consts(sound_type)

    def refresh_ep_order(self, state, order):
        return self.env.refresh_ep_order(state, order)

    def _high_step_bound(self, consts, state, waypoint):
        with self.binder.bind(consts):
            return self._high_step_impl(state, waypoint)

    def reset(self, order=None, consts=None):
        state, obs = self.env.reset(order=order, consts=consts)
        mapper = self.init_mapper()
        obs = self._augment_obs(obs, mapper)
        return (state, mapper), obs

    def init_mapper(self) -> MapperState:
        b, g = self.num_envs, self.config.internal_map_size
        return MapperState(
            geometric=jnp.zeros((b, g, g, 2), jnp.float32),
            acoustic=jnp.zeros((b, g, g, 1), jnp.float32),
            row=jnp.full((b,), g // 2, jnp.int32),
            col=jnp.full((b,), g // 2, jnp.int32),
            orientation=jnp.zeros((b,), jnp.int32),
        )

    def _reset_mapper_where(self, mapper: MapperState, done: jnp.ndarray) -> MapperState:
        g = self.config.internal_map_size
        keep = (~done).astype(jnp.float32)
        return MapperState(
            geometric=mapper.geometric * keep[:, None, None, None],
            acoustic=mapper.acoustic * keep[:, None, None, None],
            row=jnp.where(done, g // 2, mapper.row),
            col=jnp.where(done, g // 2, mapper.col),
            orientation=jnp.where(done, 0, mapper.orientation),
        )

    def _update_mapper(self, mapper: MapperState, obs: Dict, action: jnp.ndarray, collided: jnp.ndarray, spec_intensity: jnp.ndarray) -> MapperState:
        """Advance pose by the executed action and register the new egomap
        (mapper.update, mapper.py:101-160)."""
        fwd = action == 1
        left = action == 2
        right = action == 3
        o = (mapper.orientation + left.astype(jnp.int32) - right.astype(jnp.int32)) % 4
        # direction deltas for orientation quarter-turns: 0=up,1=left,2=down,3=right
        drow = jnp.where(o == 0, -1, jnp.where(o == 2, 1, 0))
        dcol = jnp.where(o == 1, -1, jnp.where(o == 3, 1, 0))
        moved = fwd & ~collided
        row = jnp.clip(mapper.row + jnp.where(moved, drow, 0), 1, self.config.internal_map_size - 2)
        col = jnp.clip(mapper.col + jnp.where(moved, dcol, 0), 1, self.config.internal_map_size - 2)

        ego = depth_to_egomap(obs["depth"], map_size=self.config.ego_map_size) if "depth" in obs else None
        geometric = mapper.geometric
        if ego is not None:
            geometric = register_egomap(geometric, ego, row, col, o)
        # collision marks the blocked cell ahead as an obstacle
        # (planner.update_map_and_graph, planner.py:56-71)
        brow = jnp.clip(mapper.row + drow, 0, self.config.internal_map_size - 1)
        bcol = jnp.clip(mapper.col + dcol, 0, self.config.internal_map_size - 1)
        hit = (fwd & collided).astype(jnp.float32)
        geometric = jax.vmap(lambda m, r, c, h: m.at[r, c, 0].max(h))(geometric, brow, bcol, hit)

        acoustic = jax.vmap(lambda m, r, c, v: m.at[r, c, 0].add(v))(
            mapper.acoustic, row, col, spec_intensity
        )
        return MapperState(geometric=geometric, acoustic=acoustic, row=row, col=col, orientation=o)

    def _augment_obs(self, obs: Dict, mapper: MapperState) -> Dict:
        cfg = self.config
        obs = dict(obs)
        obs["gm"] = egocentric_crop(mapper.geometric, mapper.row, mapper.col, mapper.orientation, cfg.gm_size)
        obs["am"] = egocentric_crop(mapper.acoustic, mapper.row, mapper.col, mapper.orientation, cfg.am_size)
        occupancy = egocentric_crop(
            mapper.geometric[..., :1], mapper.row, mapper.col, mapper.orientation, cfg.action_map_size
        )
        obs["action_map"] = occupancy
        return obs

    def action_mask(self, obs: Dict) -> jnp.ndarray:
        """Valid waypoints: non-obstacle cells of the action map (masking of
        CategoricalNetWithMask, common/utils.py:75-128). Cell 0 (= the agent
        cell after flattening center) means STOP."""
        amap = obs["action_map"][..., 0]
        b = amap.shape[0]
        flat = amap.reshape(b, -1)
        mask = (flat < 0.5).astype(jnp.float32)
        center = (self.config.action_map_size**2) // 2
        mask = mask.at[:, center].set(1.0)  # stopping in place always allowed
        return mask

    # ------------------------------------------------------------------
    def step(self, state: Tuple, waypoint: jnp.ndarray):
        """waypoint: (B,) flattened action-map cell index."""
        return self._high_step(self.binder.arrays, state, waypoint)

    def _high_step_impl(self, state: Tuple, waypoint: jnp.ndarray):
        env_state, mapper = state
        cfg = self.config
        a = cfg.action_map_size
        center = (a * a) // 2
        stop = waypoint == center

        # waypoint cell (egocentric, agent at center facing up) → allocentric
        wrow_e = waypoint // a - a // 2
        wcol_e = waypoint % a - a // 2
        o = mapper.orientation
        # rotate ego offset into map frame (inverse of egocentric_crop rot)
        rr = jnp.where(o == 0, wrow_e, jnp.where(o == 2, -wrow_e, jnp.where(o == 1, -wcol_e, wcol_e)))
        cc = jnp.where(o == 0, wcol_e, jnp.where(o == 2, -wcol_e, jnp.where(o == 1, wrow_e, -wrow_e)))
        goal_row = jnp.clip(mapper.row + rr, 0, cfg.internal_map_size - 1)
        goal_col = jnp.clip(mapper.col + cc, 0, cfg.internal_map_size - 1)

        def inner(carry, _):
            env_state, mapper, arrived, acc_reward, done_any, last = carry
            dist = distance_field(mapper.geometric[..., 0], goal_row, goal_col, cfg.bfs_iters)
            low = next_action_from_field(dist, mapper.row, mapper.col, mapper.orientation)
            at_goal = (mapper.row == goal_row) & (mapper.col == goal_col)
            finished = arrived | at_goal | (low == 0) | done_any
            # envs that reached their waypoint hold position until the other
            # envs finish the inner window; STOP waypoints act exactly once
            do_step = jnp.where(stop, ~arrived, ~finished)
            safe_action = jnp.where(stop, 0, low)

            env_state2, out = self.env._step_impl_noquery(env_state, safe_action)
            # envs not stepping keep their state
            env_state3 = jax.tree.map(
                lambda new, old: jnp.where(
                    do_step.reshape((-1,) + (1,) * (new.ndim - 1)), new, old
                ),
                env_state2,
                env_state,
            )
            reward = jnp.where(do_step, out.reward, 0.0)
            done = jnp.where(do_step, out.done, False)
            spec_intensity = jnp.abs(out.obs["spectrogram"]).mean(axis=(1, 2, 3)) if "spectrogram" in out.obs else jnp.zeros_like(reward)
            mapper2 = self._update_mapper(mapper, out.obs, jnp.where(do_step, safe_action, -1), env_state3.collided, spec_intensity)
            mapper2 = jax.tree.map(
                lambda new, old: jnp.where(
                    do_step.reshape((-1,) + (1,) * (new.ndim - 1)), new, old
                ),
                mapper2,
                mapper,
            )
            mapper2 = self._reset_mapper_where(mapper2, done)

            # held envs produce PHANTOM out.obs/out.metrics (a step computed
            # from the held state but never applied): obs track the last REAL
            # step; metrics additionally freeze at the done step so episode
            # accounting (metrics["episode"] on done) stays correct
            last_obs, last_metrics = last
            sel = lambda mask: (
                lambda new, old: jnp.where(mask.reshape((-1,) + (1,) * (new.ndim - 1)), new, old)
            )
            last_obs = jax.tree.map(sel(do_step), out.obs, last_obs)
            last_metrics = jax.tree.map(sel(do_step & ~done_any), out.metrics, last_metrics)
            return (
                env_state3,
                mapper2,
                arrived | at_goal | stop,
                acc_reward + reward,
                done_any | done,
                (last_obs, last_metrics),
            ), None

        # batch size from the traced operand, NOT self.num_envs: under
        # shard_map this function sees the per-device shard (B/num_devices)
        b = waypoint.shape[0]
        # derive the metric pytree structure from a traced step so the scan
        # carry matches whatever measures/trace keys the env is configured
        # with (record_pose_info adds agent_node/rot/scene/goal_node); the
        # probe step's computation is dead code XLA eliminates
        _, out0 = self.env._step_impl_noquery(env_state, jnp.zeros((b,), jnp.int32))
        init_last = (
            self.env._observe(env_state),
            jax.tree.map(jnp.zeros_like, out0.metrics),
        )
        carry = (
            env_state, mapper, jnp.zeros((b,), bool), jnp.zeros((b,), jnp.float32),
            jnp.zeros((b,), bool), init_last,
        )
        (env_state, mapper, arrived, reward, done, last), _ = jax.lax.scan(
            inner, carry, None, length=cfg.prediction_interval
        )
        obs, metrics = last
        obs = self._augment_obs(obs, mapper)
        return (env_state, mapper), obs, reward, done, metrics
